"""Camera blackout + recovery (the paper's blocked-camera scenario,
production version: accuracy_bench.py `occlusion` config): camera 1's
lens is covered for a stretch while the rig keeps moving. Tracking dies,
the pose carries, the group splits; on uncover the merge bridge must
REALIGN the stale camera onto the anchor map (the full
SL_MergeCameraGroup.cpp:56-1183 realignment role — a guaranteed
non-noop correction, unlike overlap-flap reunifies)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig)
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


@pytest.fixture(scope="module")
def occlusion_run():
    rng = np.random.default_rng(0)
    planes = make_room(rng, size=10.0)
    C, F = 2, 110
    f0, f1 = 25, 43                      # camera 1 covered
    Rr, tr = orbit_trajectory(F, forward=0.06)
    rot_c, offs_c = multi_cam_rig(C, baseline=1.0)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
    for c in range(C):
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c], H, W)
    frames[f0:f1, 1] = rng.uniform(0, 30,
                                   frames[f0:f1, 1].shape).astype(np.float32)
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))
    groups = []
    for f in range(F):
        eng.process_frame(frames[f])
        groups.append(tuple(eng.group_id.tolist()))
    return eng, Rs_gt, ts_gt, groups, (f0, f1)


def test_group_splits_during_blackout(occlusion_run):
    _, _, _, groups, (f0, f1) = occlusion_run
    assert any(g[0] != g[1] for g in groups[f0 + 10:f1 + 10])


def test_realign_merge_fires_after_uncover(occlusion_run):
    eng, _, _, _, (f0, f1) = occlusion_run
    realigns = [m for m in eng.merge_log
                if not m.get("noop") and not m.get("reunify")]
    assert len(realigns) >= 1, eng.merge_log
    assert realigns[0]["frame"] >= f1   # after uncover
    assert realigns[0]["n_matches"] >= 10


def test_recovered_camera_tracks_again(occlusion_run):
    """Post-recovery, camera 1's trajectory must re-converge to ground
    truth (scored from 10 frames after the realignment merge settles)."""
    eng, Rs_gt, ts_gt, groups, (f0, f1) = occlusion_run
    assert groups[-1][0] == groups[-1][1]      # rejoined at the end
    realigns = [m for m in eng.merge_log
                if not m.get("noop") and not m.get("reunify")]
    F = Rs_gt.shape[1]
    start = min(realigns[0]["frame"] + 10, F - 15)
    for c in range(2):
        Rs, ts = eng.trajectory(c, True)
        ate = ate_rmse(Rs[start:], ts[start:],
                       Rs_gt[c, start:], ts_gt[c, start:])
        assert ate < 0.3, f"cam{c} post-recovery ATE {ate}"
