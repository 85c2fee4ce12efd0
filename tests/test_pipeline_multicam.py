"""End-to-end collaborative SLAM tests (BASELINE configs 2 and 3):
two-camera static scene and three-camera dynamic scene with
static/dynamic classification."""

import numpy as np
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig,
                                     MovingQuad, make_texture)
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

pytestmark = pytest.mark.slow

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


def render_rig(rng, C, F, baseline, quads=None, forward=0.05):
    planes = make_room(rng, size=10.0)
    Rr, tr = orbit_trajectory(F, forward=forward)
    rot_c, offs_c = multi_cam_rig(C, baseline=baseline)
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
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c], H, W,
                                       quads=quads)
    return frames, Rs_gt, ts_gt


def run_engine(C, frames):
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    K = np.stack([K1] * C)
    kc = np.zeros((C, 5), dtype=np.float32)
    eng = CoSlamEngine(cfg, K, kc)
    for f in range(frames.shape[0]):
        eng.process_frame(frames[f])
    return eng


@pytest.fixture(scope="module")
def two_cam():
    rng = np.random.default_rng(0)
    frames, Rs_gt, ts_gt = render_rig(rng, C=2, F=45, baseline=1.0,
                                      forward=0.06)
    return run_engine(2, frames), Rs_gt, ts_gt


@pytest.fixture(scope="module")
def three_cam_dynamic():
    rng = np.random.default_rng(0)
    quad = MovingQuad(center0=np.array([-3.0, 0.5, 13.0], dtype=np.float32),
                      velocity=np.array([0.12, 0.0, 0.0], dtype=np.float32),
                      eu=np.array([2.2, 0.0, 0.0], dtype=np.float32),
                      ev=np.array([0.0, 2.2, 0.0], dtype=np.float32),
                      tex=make_texture(rng))
    frames, Rs_gt, ts_gt = render_rig(rng, C=3, F=50, baseline=0.9,
                                      quads=[quad])
    return run_engine(3, frames), Rs_gt, ts_gt, quad


def test_two_cam_bootstrap_frame0(two_cam):
    eng, _, _ = two_cam
    assert eng.bootstrapped
    assert eng.kf_frames[0] == 0     # wide-baseline init needs no motion


def test_two_cam_ate(two_cam):
    eng, Rs_gt, ts_gt = two_cam
    for c in range(2):
        ate = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        assert ate < 0.25, f"cam{c} ATE {ate}"


def test_two_cam_single_group(two_cam):
    eng, _, _ = two_cam
    assert (eng.group_id == eng.group_id[0]).all()


def test_three_cam_ate(three_cam_dynamic):
    eng, Rs_gt, ts_gt, _ = three_cam_dynamic
    for c in range(3):
        ate = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        assert ate < 0.35, f"cam{c} ATE {ate}"


def test_three_cam_dynamic_points_follow_object(three_cam_dynamic):
    """The moving quad's points must be classified dynamic and their
    positions must FOLLOW the object. Asserted in a similarity-invariant
    way (the monocular-style bootstrap anchors scale at a nominal depth,
    so raw engine coordinates differ from the metric world by a Sim(3)):
      - >= 2 alive dynamic points whose bound features lie inside the
        gt-projected quad region in >= 2 cameras;
      - those points' fitted velocities point along +x (the quad's motion
        direction; the engine frame's orientation matches gt's up to the
        small bootstrap rotation) and dominate the y component.
    """
    from coslam_tpu.slam.state import ST_ALIVE, PT_DYNAMIC
    eng, Rs_gt, ts_gt, quad = three_cam_dynamic
    assert len(eng.dyn_log) > 10     # dynamic snapshots recorded
    st = eng.state
    tr = st.tracks
    mp = st.mappts
    f_last = int(st.frame)
    qc = np.asarray(quad.center0) + f_last * np.asarray(quad.velocity)
    hits = {}
    for c in range(3):
        Rg, tg = Rs_gt[c, f_last], ts_gt[c, f_last]
        Xc = Rg @ qc + tg
        u = Xc[0] / Xc[2] * K1[0, 0] + K1[0, 2]
        v = Xc[1] / Xc[2] * K1[1, 1] + K1[1, 2]
        half = 1.1 / Xc[2] * K1[0, 0]
        pos = np.asarray(tr.pos[c])
        sel = np.asarray(tr.valid[c]) & (np.asarray(tr.mpt[c]) >= 0) \
            & (np.abs(pos[:, 0] - u) < half) & (np.abs(pos[:, 1] - v) < half)
        for s in np.asarray(tr.mpt[c])[sel]:
            hits[int(s)] = hits.get(int(s), 0) + 1
    quad_slots = [s for s, n in hits.items() if n >= 2
                  and int(np.asarray(mp.status)[s]) == ST_ALIVE]
    dyn_slots = [s for s in quad_slots
                 if int(np.asarray(mp.ptype)[s]) == PT_DYNAMIC]
    assert len(dyn_slots) >= 2, (quad_slots, dyn_slots)
    # velocity fit over the dynamic snapshots
    by_id = {}
    for (f, ids, xyz) in eng.dyn_log:
        for i, p_ in zip(ids, xyz):
            by_id.setdefault(int(i), []).append((f, p_))
    good_vel = 0
    for s in dyn_slots:
        traj = by_id.get(s, [])
        if len(traj) < 8:
            continue
        fs = np.array([a for a, _ in traj], float)
        ps = np.stack([b for _, b in traj])
        A = np.stack([fs, np.ones_like(fs)], -1)
        vel = np.linalg.lstsq(A, ps, rcond=None)[0][0]
        if vel[0] > 0 and abs(vel[1]) < max(vel[0], 1e-6):
            good_vel += 1
    assert good_vel >= 1, {s: len(by_id.get(s, [])) for s in dyn_slots}


def test_three_cam_statics_dominate(three_cam_dynamic):
    eng, _, _, _ = three_cam_dynamic
    last = [s for s in eng.stats_log if "n_static" in s][-1]
    assert last["n_static"] > 100
    assert last["n_dynamic"] >= 1
    assert last["n_static"] > 5 * last["n_dynamic"]


def test_three_cam_intercam_mapping_contributes(three_cam_dynamic):
    eng, _, _, _ = three_cam_dynamic
    total_inter = sum(s.get("n_intercam_points", 0) for s in eng.stats_log)
    assert total_inter > 0


def test_five_cameras_run():
    """BASELINE config 5's SLAM content (five cameras, one device; the
    cross-device sharding of the same computation is covered by
    tests/test_parallel.py and dryrun_multichip)."""
    rng = np.random.default_rng(0)
    frames, Rs_gt, ts_gt = render_rig(rng, C=5, F=35, baseline=0.7)
    eng = run_engine(5, frames)
    assert eng.bootstrapped
    assert (eng.group_id == eng.group_id[0]).all()
    for c in range(5):
        ate = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        assert ate < 0.5, f"cam{c} ATE {ate}"
