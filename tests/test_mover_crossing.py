"""Regression: a mover crossing and occluding the shared view of a FIXED
rig must not trigger a corrupting Sim(3) realignment.

The round-3 flagship failure (threecam_dyn, frames 300-500): the moving
quad closes on the rig, occludes the shared view, grouping splits, and a
merge then realigned one camera of a rig that never diverged — 4.9 units
of injected error. The defenses under test:
  - dynamic-voted / dynamic-mapped features are excluded from the merge
    bridge match (merge.py static_feat mask);
  - the no-op hypothesis check commits occlusion-flap merges WITHOUT
    realignment when the current pose already explains the bridge;
  - the BA divergence gate + majority/mass-kill rules keep a degenerate
    window from teleporting poses or executing the live map.
"""

import numpy as np
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, render_sequence,
                                     multi_cam_rig, MovingQuad,
                                     make_texture)
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

pytestmark = pytest.mark.slow

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


@pytest.fixture(scope="module")
def crossing_run():
    """3-camera rig advancing slowly; a big textured quad sweeps across
    the shared view at close range (starts far left, crosses through the
    optical axes, exits right), occluding much of the overlap for a
    sustained stretch — the production divergence scenario at test
    scale."""
    rng = np.random.default_rng(2)
    from coslam_tpu.io.synthetic import orbit_trajectory
    planes = make_room(rng, size=10.0)
    C, F = 3, 90
    Rr, tr = orbit_trajectory(F, forward=0.03)
    rot_c, offs_c = multi_cam_rig(C, baseline=0.9)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    # close, large, fast: crosses the whole shared frustum in ~55 frames
    quad = MovingQuad(center0=np.array([-4.5, 0.3, 6.0], np.float32),
                      velocity=np.array([0.16, 0.0, 0.0], np.float32),
                      eu=np.array([2.6, 0.0, 0.0], np.float32),
                      ev=np.array([0.0, 2.6, 0.0], np.float32),
                      tex=make_texture(rng))
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
    for c in range(C):
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c],
                                       H, W, quads=[quad])
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C),
                       np.zeros((C, 5), np.float32))
    for f in range(F):
        eng.process_frame(frames[f])
    return eng, Rs_gt, ts_gt


def test_no_corrupting_realignment(crossing_run):
    """Every camera of the fixed rig must end within the normal ATE band:
    a realignment injected by the mover would put one camera off by whole
    units (round-3 observed 4.9)."""
    eng, Rs_gt, ts_gt = crossing_run
    ates = []
    for c in range(3):
        Rs, ts = eng.trajectory(c, correct=True, chain_scales=True)
        ates.append(ate_rmse(Rs, ts, Rs_gt[c], ts_gt[c]))
    # the occlusion phase costs ~0.3-0.7 of ordinary drift on this scene
    # (chaotic run to run); the failure class under test is the injected
    # realignment at 4.9 units — bound on the catastrophe scale
    assert max(ates) < 1.2, ates


def test_rig_geometry_not_exploded(crossing_run):
    """CoSLAM cameras are free-moving — nothing hard-constrains the rig
    baseline, and under heavy occlusion the per-camera drifts differ, so
    relative distances wander by fractions of a unit (observed ~0.1-0.8
    on this scene WITHOUT any merge firing). What must never happen is a
    corruption-scale separation: a mover-poisoned realignment flings one
    camera whole units away (round 3 observed 4.9)."""
    eng, Rs_gt, ts_gt = crossing_run
    est_c, gt_c = [], []
    for c in range(3):
        Rs, ts = eng.trajectory(c, correct=True, chain_scales=True)
        est_c.append(-Rs[-1].T @ ts[-1])
        gt_c.append(-Rs_gt[c, -1].T @ ts_gt[c, -1])
    for i in range(3):
        for j in range(i + 1, 3):
            d_est = np.linalg.norm(est_c[i] - est_c[j])
            d_gt = np.linalg.norm(gt_c[i] - gt_c[j])
            assert abs(d_est - d_gt) < 1.5, (i, j, d_est, d_gt)


def test_merges_if_any_are_sane(crossing_run):
    """Splits caused by the occlusion may re-merge; every committed merge
    on the fixed rig must be a no-op reunification or a near-identity
    correction (scale_move ~ 1)."""
    eng, _, _ = crossing_run
    for m in eng.merge_log:
        if m.get("noop") or m.get("reunify"):
            continue
        assert 0.8 < m["scale_move"] < 1.25, m
