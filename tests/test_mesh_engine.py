"""Multi-chip ENGINE mode: CoSlamEngine driven over a camera-axis device
mesh (SURVEY §2.7 new-architecture requirement; BASELINE config 5's
multi-host shape). The fused step's pixel-heavy stages run
one-camera-per-device via shard_map; cadence functions (keyframes, BA,
merge checks, intercam mapping) compile under GSPMD on the same mesh.

Runs on the virtual CPU mesh (tests/conftest.py forces 8 CPU devices) —
the standard JAX substitute for multi-host testing without a cluster."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from jax.sharding import Mesh

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig)
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


def _render_rig(rng, C, F, baseline, forward=0.05):
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
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c], H, W)
    return frames, Rs_gt, ts_gt


def test_engine_on_two_device_mesh():
    """Full chunked engine over a 2-device 'cam' mesh: bootstraps, stays
    one group, and tracks within the same ATE band as the single-device
    engine (tests/test_pipeline_multicam.py::test_two_cam_ate's 0.25)."""
    rng = np.random.default_rng(0)
    C, F = 2, 30
    frames, Rs_gt, ts_gt = _render_rig(rng, C=C, F=F, baseline=1.0,
                                       forward=0.06)
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    mesh = Mesh(np.array(jax.devices()[:C]), ("cam",))
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32),
                       mesh=mesh, chunk=3)
    for f in range(F):
        eng.process_frame(frames[f])
    eng._flush_chunk()
    assert eng.bootstrapped
    assert (eng.group_id == eng.group_id[0]).all()
    for c in range(C):
        ate = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        assert ate < 0.25, f"cam{c} ATE {ate}"


def test_mesh_engine_matches_single_device_keyframes():
    """The mesh engine must make the same structural decisions (keyframe
    schedule, group membership) as the single-device engine on the same
    input — the sharding is a layout choice, not an algorithm change.
    (Poses match only to float tolerance: reduction orders differ.)"""
    rng = np.random.default_rng(3)
    C, F = 2, 18
    frames, Rs_gt, ts_gt = _render_rig(rng, C=C, F=F, baseline=1.0,
                                       forward=0.06)
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    K = np.stack([K1] * C)
    kc = np.zeros((C, 5), np.float32)
    eng1 = CoSlamEngine(cfg, K, kc)
    mesh = Mesh(np.array(jax.devices()[:C]), ("cam",))
    eng2 = CoSlamEngine(cfg, K, kc, mesh=mesh)
    for f in range(F):
        eng1.process_frame(frames[f])
        eng2.process_frame(frames[f])
    assert eng1.bootstrapped and eng2.bootstrapped
    assert eng1.kf_frames == eng2.kf_frames, \
        (eng1.kf_frames, eng2.kf_frames)
    # trajectories agree to numerical slack
    for c in range(C):
        R1, t1 = eng1.trajectory(c, False)
        R2, t2 = eng2.trajectory(c, False)
        c1 = -np.einsum("fji,fj->fi", R1, t1)
        c2 = -np.einsum("fji,fj->fi", R2, t2)
        assert float(np.abs(c1 - c2).max()) < 0.05, \
            float(np.abs(c1 - c2).max())
