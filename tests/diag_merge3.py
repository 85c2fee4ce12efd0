"""Diag for test_post_merge_alignment cam0 regression: rerun the fixture,
print merge events + per-frame aligned errors; optional backoff disable."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import sys
import numpy as np
import jax.numpy as jnp

sys.path.insert(0, "tests")
from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render
from coslam_tpu.geometry.se3 import so3_exp
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.io.ate import ate_rmse, camera_centers, umeyama

C, H, W = 2, 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)
F = 100


def _yaw1(f):
    if f < 20:
        return 0.0
    if f < 40:
        return 0.9 * (f - 20) / 20
    if f < 55:
        return 0.9
    if f < 75:
        return 0.9 * (75 - f) / 20
    return 0.0


def main():
    no_backoff = "--no-backoff" in sys.argv
    rng = np.random.default_rng(1)
    planes = make_room(rng, size=10.0)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        base_c = np.array([0.0, 0.0, 0.02 * f], dtype=np.float32)
        for c in range(C):
            yaw = _yaw1(f) if c == 1 else 0.0
            Rc = np.asarray(so3_exp(jnp.array([0.0, yaw, 0.0],
                                              dtype=jnp.float32)))
            center = base_c + np.array([c * 1.0 - 0.5, 0, 0],
                                       dtype=np.float32)
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
            frames[f, c] = np.asarray(render(planes, K1, Rc, ts_gt[c, f],
                                             H, W))
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))
    if no_backoff:
        cls = type(eng)
        # pin backoff at zero by intercepting attribute writes
        eng.__dict__["_merge_backoff"] = 0
        orig_setattr = None
    groups_hist = []
    for f in range(F):
        eng.process_frame(frames[f])
        if no_backoff:
            eng._merge_backoff = 0
        groups_hist.append(tuple(eng.group_id.tolist()))
    a0 = ate_rmse(*eng.trajectory(0, True), Rs_gt[0], ts_gt[0])
    a1 = ate_rmse(*eng.trajectory(1, True), Rs_gt[1], ts_gt[1])
    print("merge_log:", eng.merge_log)
    print("loop_log:", eng.loop_log)
    trans = [(i, groups_hist[i]) for i in range(1, F)
             if groups_hist[i] != groups_hist[i - 1]]
    print("group transitions:", trans)
    print(f"ATE cam0={a0:.4f} cam1={a1:.4f}")
    Rs, ts = eng.trajectory(0, True)
    ce = camera_centers(Rs, ts)
    cg = camera_centers(Rs_gt[0], ts_gt[0])
    s, R, t = umeyama(ce, cg)
    err = np.linalg.norm((s * (R @ ce.T)).T + t - cg, axis=1)
    print("cam0 err/frame:", " ".join(f"{e:.2f}" for e in err))


if __name__ == "__main__":
    main()
