"""Diagnostic runner for the split/merge scenario (not collected by pytest).

Prints per-phase tracking health and the final metrics the tests gate on,
so robustness work has numbers to aim at. Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tests/diag_merge.py
"""
import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render
from coslam_tpu.geometry.se3 import so3_exp
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.io.ate import ate_rmse

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
    rng = np.random.default_rng(1)
    planes = make_room(rng, size=10.0)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        base_c = np.array([0.0, 0.0, 0.02 * f], dtype=np.float32)
        for c in range(C):
            yaw = _yaw1(f) if c == 1 else 0.0
            Rc = np.asarray(so3_exp(jnp.array([0.0, yaw, 0.0], jnp.float32)))
            center = base_c + np.array([c * 1.0 - 0.5, 0, 0], np.float32)
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
            frames[f, c] = np.asarray(render(planes, K1, Rc, ts_gt[c, f], H, W))
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))
    for f in range(F):
        s = eng.process_frame(frames[f])
        if f % 10 == 0 or s.get("keyframe") or f > 70:
            gt_c = np.stack([-Rs_gt[c, f].T @ ts_gt[c, f] for c in range(C)])
            R, t = eng._pose_host()
            est_c = np.stack([-R[c].T @ t[c] for c in range(C)])
            err = np.linalg.norm(est_c - gt_c, axis=-1)
            print(f"f={f:3d} grp={tuple(eng.group_id.tolist())} "
                  f"inl={np.asarray(s['n_inliers']).astype(int)} "
                  f"kf={s.get('keyframe', False)} "
                  f"c_err={np.round(err, 3)} "
                  f"joint={s.get('joint_pose')}")
    print("merges:", eng.merge_log)
    for c in range(C):
        a = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        a_raw = ate_rmse(*eng.trajectory(c, False), Rs_gt[c], ts_gt[c])
        print(f"cam{c}: ATE corrected={a:.4f} raw={a_raw:.4f}")


if __name__ == "__main__":
    main()
