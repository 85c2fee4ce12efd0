"""Diag for the distorted-config regression: small-scale 3-cam rig with
barrel distortion, per-frame per-cam errors."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, "tests")

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import apply_distortion_warp
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine
from diag_threecam import render_rig, K1, H, W


def main():
    rng = np.random.default_rng(0)
    C, F = 3, 60
    frames, Rs_gt, ts_gt = render_rig(rng, C=C, F=F, baseline=0.9,
                                      forward=0.05)
    kc = np.zeros((C, 5), np.float32)
    kc[:, 0] = -0.25
    kc[:, 1] = 0.08
    for c in range(C):
        frames[:, c] = np.asarray(
            apply_distortion_warp(frames[:, c], K1, kc[c]))
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), kc)
    for f in range(F):
        eng.process_frame(frames[f])
        st = eng.stats_log[-1] if eng.stats_log else {}
        R = np.asarray(eng.state.R)
        t = np.asarray(eng.state.t)
        e = []
        for c in range(C):
            cs = -R[c].T @ t[c]
            gt = -Rs_gt[c, f].T @ ts_gt[c, f]
            e.append(float(np.linalg.norm(cs - gt)))
        print(f"f={f:3d} cerr=[" + ",".join(f"{x:.3f}" for x in e) + "] "
              f"n_inl={st.get('n_inliers')} nnew={st.get('n_new_points')}",
              flush=True)
    for c in range(C):
        ate = ate_rmse(*eng.trajectory(c, True), Rs_gt[c], ts_gt[c])
        print(f"cam{c} ATE={ate:.4f}")


if __name__ == "__main__":
    main()
