"""Production-scale distorted-config diag on the cached scene: per-frame
per-camera aligned error + inlier/new-point counts (runs on the real
TPU; scene from the accuracy-bench cache)."""
import sys
import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "examples")

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
import jax.numpy as jnp


def main():
    import importlib
    ab = importlib.import_module("accuracy_bench")
    rng = np.random.default_rng(7)
    kc = np.zeros((3, 5), np.float32)
    kc[:, 0] = -0.25
    kc[:, 1] = 0.08
    F = 300
    frames, Rs_gt, ts_gt = ab._rig_frames(rng, 3, F, baseline=1.0,
                                          forward=0.04, kc=kc)
    from coslam_tpu.slam.pipeline import CoSlamEngine
    from coslam_tpu.io.ate import ate_rmse, camera_centers, umeyama
    cfg = ab._cfg(3)
    K = np.stack([ab.K1] * 3)
    eng = CoSlamEngine(cfg, K, kc, chunk=6)
    stage = jax.device_put(jnp.asarray(frames, jnp.float16))
    _ = np.asarray(stage[0, 0, 0, 0])
    from jax import lax
    _slice = jax.jit(lambda a, i: lax.dynamic_index_in_dim(
        a, i, 0, keepdims=False))
    for f in range(F):
        eng.process_frame(_slice(stage, f))
        if f % 50 == 0:
            print(f"frame {f}", flush=True)
    eng._flush_chunk()
    for c in range(3):
        Rs, ts = eng.trajectory(c, True, chain_scales=True)
        a = ate_rmse(Rs, ts, Rs_gt[c], ts_gt[c])
        ce = camera_centers(Rs, ts)
        cg = camera_centers(Rs_gt[c], ts_gt[c])
        s, R, t = umeyama(ce, cg)
        err = np.linalg.norm((s * (R @ ce.T)).T + t - cg, axis=1)
        print(f"cam{c} ATE={a:.4f} err q={np.percentile(err, [50, 90]).round(3)}")
        # err per 30-frame block
        blocks = [float(np.sqrt((err[i:i + 30] ** 2).mean()))
                  for i in range(0, F, 30)]
        print("  blocks:", " ".join(f"{b:.2f}" for b in blocks))
    ni = np.stack([s["n_inliers"] for s in eng.stats_log
                   if "n_inliers" in s and np.ndim(s["n_inliers"])])
    print("n_inliers mean per cam:", ni.mean(0).round(1))
    print("kfs:", len(eng.kf_frames), "merges:", eng.merge_log,
          "loops:", eng.loop_log)


if __name__ == "__main__":
    main()
