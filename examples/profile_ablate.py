"""Cumulative ablation timing of the fused frame step (one jitted program
per variant, so axon-tunnel dispatch overhead cancels out in differences).

Variant k runs stages 0..k of frame_step and returns a value depending on
everything computed. The time difference between consecutive variants is
the device cost of the added stage *inside the fusion*.

Usage: python examples/profile_ablate.py [--iters 30]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
    import jax.numpy as jnp
    from functools import partial
    from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
    from coslam_tpu.slam.state import init_state
    from coslam_tpu.slam import steps
    from coslam_tpu.slam.fused import frame_step
    from coslam_tpu.ops import build_pyramid
    from coslam_tpu.ops.image import gaussian_blur
    from coslam_tpu.slam.classify import detect_dynamic_features, \
        classify_map_points

    C, H, W = 3, 480, 640
    cfg = SlamConfig(
        num_cameras=C, image_height=H, image_width=W,
        klt=KLTConfig(n_levels=4),
        cap=CapacityConfig(max_features=1024, max_map_points=8192,
                           max_keyframes=64, ba_window=5))
    state0 = init_state(cfg)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 255, (C, H, W)), jnp.float32)
    imgs_prev = gaussian_blur(gaussian_blur(base))
    imgs_cur = jnp.roll(imgs_prev, 2, axis=-1)
    K = jnp.asarray(np.broadcast_to(
        np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                 dtype=np.float32), (C, 3, 3)))
    kc = jnp.zeros((C, 5), jnp.float32)
    pyr0 = build_pyramid(imgs_prev, cfg.klt.n_levels)
    state0, pyr0, _ = frame_step(state0, pyr0, imgs_cur, K, kc, cfg)
    img_hw = (H, W)
    n = args.iters

    @partial(jax.jit, static_argnames=("upto",))
    def variant(state, pyr_prev, upto):
        pyr_cur = build_pyramid(imgs_cur + state.t[0, 0], cfg.klt.n_levels)
        if upto == 0:
            return state, pyr_cur
        tracks = steps.advance_tracks(pyr_prev, pyr_cur, state.tracks, K,
                                      kc, state.frame + 1, cfg)
        state = state._replace(tracks=tracks, frame=state.frame + 1)
        if upto == 1:
            return state, pyr_cur
        out = steps.pose_update(state, K, kc, img_hw, cfg)
        state = state._replace(R=out.R, t=out.t, tracks=out.tracks,
                               mappts=out.mappts)
        state = steps.push_pose_history(state)
        if upto == 2:
            return state, pyr_cur
        state = detect_dynamic_features(state, K, cfg)
        if upto == 3:
            return state, pyr_cur
        cls = classify_map_points(state, K, cfg)
        state = state._replace(mappts=cls.mappts)
        if upto == 4:
            return state, pyr_cur
        mappts, tracks2, n_new = steps.new_map_points(state, pyr_cur, K,
                                                      kc, cfg)
        state = state._replace(mappts=mappts, tracks=tracks2)
        return state, pyr_cur

    # --- speed-of-light estimates per stage -------------------------------
    # v5e per chip: HBM ~819 GB/s, MXU ~197 bf16 TFLOP/s, VPU f32 ~ a few
    # TFLOP/s. Every stage here is HBM- or VPU-bound (tiny matmuls), so the
    # binding resource is bytes moved; the numbers below are the main-array
    # traffic (reads+writes, f32) of each stage — a LOWER bound on time at
    # peak bandwidth. Optimize against these ceilings, not against diffs.
    HBM_BW = 819e9
    N = cfg.cap.max_features
    P = cfg.cap.max_map_points
    T = 21                                  # history ring (history_len)
    L = cfg.klt.n_levels
    win = (2 * cfg.klt.window_radius + 1) ** 2
    lvl_px = sum((H >> l) * (W >> l) for l in range(L))
    sol_bytes = {
        # read gray, write img+dx+dy per level (f32)
        "pyramid": C * 4 * (H * W + 3 * lvl_px + 2 * lvl_px),
        # per level+iter: read 2 windows (cur via resample ~2x) + write
        "+advance_tracks": C * N * 4 * L * cfg.klt.n_iterations * win * 3,
        # gating/refine: [C,N] component arrays, ~40 passes + cov gathers
        "+pose_update": C * N * 4 * 40 + C * N * 9 * 4 * 2,
        # F-matrix epipolar over [C,T,N]
        "+dyn_detect": C * T * N * 4 * 8,
        # classify: obs table + [T,P] windowed test + C^2 drop-one-view
        "+classify": P * 4 * (10 + 2 * T) + C * C * P * 4 * 6,
        # history-pair triangulation [C,T,N] ~ 30 component arrays
        "+new_map_points": C * T * N * 4 * 30,
    }
    names = ["pyramid", "+advance_tracks", "+pose_update", "+dyn_detect",
             "+classify", "+new_map_points"]
    prev = 0.0
    for upto, name in enumerate(names):
        st, pyr = variant(state0, pyr0, upto)    # compile
        _ = np.asarray(st.R[0, 0])
        t0 = time.perf_counter()
        st, pyr = state0, pyr0
        for _ in range(n):
            st, pyr = variant(st, pyr, upto)
        _ = np.asarray(st.R[0, 0])
        dt = (time.perf_counter() - t0) / n * 1e3
        sol_ms = sol_bytes[name] / HBM_BW * 1e3
        delta = dt - prev
        eff = f"{100 * sol_ms / max(delta, 1e-9):5.1f}%" if delta > 0 \
            else "  n/a"
        print(f"{name:22s} cum {dt:7.3f} ms   delta {delta:7.3f} ms   "
              f"SoL {sol_ms:6.3f} ms  ({eff} of bandwidth ceiling)",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
