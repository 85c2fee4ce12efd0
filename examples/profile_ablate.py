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
        print(f"{name:22s} cum {dt:7.3f} ms   delta {dt - prev:7.3f} ms",
              flush=True)
        prev = dt


if __name__ == "__main__":
    main()
