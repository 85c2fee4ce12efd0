"""Per-stage device timing of the fused frame step on the real chip.

Times each stage of slam/fused.py::frame_step as its own jitted program
(bench-shaped workload: 3 cams x 480x640 x 1024 features). Chained
iterations with a final host readback give honest execution times on the
axon-tunneled TPU (block_until_ready returns early there).

Usage: python examples/profile_stages.py [--iters 30]
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
    state = init_state(cfg)
    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.uniform(0, 255, (C, H, W)), jnp.float32)
    imgs_prev = gaussian_blur(gaussian_blur(base))
    imgs_cur = jnp.roll(imgs_prev, 2, axis=-1)
    K = jnp.asarray(np.broadcast_to(
        np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                 dtype=np.float32), (C, 3, 3)))
    kc = jnp.zeros((C, 5), jnp.float32)
    pyr0 = build_pyramid(imgs_prev, cfg.klt.n_levels)
    # one fused step to get a realistic populated state
    state, pyr0, _ = frame_step(state, pyr0, imgs_cur, K, kc, cfg)
    img_hw = (H, W)
    n = args.iters

    def timed(name, fn, chain):
        """fn: carry -> carry (jitted); chain: carry -> array for sync."""
        carry = fn(None)          # first call = compile + init carry
        _ = np.asarray(chain(carry))
        t0 = time.perf_counter()
        for _ in range(n):
            carry = fn(carry)
        _ = np.asarray(chain(carry))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name:26s} {dt:8.3f} ms")
        return dt

    total = 0.0

    # 1. pyramid
    pyr_f = jax.jit(lambda im: build_pyramid(im, cfg.klt.n_levels))
    total += timed("build_pyramid",
                   lambda c: pyr_f(imgs_cur if c is None else
                                   c.imgs[0][..., :H, :W] * 1.0),
                   lambda c: c.imgs[0][0, 0, :2])

    # 2. KLT advance_tracks
    at = jax.jit(lambda tr: steps.advance_tracks(pyr0, pyr0, tr, K, kc,
                                                 state.frame, cfg))
    total += timed("advance_tracks (KLT)",
                   lambda c: at(state.tracks if c is None else c),
                   lambda c: c.pos[0, 0])

    # 3. pose update
    pu = jax.jit(lambda st: st._replace(
        R=steps.pose_update(st, K, kc, img_hw, cfg).R))
    total += timed("pose_update (IRLS+gate)",
                   lambda c: pu(state if c is None else c),
                   lambda c: c.R[0, 0])

    # 4. classification (multicam)
    cl = jax.jit(lambda st: st._replace(
        mappts=classify_map_points(detect_dynamic_features(st, K, cfg),
                                   K, cfg).mappts))
    total += timed("dyn-detect + classify",
                   lambda c: cl(state if c is None else c),
                   lambda c: c.mappts.xyz[0])

    # 5. new map points
    nm = jax.jit(lambda st: st._replace(
        mappts=steps.new_map_points(st, pyr0, K, kc, cfg)[0]))
    total += timed("new_map_points",
                   lambda c: nm(state if c is None else c),
                   lambda c: c.mappts.xyz[0])

    print(f"{'sum of stages':26s} {total:8.3f} ms")

    # fused reference
    def fused(c):
        st, pyr = (state, pyr0) if c is None else c
        st, pyr, _ = frame_step(st, pyr, imgs_cur, K, kc, cfg)
        return (st, pyr)
    t = timed("frame_step (fused)", fused, lambda c: c[0].R[0, 0])
    print(f"{'fused fps':26s} {1000.0 / t:8.1f}")


if __name__ == "__main__":
    main()
