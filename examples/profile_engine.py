"""Per-stage wall-clock profile of the engine loop on the live device.

Renders (or loads the bench cache of) the bench engine scene and runs the
engine with fine-grained host-side timing around every cadence sub-stage,
to locate the tunnel round trips that dominate engine fps.

Run on the TPU: python examples/profile_engine.py [--overlap] [--chunk N]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
from coslam_tpu.slam.pipeline import CoSlamEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--overlap", action="store_true")
    ap.add_argument("--chunk", type=int, default=1)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--resident", action="store_true",
                    help="pre-stage frames in device memory (models a "
                         "co-located PCIe host; the axon tunnel uploads "
                         "at ~9 MB/s, which caps any host-fed loop)")
    args = ap.parse_args()
    C, H, W = 3, 480, 640
    F = args.frames
    rng = np.random.default_rng(0)
    Kb = np.broadcast_to(
        np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                 np.float32), (C, 3, 3)).copy()
    cache = f"/tmp/coslam_bench_frames_{C}x{H}x{W}_{F}.npy"
    if os.path.exists(cache):
        frames = np.load(cache)
    else:
        from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                             render, multi_cam_rig)
        planes = make_room(rng, size=10.0)
        Rr, tr = orbit_trajectory(F, forward=0.05)
        rot_c, offs_c = multi_cam_rig(C, baseline=1.0)
        frames = np.zeros((F, C, H, W), np.float32)
        for f in range(F):
            c_rig = -Rr[f].T @ tr[f]
            for c in range(C):
                center = c_rig + Rr[f].T @ offs_c[c]
                Rc = rot_c[c] @ Rr[f]
                frames[f, c] = np.asarray(render(
                    planes, Kb[c], Rc, -Rc @ center, H, W))
        frames = np.clip(frames, 0, 255).astype(np.uint8)
        np.save(cache, frames)
    cfg = SlamConfig(
        num_cameras=C, image_height=H, image_width=W,
        klt=KLTConfig(n_levels=4),
        cap=CapacityConfig(max_features=1024, max_map_points=8192,
                           max_keyframes=64, ba_window=5))
    kw = {}
    if args.chunk > 1:
        kw["chunk"] = args.chunk
    eng = CoSlamEngine(cfg, Kb, np.zeros((C, 5), np.float32),
                       overlap=args.overlap, **kw)
    if args.resident:
        import jax.numpy as jnp
        frames = [jax.device_put(jnp.asarray(frames[f]))
                  for f in range(F)]
        _ = np.asarray(frames[-1][0, 0, 0])   # wait for staging
    warm = 20
    for f in range(warm):
        eng.process_frame(frames[f])
    from coslam_tpu.slam.merge import fuse_close_points
    fuse_close_points(eng.state, cfg)      # pre-warm the frame-50 graph
    eng.timing = {}
    per_frame = []
    t_all0 = time.perf_counter()
    for f in range(warm, F):
        t0 = time.perf_counter()
        eng.process_frame(frames[f])
        per_frame.append(time.perf_counter() - t0)
    dt = time.perf_counter() - t_all0
    n = F - warm
    print(f"steady fps: {n / dt:.2f}  ({1e3 * dt / n:.1f} ms/frame)")
    print("timing (ms/frame):")
    for k, v in sorted(eng.timing.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {1e3 * v / n:8.2f}")
    pf = np.array(per_frame) * 1e3
    print(f"per-frame ms: med={np.median(pf):.1f} p90={np.percentile(pf, 90):.1f} "
          f"max={pf.max():.1f}")
    hi = np.argsort(pf)[-8:]
    print("slowest frames:", [(int(i) + warm, round(float(pf[i]), 1))
                              for i in sorted(hi)])


if __name__ == "__main__":
    main()
