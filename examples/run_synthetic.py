"""Run the full pipeline on a synthetic room sequence and print ATE.

Usage: python examples/run_synthetic.py [--frames 60] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from coslam_tpu.config import small_test_config
    from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                         render_sequence)
    from coslam_tpu.io.ate import ate_rmse
    from coslam_tpu.slam.pipeline import CoSlamEngine

    rng = np.random.default_rng(0)
    H, W = 150, 200
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    K = np.array([[[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]]],
                 dtype=np.float32)
    kc = np.zeros((1, 5), dtype=np.float32)
    planes = make_room(rng, size=10.0)
    Rs_gt, ts_gt = orbit_trajectory(args.frames, forward=0.06)
    print("rendering...", flush=True)
    frames = render_sequence(planes, K[0], Rs_gt, ts_gt, H, W)
    eng = CoSlamEngine(cfg, K, kc)
    t0 = time.time()
    for f in range(args.frames):
        s = eng.process_frame(frames[f][None])
        if f % 20 == 0:
            print(f"frame {f}: inliers={s['n_inliers']}", flush=True)
    dt = time.time() - t0
    Rs, ts = eng.trajectory(0, correct=True)
    ate = ate_rmse(Rs, ts, Rs_gt, ts_gt)
    ids, xyz, _ = eng.map_points()
    print(f"frames: {args.frames}  time: {dt:.1f}s  "
          f"({args.frames / dt:.1f} fps incl. compile)")
    print(f"map points: {len(ids)}  keyframes: {len(eng.kf_frames)}")
    print(f"ATE: {ate:.4f} m (bound: 0.20)")
    ok = ate < 0.20 and np.isfinite(xyz).all()
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
