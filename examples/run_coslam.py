"""Run collaborative SLAM on real inputs, reference-CLI compatible.

Usage: python examples/run_coslam.py <input.txt> [--out DIR] [--frames N]

<input.txt> uses the reference's format (videos + calibration files,
README.md:91-116). Videos are decoded to raw grayscale via cv2 on first
use; the native threaded loader then feeds the pipeline. Results are
exported in the reference's output format (mappts.txt, <c>_campose.txt).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--out", default=None)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny capacities (smoke tests: fast compiles)")
    args = ap.parse_args()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from coslam_tpu.config import SlamConfig
    from coslam_tpu.io.calib import parse_input_file, read_calib_file
    from coslam_tpu.io.loader import (FrameLoader, convert_video_to_raw,
                                      MODE_RAW)
    from coslam_tpu.io.export import export_results
    from coslam_tpu.slam.pipeline import CoSlamEngine

    spec = parse_input_file(args.input)
    C = spec.num_views
    Ks, kcs = [], []
    for p in spec.calib_paths:
        K, kc = read_calib_file(p)
        Ks.append(K)
        kcs.append(kc)
    # decode videos to raw once (cached next to the video)
    raw_paths = []
    for v in spec.video_paths:
        if v.endswith(".csrw") or v.endswith(".raw"):
            raw_paths.append(v)
            continue
        rp = v + ".csrw"
        if not os.path.exists(rp):
            print(f"decoding {v} ...", flush=True)
            convert_video_to_raw(v, rp)
        raw_paths.append(rp)
    loader = FrameLoader(raw_paths, mode=MODE_RAW,
                         start_frames=spec.skip_frames)
    h, w = loader.hw
    if args.small:
        from coslam_tpu.config import small_test_config
        cfg = small_test_config(num_cameras=C, h=h, w=w)
    else:
        cfg = SlamConfig(num_cameras=C, image_height=h, image_width=w)
    eng = CoSlamEngine(cfg, np.stack(Ks), np.stack(kcs))
    t0 = time.time()
    n = 0
    for frames in loader:
        stats = eng.process_frame(frames)
        n += 1
        if n % 25 == 0:
            print(f"f:{n}  inliers={stats['n_inliers']}", flush=True)
        if args.frames and n >= args.frames:
            break
    dt = time.time() - t0
    loader.close()
    print(f"processed {n} frames in {dt:.1f}s ({n / max(dt, 1e-9):.1f} fps)")
    out = args.out or os.path.expanduser(
        f"~/slam_results/{time.strftime('%Y%m%d_%H%M%S')}")
    export_results(out, eng, sources=spec.video_paths)
    print(f"results exported to {out}")


if __name__ == "__main__":
    main()
