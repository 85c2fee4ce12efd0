"""Diagnostic: where does the accuracy-harness engine time go?

Runs the threecam_dyn scenario for a short span with profile=True and
prints the engine's per-stage timing dict — distinguishes compiles,
tunnel round trips, and cadence work. Run directly (python
tests/diag_acc_speed.py [frames]); not collected by pytest.
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main(F=80):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    sys.path.insert(0, "examples")
    from examples.accuracy_bench import _rig_frames, _cfg, K1
    from coslam_tpu.io.synthetic import MovingQuad, make_texture
    from coslam_tpu.slam.pipeline import CoSlamEngine

    rng = np.random.default_rng(7)
    quad = MovingQuad(
        center0=np.array([-3.0, 0.5, 14.0], np.float32),
        velocity=np.array([0.012, 0.0, 0.0], np.float32),
        eu=np.array([1.6, 0, 0], np.float32),
        ev=np.array([0, 1.6, 0], np.float32),
        tex=make_texture(rng))
    t0 = time.perf_counter()
    frames, Rs, ts = _rig_frames(rng, 3, F, baseline=1.0, forward=0.04,
                                 quads=[quad])
    print(f"render: {time.perf_counter() - t0:.1f}s", flush=True)
    cfg = _cfg(3)
    eng = CoSlamEngine(cfg, np.stack([K1] * 3), np.zeros((3, 5), np.float32),
                       chunk=6, profile=True)
    t0 = time.perf_counter()
    stage = jax.device_put(jnp.asarray(frames, jnp.float16))
    _ = np.asarray(stage[0, 0, 0, 0])
    print(f"stage: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    marks = {}
    for f in range(F):
        eng.process_frame(stage[f])
        if f in (12, 30):
            marks[f] = time.perf_counter() - t0
    eng._flush_chunk()
    dt = time.perf_counter() - t0
    print(f"engine: {F} frames in {dt:.1f}s = {F / dt:.2f} f/s "
          f"(first 12: {marks.get(12, 0):.1f}s, first 30: "
          f"{marks.get(30, 0):.1f}s)", flush=True)
    tot = sum(eng.timing.values())
    for k, v in sorted(eng.timing.items(), key=lambda kv: -kv[1]):
        print(f"  {k:18s} {v:8.2f}s  {100 * v / max(tot, 1e-9):5.1f}%")
    print(f"  ({tot:.1f}s instrumented of {dt:.1f}s wall)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)
