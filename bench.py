"""Benchmark: tracked frames/s/chip for the fused per-frame SLAM step.

Workload (production-shaped): 3 cameras x 480x640 x 1024 KLT features,
full fused step (pyramids, coarse-to-fine KLT with gain, corner redetect,
IRLS pose, Mahalanobis gating, sequential point refinement, new-point
triangulation) as one jitted device call — the hot path of BASELINE.json
config 3.

Baseline derivation (BASELINE.md: the reference records NO numbers): the
reference's own GPU-KLT demo targeted real-time VGA tracking (~30 fps,
test_klt_for_video.cpp timing hooks) and README.md:107 states overall speed
"decreases significantly" with camera count; per-frame CPU stages (pose LM,
classification, NCC matrices) dominate beyond tracking. We take 15 fps as
the generous analytic estimate for the full 3-camera pipeline on the
reference's GPU/CPU and report vs_baseline = fps / 15. The >2x target of
BASELINE.md therefore means vs_baseline >= 2.

Timeout robustness: the axon-tunneled TPU pays ~100-260 s of one-time
backend init before the first op, so the primary JSON line is printed
IMMEDIATELY after the core measurement and the line is RE-printed,
enriched, after every further section (last full line wins). Every
optional section is gated on the remaining wall-clock budget
(COSLAM_BENCH_BUDGET_S, default 460 s) and the engine warm loop
re-checks the budget every frame.

Prints one JSON line per completed section; the last line is the record.
"""

import json
import os
import sys
import time

import numpy as np

_T_START = time.perf_counter()
BUDGET = float(os.environ.get("COSLAM_BENCH_BUDGET_S", "900"))


def _left():
    return BUDGET - (time.perf_counter() - _T_START)


def _note(msg):
    print(f"[bench +{time.perf_counter() - _T_START:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
    from coslam_tpu.slam.state import init_state
    from coslam_tpu.slam.fused import frame_step

    C, H, W = 3, 480, 640
    cfg = SlamConfig(
        num_cameras=C, image_height=H, image_width=W,
        klt=KLTConfig(n_levels=4),
        cap=CapacityConfig(max_features=1024, max_map_points=8192,
                           max_keyframes=64, ba_window=5))
    state = init_state(cfg)
    rng = np.random.default_rng(0)
    # smooth random texture so KLT iterations behave like real video
    from coslam_tpu.ops.image import gaussian_blur
    base = jnp.asarray(rng.uniform(0, 255, (C, H, W)), jnp.float32)
    imgs_prev = gaussian_blur(gaussian_blur(base))
    imgs_cur = jnp.roll(imgs_prev, 2, axis=-1)
    K = jnp.asarray(np.broadcast_to(
        np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                 dtype=np.float32), (C, 3, 3)))
    kc = jnp.zeros((C, 5), jnp.float32)

    # --- core fused step (the PRIMARY metric) ---------------------------
    # warmup/compile. NOTE: on the axon-tunneled TPU, block_until_ready
    # returns before execution completes; a host readback (np.asarray) is
    # the only honest sync, so we time a chain of steps and sync once at
    # the end through a value that depends on every step.
    from coslam_tpu.ops import build_pyramid
    pyr = build_pyramid(imgs_prev, cfg.klt.n_levels)
    state, pyr, stats = frame_step(state, pyr, imgs_cur, K, kc, cfg)
    _ = np.asarray(stats.n_tracked)
    _note("core compiled")
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, pyr, stats = frame_step(state, pyr, imgs_cur, K, kc, cfg)
    _ = np.asarray(state.frame)   # state chains through all steps
    dt = time.perf_counter() - t0
    fps = n_iters / dt
    baseline_fps = 15.0

    out = {
        "metric": "tracked_frames_per_s_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (3 cams, 640x480, 1024 feats)",
        "vs_baseline": round(fps / baseline_fps, 2),
    }
    print(json.dumps(out), flush=True)          # primary line: ALWAYS out
    _note(f"core: {fps:.1f} f/s")

    # --- chunked core (pure device compute) -----------------------------
    # lax.scan over the fused step: one dispatch for 30 frames, so the
    # per-call dispatch/tunnel overhead (~2 ms/call here) drops out. This
    # is the device-compute ceiling and the offline/batch path's number.
    if _left() > 90:
        from coslam_tpu.slam.fused import frame_steps_scan
        seq = jnp.broadcast_to(imgs_cur[None], (30, C, H, W))
        # frame_steps_scan donates (state, pyramid): build fresh ones
        st2, pyr2, _ = frame_steps_scan(
            init_state(cfg), build_pyramid(imgs_prev, cfg.klt.n_levels),
            seq, K, kc, cfg)
        _ = np.asarray(st2.frame)
        st2 = init_state(cfg)
        pyr2 = build_pyramid(imgs_prev, cfg.klt.n_levels)
        t0 = time.perf_counter()
        for _ in range(3):
            st2, pyr2, _st = frame_steps_scan(st2, pyr2, seq, K, kc, cfg)
        _ = np.asarray(st2.frame)
        scan_fps = 90 / (time.perf_counter() - t0)
        out["core_scan_frames_per_s"] = round(scan_fps, 2)
        out["core_scan_vs_baseline"] = round(scan_fps / baseline_fps, 2)
        print(json.dumps(out), flush=True)
        _note(f"core scan: {scan_fps:.1f} f/s")

    # --- BA throughput --------------------------------------------------
    # production-shaped window (5 keyframes x 3 cameras, 2048 points,
    # ~6k observations), LM iterations per second.
    if _left() > 60:
        from coslam_tpu.solvers.ba import BATableProblem, bundle_adjust_table
        from coslam_tpu.geometry.se3 import so3_exp
        M, Ppts = 15, 2048
        Xw = rng.uniform(-4, 4, (Ppts, 3)).astype(np.float32)
        Xw[:, 2] += 10
        Rb = np.stack([np.asarray(so3_exp(jnp.asarray(
            0.05 * rng.standard_normal(3).astype(np.float32))))
            for _ in range(M)])
        tb = np.stack([np.array([0.2 * m, 0, 0.05], np.float32)
                       for m in range(M)])
        valid = rng.random((M, Ppts)) < (3.0 / M)
        px = np.zeros((M, 2, Ppts), np.float32)
        for s in range(M):
            Xc = Xw @ Rb[s].T + tb[s]
            px[s, 0] = Xc[:, 0] / Xc[:, 2] * 500 + W / 2
            px[s, 1] = Xc[:, 1] / Xc[:, 2] * 500 + H / 2
        px += 0.3 * rng.standard_normal(px.shape).astype(np.float32)
        cam_fixed = np.zeros(M, bool)
        cam_fixed[:2] = True
        prob = BATableProblem(
            K=jnp.broadcast_to(K[0][None], (M, 3, 3)),
            R=jnp.asarray(Rb), t=jnp.asarray(tb),
            X=jnp.asarray(Xw + 0.05),
            obs_px=jnp.asarray(px), obs_valid=jnp.asarray(valid),
            cam_fixed=jnp.asarray(cam_fixed),
            point_fixed=jnp.zeros(Ppts, bool))
        inner = 30
        res = bundle_adjust_table(prob, max_err=10.0, max_iter=2,
                                  inner_iter=inner)
        _ = np.asarray(res.cost)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            res = bundle_adjust_table(prob._replace(X=res.X), max_err=10.0,
                                      max_iter=2, inner_iter=inner)
        _ = np.asarray(res.cost)
        out["ba_problem"] = "15 cams x 2048 pts x 6144 obs"
        out["ba_lm_iters_per_s"] = round(
            reps * 2 * inner / (time.perf_counter() - t0), 1)
        print(json.dumps(out), flush=True)
        _note(f"ba: {out['ba_lm_iters_per_s']} iters/s")

    # --- engine end-to-end ----------------------------------------------
    # the FULL CoSlamEngine per-frame path (fused core + host cadence:
    # classification, budget-triggered inter-camera mapping, registration,
    # keyframes, windowed BA) on a rendered synthetic 3-camera scene at
    # production shape — the number a user of the engine actually gets,
    # tunnel latency and all. The core-step fps above is the
    # device-compute ceiling.
    try:
        _engine_bench(out, cfg, rng, C, H, W)
    except Exception as e:              # engine bench must never kill the
        _note(f"engine bench failed: {e!r}")    # recorded sections
    print(json.dumps(out), flush=True)


def _engine_bench(out, cfg, rng, C, H, W):
    import jax
    import jax.numpy as jnp
    from coslam_tpu.slam.pipeline import CoSlamEngine

    if _left() < 120:
        _note("engine section skipped (budget)")
        return
    F = 92      # 32 warm + 60 timed (a whole number of chunk=6 calls)
    Kb = np.broadcast_to(
        np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
                 np.float32), (C, 3, 3)).copy()
    cache = f"/tmp/coslam_bench_frames_{C}x{H}x{W}_{F}.npy"
    if os.path.exists(cache):
        frames = np.load(cache)
        _note("frames loaded from cache")
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
        frames = np.clip(frames, 0, 255).astype(np.uint8)  # video-like
        np.save(cache, frames)
        _note("frames rendered")
    if _left() < 90:
        _note("engine run skipped (budget)")
        return

    def run(overlap=False, chunk=1, resident=False):
        """Process frames; returns steady-state fps (warm frames excluded)
        or None if the budget ran out mid-warm.

        ``resident`` pre-stages the frames in device HBM — the production
        feeding model (a co-located decode host delivers frames over PCIe
        at GB/s). The axon tunnel in this environment uploads at ~9 MB/s
        with ~90 ms RTT, so HOST-fed numbers here measure the tunnel, not
        the engine: 3x640x480 uint8 = 921 KB/frame = ~10 f/s upload
        ceiling regardless of engine design."""
        eng = CoSlamEngine(cfg, Kb, np.zeros((C, 5), np.float32),
                           overlap=overlap, chunk=chunk)
        feed = frames
        if resident:
            feed = [jax.device_put(jnp.asarray(frames[f]))
                    for f in range(F)]
            _ = np.asarray(feed[-1][0, 0, 0])    # staging complete
        warm = 32                     # bootstrap + first keyframes/BA (+
        for f in range(warm):         # chunk graphs: kf cadence ~3 frames,
            eng.process_frame(feed[f])     # BA by frame ~15)
            if _left() < 30:
                _note("engine warm aborted (budget)")
                return None
        # pre-warm the every-50th-frame duplicate-unification graph: its
        # one-time compile (~2-3 s) otherwise lands inside the timed
        # window while its steady compute is ~40 ms (amortized <1 ms/f)
        from coslam_tpu.slam.merge import fuse_close_points
        fuse_close_points(eng.state, cfg)
        t0 = time.perf_counter()
        done = warm
        for f in range(warm, F):
            eng.process_frame(feed[f])
            done = f + 1
            if _left() < 15 and done - warm >= 10:
                break
        dt = time.perf_counter() - t0
        # frames still sitting in the chunk buffer were fed but not
        # processed inside the timed window — don't count them
        done -= len(eng._chunk_buf)
        if chunk > 1:
            # flush OUTSIDE the timed window: the partial-tail flush runs
            # the single-frame graph, whose one-time compile would
            # otherwise pollute a 30-frame steady-state measurement
            eng._flush_chunk()
        return (done - warm) / dt

    # PRIMARY engine metric: chunked driving with device-resident frames
    # (the production configuration accuracy_bench.py also runs)
    fps_res = run(chunk=6, resident=True)
    if fps_res is not None:
        out["engine_resident_frames_per_s"] = round(fps_res, 2)
        out["engine_resident_vs_baseline"] = round(fps_res / 15.0, 2)
        print(json.dumps(out), flush=True)
        _note(f"engine resident chunk=6: {fps_res:.2f} f/s")
    if _left() > 120:
        # chunk overlap: chunk k-1's stats consumed while chunk k
        # computes — the boundary round trip hides behind device compute
        fps_ov = run(chunk=6, overlap=True, resident=True)
        if fps_ov is not None:
            out["engine_chunk_overlap_frames_per_s"] = round(fps_ov, 2)
            out["engine_chunk_overlap_vs_baseline"] = round(fps_ov / 15.0, 2)
            print(json.dumps(out), flush=True)
            _note(f"engine resident chunk=6 overlap: {fps_ov:.2f} f/s")
    if _left() > 120:
        # LINK measurement, not an engine metric: frames fed from host
        # over the axon tunnel (~9 MB/s upload, ~90 ms RTT — 921 KB/frame
        # caps ANY host-fed loop near 10 f/s on this link regardless of
        # engine design). The production feeding model is a co-located
        # decode host (PCIe moves a frame in ~0.1 ms, making this number
        # equal the resident one); reported separately so the engine
        # metrics above stay feed-independent.
        fps = run()
        if fps is not None:
            out["tunnel_fed_frames_per_s"] = round(fps, 2)
            out["tunnel_feed_note"] = (
                "host->device link measurement over the axon tunnel "
                "(~9 MB/s upload, ~90 ms RTT); with a co-located decode "
                "host (PCIe) this equals engine_resident_frames_per_s")
            print(json.dumps(out), flush=True)
            _note(f"tunnel-fed link measurement: {fps:.2f} f/s")
    if _left() > 60:
        # overlapped-stats mode: the per-frame stats readback rides behind
        # the next frame's compute (compiles already cached)
        fps2 = run(overlap=True)
        if fps2 is not None:
            out["tunnel_fed_overlap_frames_per_s"] = round(fps2, 2)
            _note(f"tunnel-fed overlap link measurement: {fps2:.2f} f/s")


if __name__ == "__main__":
    main()
