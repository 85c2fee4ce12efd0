"""Production-scale accuracy benchmark -> ACCURACY.md.

Long synthetic sequences at the BASELINE configs' production shapes
(640x480, hundreds of frames), matching the reference's evaluation setup
(README.md:126-180: export + sample sequences; the sequences themselves
are not vendored, so the scenes here are rendered with the same
characteristics: textured room, forward+yaw trajectories, moving objects,
camera separations, radial distortion).

Usage:
    python examples/accuracy_bench.py [config ...] [--frames N] [--small]

Configs: mono, twocam, threecam_dyn, splitmerge, distorted (default all).
Writes/updates ACCURACY.md at the repo root with one row per run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("COSLAM_CPU_MESH"):
    # virtual-device mesh runs (fivecam_mesh): force the CPU backend
    # BEFORE first jax use — the JAX_PLATFORMS env var is ignored when
    # the axon TPU plugin is present, the config route is not
    import jax
    jax.config.update("jax_platforms", "cpu")


H, W = 480, 640
K1 = np.array([[500.0, 0, W / 2], [0, 500.0, H / 2], [0, 0, 1]],
              dtype=np.float32)


def _cfg(C):
    from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
    return SlamConfig(
        num_cameras=C, image_height=H, image_width=W,
        klt=KLTConfig(n_levels=4),
        cap=CapacityConfig(max_features=1024, max_map_points=8192,
                           max_keyframes=64, ba_window=5))


def _rig_frames(rng, C, F, baseline=1.0, forward=0.04, quads=None,
                yaw_fn=None, kc=None, hw=None, K=None):
    """Render a C-camera rig sequence. Returns (frames [F,C,H,W],
    Rs_gt [C,F,3,3], ts_gt [C,F,3]).

    Poses are pure-numpy (so3_exp_np); frames come from render_batch in
    chunked whole-batch device calls; the finished sequence is cached on
    disk keyed by a hash of every scene input — a rerun after an
    accuracy-code change pays zero render time."""
    import hashlib
    from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                         render_batch, multi_cam_rig,
                                         apply_distortion_warp)
    from coslam_tpu.geometry.se3 import so3_exp_np
    h_img, w_img = hw or (H, W)
    K = K1 if K is None else K
    Rr, tr = orbit_trajectory(F, forward=forward)
    rot_c, offs_c = multi_cam_rig(C, baseline=baseline)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            if yaw_fn is not None:
                yaw = yaw_fn(c, f)
                if yaw:
                    Rc = so3_exp_np(np.array([0.0, yaw, 0.0])) @ Rc
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(Rs_gt).tobytes())
    h.update(np.ascontiguousarray(ts_gt).tobytes())
    h.update(np.float32(rng.uniform()).tobytes())   # texture stream state
    if quads:
        for q in quads:
            for a in (q.center0, q.velocity, q.eu, q.ev):
                h.update(np.asarray(a, np.float32).tobytes())
    if kc is not None:
        h.update(np.asarray(kc, np.float32).tobytes())
    cache = (f"/tmp/coslam_acc_scene_{h.hexdigest()[:16]}_{F}x{C}"
             f"_{h_img}x{w_img}.npz" if hw else
             f"/tmp/coslam_acc_scene_{h.hexdigest()[:16]}_{F}x{C}.npz")
    if os.path.exists(cache):
        frames = np.load(cache)["frames"].astype(np.float32)
        print(f"  (scene cache hit: {cache})", flush=True)
        return frames, Rs_gt, ts_gt
    planes = make_room(rng, size=10.0)
    Rflat = Rs_gt.transpose(1, 0, 2, 3).reshape(F * C, 3, 3)
    tflat = ts_gt.transpose(1, 0, 2).reshape(F * C, 3)
    fidx = np.repeat(np.arange(F), C)
    frames = render_batch(planes, K, Rflat, tflat, h_img, w_img,
                          quads=quads, frames=fidx,
                          chunk=4 * C).reshape(F, C, h_img, w_img)
    if kc is not None:
        for c in range(C):
            if np.any(kc[c]):
                frames[:, c] = np.asarray(
                    apply_distortion_warp(frames[:, c], K, kc[c]))
    # quantize to f16 BEFORE first use so a cache hit is bit-identical to
    # the run that wrote it (f16 keeps ~0.06 gray-level precision — below
    # video quantization noise)
    frames = frames.astype(np.float16)
    np.savez_compressed(cache, frames=frames)
    return frames.astype(np.float32), Rs_gt, ts_gt


def _run(name, C, frames, Rs_gt, ts_gt, kc=None, cfg_mut=None,
         mesh=None, K=None, eval_from=0):
    import jax
    import jax.numpy as jnp
    from coslam_tpu.slam.pipeline import CoSlamEngine
    from coslam_tpu.io.ate import ate_rmse
    cfg = _cfg(C)
    if cfg_mut is not None:
        cfg = cfg_mut(cfg)
    K = np.stack([K1 if K is None else K] * C)
    kc = np.zeros((C, 5), np.float32) if kc is None else kc
    # production engine configuration: chunked device driving (one round
    # trip per 6 frames; the same mode bench.py measures as the resident
    # engine metric), frames staged in device HBM as f16 (the co-located
    # decode-host feeding model; over the axon tunnel host-fed f32 frames
    # are LINK-bound at ~2 f/s, which measures the tunnel, not the
    # engine). fps below is the engine number over pre-staged frames.
    eng = CoSlamEngine(cfg, K, kc, chunk=6, mesh=mesh)
    F = frames.shape[0]
    stage = jax.device_put(jnp.asarray(frames, jnp.float16))
    _ = np.asarray(stage[0, 0, 0, 0])          # staging complete
    # slice frames out with a dynamic index: `stage[f]` with a concrete
    # Python index compiles a NEW slice executable per frame index —
    # ~0.4 s x F of hidden compile time over the tunneled backend (the
    # bulk of the old accuracy-run fps gap vs the bench resident number)
    from jax import lax as _lax
    _slice = jax.jit(lambda a, i: _lax.dynamic_index_in_dim(
        a, i, 0, keepdims=False))
    t0 = time.perf_counter()
    for f in range(F):
        eng.process_frame(_slice(stage, f))
        if f % 100 == 0:
            print(f"  [{name}] frame {f}/{F}", flush=True)
    eng._flush_chunk()
    dt = time.perf_counter() - t0
    ates = []
    for c in range(C):
        Rs, ts = eng.trajectory(c, correct=True, chain_scales=True)
        # eval_from > 0: score only the tail (configs with a designed
        # information blackout — the blind stretch has no ground truth
        # the estimator could possibly match)
        ates.append(ate_rmse(Rs[eval_from:], ts[eval_from:],
                             Rs_gt[c, eval_from:], ts_gt[c, eval_from:]))
    # path length of camera 0 (for a scale-free drift percentage)
    ctr = -np.einsum("fji,fj->fi", Rs_gt[0], ts_gt[0])
    path = float(np.linalg.norm(np.diff(ctr, axis=0), axis=1).sum())
    row = {
        "config": name, "cams": C, "frames": F,
        "shape": f"{frames.shape[3]}x{frames.shape[2]}",
        "ate": [round(float(a), 4) for a in ates],
        "ate_max": round(float(max(ates)), 4),
        "ate_pct_path": round(100 * float(max(ates)) / max(path, 1e-6), 2),
        "path_len": round(path, 2),
        "fps": round(F / dt, 2),
        "n_merges": len(eng.merge_log),
        "merges_noop": [bool(m.get("noop", False)) for m in eng.merge_log],
        "n_loops": len(eng.loop_log),
        "n_keyframes": len(eng.kf_frames),
    }
    if eval_from:
        row["eval_from"] = eval_from
    print(f"  [{name}] ATE={row['ate']} ({row['ate_pct_path']}% of "
          f"{path:.1f}u path) fps={row['fps']}", flush=True)
    # engine wall-clock breakdown (the 58-vs-1.5 f/s reconciliation
    # evidence): where the long-horizon run actually spends its time
    tt = sorted(eng.timing.items(), key=lambda kv: -kv[1])
    tot = sum(eng.timing.values())
    print(f"  [{name}] timing total {tot:.1f}s over {dt:.1f}s wall: "
          + " ".join(f"{k}={v:.1f}" for k, v in tt[:12]), flush=True)
    # group split/merge evidence: print every group-id transition
    trans = []
    for i in range(1, len(eng.group_hist)):
        if eng.group_hist[i] != eng.group_hist[i - 1]:
            trans.append((i, eng.group_hist[i]))
    if trans or eng.merge_log or eng.loop_log:
        print(f"  [{name}] group transitions={trans} "
              f"merges={eng.merge_log} loops={eng.loop_log}", flush=True)
    return row


def config_mono(F, rng):
    frames, Rs, ts = _rig_frames(rng, 1, F, forward=0.04)
    return _run("mono", 1, frames, Rs, ts)


def config_twocam(F, rng):
    frames, Rs, ts = _rig_frames(rng, 2, F, baseline=1.0, forward=0.04)
    return _run("twocam", 2, frames, Rs, ts)


def config_threecam_dyn(F, rng):
    from coslam_tpu.io.synthetic import MovingQuad, make_texture
    quad = MovingQuad(
        center0=np.array([-3.0, 0.5, 14.0], np.float32),
        velocity=np.array([0.012, 0.0, 0.0], np.float32),
        eu=np.array([1.6, 0, 0], np.float32),
        ev=np.array([0, 1.6, 0], np.float32),
        tex=make_texture(rng))
    frames, Rs, ts = _rig_frames(rng, 3, F, baseline=1.0, forward=0.04,
                                 quads=[quad])
    return _run("threecam_dyn", 3, frames, Rs, ts)


def config_mono_loop(F, rng):
    """Monocular revisit: map the back wall with a lateral sweep, yaw
    away ~69 deg past the dormancy age, return and dwell — the loop
    closure must re-acquire the dormant wall map (the production-scale
    version of tests/test_loop_closure.py's scenario; default closure
    thresholds, no tuning)."""
    from coslam_tpu.geometry.se3 import so3_exp_np
    from coslam_tpu.io.synthetic import make_room, render_batch
    f_map, f_out, f_back = int(F * 0.15), int(F * 0.30), int(F * 0.82)
    f_home = int(F * 0.92)
    yaws = np.concatenate([
        np.zeros(f_map),                                   # map the wall
        np.linspace(0, 1.2, f_out - f_map),                # yaw away
        np.full(f_back - f_out, 1.2),                      # dwell away
        np.linspace(1.2, 0.0, f_home - f_back),            # yaw back
        np.zeros(F - f_home),                              # revisit dwell
    ])[:F]
    Rs_gt = np.zeros((1, F, 3, 3), np.float32)
    ts_gt = np.zeros((1, F, 3), np.float32)
    for f in range(F):
        R = so3_exp_np(np.array([0.0, yaws[f], 0.0]))
        c = np.array([0.9 * np.sin(0.06 * f), 0.05 * np.sin(0.1 * f),
                      0.002 * f], dtype=np.float32)
        Rs_gt[0, f] = R
        ts_gt[0, f] = (-R @ c).astype(np.float32)
    import hashlib
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(Rs_gt).tobytes())
    h.update(np.ascontiguousarray(ts_gt).tobytes())
    h.update(np.float32(rng.uniform()).tobytes())
    cache = f"/tmp/coslam_acc_scene_{h.hexdigest()[:16]}_{F}x1.npz"
    if os.path.exists(cache):
        frames = np.load(cache)["frames"].astype(np.float32)[:, None]
        print(f"  (scene cache hit: {cache})", flush=True)
    else:
        planes = make_room(rng, size=10.0)
        frames = render_batch(planes, K1, Rs_gt[0], ts_gt[0], H, W,
                              chunk=8).astype(np.float16)
        np.savez_compressed(cache, frames=frames)
        frames = frames.astype(np.float32)[:, None]
    row = _run("mono_loop", 1, frames, Rs_gt, ts_gt)
    # loop-disabled control: same sequence, closure attempts gated off —
    # quantifies what the Sim(3) loop correction buys at production scale
    import dataclasses
    ctrl = _run("mono_loop_ctrl", 1, frames, Rs_gt, ts_gt,
                cfg_mut=lambda c: dataclasses.replace(
                    c, p=dataclasses.replace(c.p,
                                             loop_min_interval=10 ** 9)))
    row["ate_noloop_control"] = ctrl["ate_max"]
    return row


def config_occlusion(F, rng):
    """Camera blackout + recovery (the paper's blocked-camera scenario):
    camera 1's lens is covered (noise frames) for ~20% of the run while
    the rig keeps moving. Tracking dies, the pose carries, the group
    splits; on uncover, camera 1 restarts from a pose several units
    stale — the merge bridge must REALIGN it onto the anchor map (a
    guaranteed non-noop Sim(3) correction, the full
    SL_MergeCameraGroup.cpp:56-1183 realignment role). ATE is scored
    from 20 frames after uncover (the blind stretch carries no
    information any estimator could use)."""
    frames, Rs, ts = _rig_frames(rng, 2, F, baseline=1.0, forward=0.04)
    f0, f1 = int(F * 0.25), int(F * 0.45)
    frames = frames.copy()
    frames[f0:f1, 1] = rng.uniform(
        0, 30, frames[f0:f1, 1].shape).astype(np.float32)
    return _run("occlusion", 2, frames, Rs, ts, eval_from=f1 + 20)


def config_fivecam_mesh(F, rng):
    """BASELINE config 5 (five cameras, multi-host) end to end: the FULL
    engine on a 5-device camera mesh — fused step sharded
    one-camera-per-device via shard_map, cadence under GSPMD. Without
    multi-chip hardware this runs on the virtual CPU mesh
    (xla_force_host_platform_device_count), so the shape is reduced
    (320x240) to keep CPU wall-clock sane and fps is NOT a TPU number;
    the ATE + the step_scaling rows (same harness that will produce the
    real efficiency number on hardware) are the evidence. Run with:

        XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        COSLAM_CPU_MESH=1 python examples/accuracy_bench.py fivecam_mesh
    """
    import dataclasses
    import jax
    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 5:
        raise SystemExit(
            "fivecam_mesh needs >=5 devices; set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
            "COSLAM_CPU_MESH=1 (or run on real multi-chip hardware)")
    h2, w2 = 240, 320
    K2 = np.array([[250.0, 0, w2 / 2], [0, 250.0, h2 / 2], [0, 0, 1]],
                  dtype=np.float32)
    frames, Rs, ts = _rig_frames(rng, 5, F, baseline=0.8, forward=0.04,
                                 hw=(h2, w2), K=K2)
    mesh = Mesh(np.array(devs[:5]), ("cam",))
    row = _run("fivecam_mesh", 5, frames, Rs, ts, K=K2, mesh=mesh,
               cfg_mut=lambda c: dataclasses.replace(
                   c, image_height=h2, image_width=w2))
    # scaling-efficiency rows from the same session (the sub-mesh harness
    # BASELINE's >=70%-at-2-hosts target reads from on real hardware)
    from coslam_tpu.parallel.scaling import step_scaling
    row["step_scaling"] = step_scaling(device_counts=(1, 2, 4),
                                       n_cams=8, h=h2, w=w2, iters=4)
    return row


def config_splitmerge(F, rng):
    sep0, sep1 = int(F * 0.2), int(F * 0.4)
    ret0, ret1 = int(F * 0.55), int(F * 0.75)
    # 1.2 rad (69 deg) exceeds the 65-deg horizontal FOV at 640x480
    # (fx=500): the views genuinely stop overlapping, so the grouping
    # split + the full merge machinery actually fire at production shape
    # (0.9 rad left ~21% hull coverage — just above the 0.2 split
    # threshold, so the scenario never exercised SL_MergeCameraGroup's
    # role)
    max_yaw = 1.2

    def yaw_fn(c, f):
        if c != 1:
            return 0.0
        if f < sep0:
            return 0.0
        if f < sep1:
            return max_yaw * (f - sep0) / (sep1 - sep0)
        if f < ret0:
            return max_yaw
        if f < ret1:
            return max_yaw * (ret1 - f) / (ret1 - ret0)
        return 0.0

    frames, Rs, ts = _rig_frames(rng, 2, F, baseline=1.0, forward=0.02,
                                 yaw_fn=yaw_fn)
    return _run("splitmerge", 2, frames, Rs, ts)


def config_distorted(F, rng):
    kc = np.zeros((3, 5), np.float32)
    kc[:, 0] = -0.25           # k1 radial (typical webcam barrel)
    kc[:, 1] = 0.08            # k2
    frames, Rs, ts = _rig_frames(rng, 3, F, baseline=1.0, forward=0.04,
                                 kc=kc)
    return _run("distorted", 3, frames, Rs, ts, kc=kc)


CONFIGS = {
    "mono": config_mono,
    "twocam": config_twocam,
    "threecam_dyn": config_threecam_dyn,
    "splitmerge": config_splitmerge,
    "distorted": config_distorted,
    "mono_loop": config_mono_loop,
    "occlusion": config_occlusion,
    "fivecam_mesh": config_fivecam_mesh,
}
DEFAULT_FRAMES = {"mono": 500, "twocam": 500, "threecam_dyn": 500,
                  "splitmerge": 400, "distorted": 300, "mono_loop": 400,
                  "occlusion": 300, "fivecam_mesh": 150}


def write_accuracy_md(rows):
    import jax
    path = os.path.join(os.path.dirname(__file__), "..", "ACCURACY.md")
    dev = jax.devices()[0].platform
    lines = [
        "# ACCURACY — production-scale synthetic benchmarks",
        "",
        "Long sequences at production shape (640x480, 1024 features/cam),",
        "rendered scenes matching the BASELINE configs (room + forward/yaw",
        "trajectory; dynamic quad for config 3; separation/rejoin for",
        "config 4; radial distortion for the distorted variant). ATE is",
        "Sim(3)-aligned RMSE of camera centers over ALL frames (the",
        "exported, chain-corrected trajectory — the same surface the",
        "reference exports, SL_CoSLAM.cpp:1914-2031). Room size = 10",
        "units; ATE% is relative to the camera-0 path length.",
        "",
        f"Last run: {time.strftime('%Y-%m-%d %H:%M')} on `{dev}`.",
        "",
        "| config | cams | frames | ATE per cam | max ATE | % of path |"
        " path | fps (e2e) | merges | loops | keyframes |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['config']} | {r['cams']} | {r['frames']} | "
            f"{r['ate']} | {r['ate_max']} | {r['ate_pct_path']}% | "
            f"{r['path_len']} | {r['fps']} | {r['n_merges']} | "
            f"{r['n_loops']} | {r['n_keyframes']} |")
    lines += [
        "",
        "Reproduce: `python examples/accuracy_bench.py [config ...]`.",
        "Raw rows in `ACCURACY.json`.",
        "",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines))
    with open(path.replace(".md", ".json"), "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


def main():
    import jax
    # persistent compile cache: the first accuracy run pays each graph's
    # compile ONCE per machine; later runs (and the other configs'
    # shared-shape graphs) load from disk instead of recompiling over the
    # tunnel
    jax.config.update("jax_compilation_cache_dir", "/tmp/coslam_jax_cache")
    # 0.1 s threshold: the merge/loop cadences run ~100 EAGER ops whose
    # individual compiles are under a second but aggregate to minutes per
    # fresh process over the tunneled backend — persist them too
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    ap = argparse.ArgumentParser()
    ap.add_argument("configs", nargs="*", default=[])
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--small", action="store_true",
                    help="short sanity run (60 frames)")
    args = ap.parse_args()
    # fivecam_mesh needs a multi-device mesh (COSLAM_CPU_MESH=1 or real
    # hardware) — run it explicitly, not as part of the default sweep
    names = args.configs or [n for n in CONFIGS if n != "fivecam_mesh"]
    path = os.path.join(os.path.dirname(__file__), "..", "ACCURACY.json")

    def merged(rows):
        """New rows merged over any existing ACCURACY.json rows."""
        old = {}
        if os.path.exists(path):
            old = {r["config"]: r for r in json.load(open(path))}
        for r in rows:
            old[r["config"]] = r
        return [old[k] for k in CONFIGS if k in old]

    rows = []
    for name in names:
        F = args.frames or (60 if args.small else DEFAULT_FRAMES[name])
        rng = np.random.default_rng(7)
        print(f"== {name} ({F} frames)", flush=True)
        rows.append(CONFIGS[name](F, rng))
        if not args.small:
            # write after EVERY config: an interrupted run still leaves
            # committed evidence for the completed configs
            write_accuracy_md(merged(rows))
    if args.small:
        print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
