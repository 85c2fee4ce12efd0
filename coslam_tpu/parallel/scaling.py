"""Scaling measurement + HLO collective audit for the camera-sharded step.

Two tools toward the BASELINE multi-host target (>=70% frames/s scaling
efficiency at 2 hosts) that run TODAY without multi-host hardware:

  - ``step_scaling``: wall-clock of the camera-sharded fused step on
    1/2/4/8-device sub-meshes (virtual CPU devices or real chips). On a
    virtual CPU mesh the absolute numbers are meaningless, but a sharded
    step that SERIALIZES (t_n >> t_1) is visible immediately — the
    failure mode this harness exists to catch. On real multi-chip
    hardware the same harness produces the efficiency number.
  - ``audit_tracking_collectives``: compiles the camera-parallel stages
    (advance_tracks, pose_update) under GSPMD on the mesh and scans the
    optimized HLO for collective ops. Tracking and per-camera pose are
    embarrassingly camera-parallel — ANY cross-device collective there
    is an unintended sharding leak (a replicated reduction smuggled into
    the per-camera path).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coslam_tpu.config import SlamConfig, KLTConfig, CapacityConfig
from coslam_tpu.slam.state import init_state
from coslam_tpu.slam.fused import frame_step
from coslam_tpu.slam import steps
from coslam_tpu.ops import build_pyramid, detect_corners
from coslam_tpu.parallel.mesh import shard_state

COLLECTIVE_HLO_OPS = ("all-reduce", "all-gather", "all-to-all",
                      "collective-permute", "reduce-scatter",
                      "collective-broadcast", "ragged-all-to-all")


def collective_census(txt: str) -> dict[str, int]:
    """Count actual collective op APPLICATIONS in optimized HLO text
    (``name = type collective-op(...)`` sites; plain substring counts
    over-count metadata back-references ~20x)."""
    return {op: txt.count(f" {op}(") for op in COLLECTIVE_HLO_OPS}


def _setup(cfg, mesh, rng):
    """Sharded (state, pyr_prev, imgs_cur, K, kc) on ``mesh``."""
    from coslam_tpu.ops.image import gaussian_blur
    C, h, w = cfg.num_cameras, cfg.image_height, cfg.image_width
    cam_sh = NamedSharding(mesh, P("cam"))
    imgs = gaussian_blur(jnp.asarray(
        rng.uniform(0, 255, (C, h, w)), jnp.float32))
    imgs_prev = jax.device_put(imgs, cam_sh)
    imgs_cur = jax.device_put(jnp.roll(imgs, 1, axis=-1), cam_sh)
    rep_sh = NamedSharding(mesh, P())
    K = jax.device_put(jnp.asarray(np.broadcast_to(
        np.array([[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1]],
                 dtype=np.float32), (C, 3, 3))), rep_sh)
    kc = jax.device_put(jnp.zeros((C, 5), jnp.float32), rep_sh)
    state = shard_state(init_state(cfg), mesh)
    pyr0 = build_pyramid(imgs_prev, cfg.klt.n_levels)
    det = detect_corners(pyr0.imgs[0], pyr0.dxs[0], pyr0.dys[0], cfg.klt,
                         cfg.cap.max_features)
    tracks = steps.seed_tracks(state.tracks, det.pos, det.valid,
                               jnp.full(det.valid.shape, -1, jnp.int32),
                               K, kc, state.frame)
    return state._replace(tracks=tracks), pyr0, imgs_cur, K, kc


def _mesh_cfg(n_cams, h, w, feats):
    return SlamConfig(
        num_cameras=n_cams, image_height=h, image_width=w,
        klt=KLTConfig(n_levels=3, min_cornerness=10.0),
        cap=CapacityConfig(max_features=feats, max_map_points=1024,
                           max_keyframes=8, ba_window=4))


def step_scaling(device_counts=(1, 2, 4, 8), n_cams=8, h=96, w=128,
                 feats=128, iters=10, verbose=False) -> list[dict]:
    """Time the fused step with ``n_cams`` cameras sharded over sub-meshes
    of different sizes (strong scaling). Returns one row per mesh size:
    {n_devices, step_ms, speedup_vs_1, efficiency}."""
    devs = jax.devices()
    assert len(devs) >= max(device_counts)
    cfg = _mesh_cfg(n_cams, h, w, feats)
    rng = np.random.default_rng(0)
    rows = []
    t1 = None
    for nd in device_counts:
        assert n_cams % nd == 0, "cameras must divide the mesh"
        mesh = Mesh(np.array(devs[:nd]), ("cam",))
        state, pyr, imgs_cur, K, kc = _setup(cfg, mesh, rng)
        state, pyr, stats = frame_step(state, pyr, imgs_cur, K, kc, cfg,
                                       mesh=mesh)
        _ = np.asarray(stats.n_tracked)          # compile + honest sync
        t0 = time.perf_counter()
        for _ in range(iters):
            state, pyr, stats = frame_step(state, pyr, imgs_cur, K, kc, cfg,
                                           mesh=mesh)
        _ = np.asarray(state.frame)
        ms = (time.perf_counter() - t0) / iters * 1e3
        if t1 is None:
            # reference time: the nd==1 row when measured, else the
            # smallest mesh scaled to its per-device-count equivalent so
            # speedup_vs_1/efficiency stay meaningful for custom
            # device_counts tuples that skip 1
            t1 = ms * nd
        rows.append({
            "n_devices": nd,
            "step_ms": round(ms, 3),
            "speedup_vs_1": round(t1 / ms, 3),
            "efficiency": round(t1 / ms / nd, 3),
        })
        if verbose:
            print(f"[scaling] {nd} devices: {ms:.2f} ms/step "
                  f"(speedup {t1 / ms:.2f}x, eff {t1 / ms / nd:.2f})",
                  flush=True)
    return rows


def audit_step_collectives(n_devices=8, h=96, w=128,
                           feats=128) -> dict[str, int]:
    """Compile the FULL fused step in mesh mode on an ``n_devices``-mesh
    and census the collectives in its optimized HLO. The contract of the
    shard-pixels/replicate-points design: exactly one small all-gather
    per track-table leaf + NCC-block pair at the per-camera kernel
    boundary (~13 ops), and NO all-reduce / permute / all-to-all
    anywhere — every other stage is replicated-local."""
    devs = jax.devices()
    cfg = _mesh_cfg(n_devices, h, w, feats)
    mesh = Mesh(np.array(devs[:n_devices]), ("cam",))
    rng = np.random.default_rng(0)
    state, pyr_prev, imgs_cur, K, kc = _setup(cfg, mesh, rng)
    txt = frame_step.lower(state, pyr_prev, imgs_cur, K, kc, cfg,
                           mesh=mesh).compile().as_text()
    return collective_census(txt)
