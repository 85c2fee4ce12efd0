"""Fused per-frame device step: the whole tracked-frame hot path as ONE
jitted call.

SURVEY.md §7 hard part #5: "keeping the per-frame step to one pjit-ed call
is the performance crux". The reference crosses the GPU/CPU boundary many
times per frame (shader passes + glReadPixels readbacks inside every
featureTracking call, SURVEY.md §3.3); here pyramid building, KLT,
redetection, pose IRLS, gating, sequential refinement, new-point
triangulation and history bookkeeping all fuse into a single XLA program
over the camera batch — the host only feeds frames and reads tiny stats.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.ops import build_pyramid
from coslam_tpu.slam import steps
from coslam_tpu.slam.state import SlamState


class FrameStats(NamedTuple):
    n_inliers: jnp.ndarray   # [C]
    coverage: jnp.ndarray    # [C]
    med_depth: jnp.ndarray   # [C]
    med_err: jnp.ndarray     # [C]
    n_new_points: jnp.ndarray
    n_tracked: jnp.ndarray   # [C]
    n_static: jnp.ndarray    # scalar (0 for mono: classify is multicam)
    n_dynamic: jnp.ndarray   # scalar
    n_mapped: jnp.ndarray    # [C] tracked features bound to map points
                             # (drives the n_max_map_pts mapping trigger)
    R: jnp.ndarray           # [C, 3, 3] post-step poses: shipping them in
    t: jnp.ndarray           # [C, 3]    the stats transfer saves the
                             # per-frame pose readback (a full tunnel RTT)
    dyn_ids: jnp.ndarray     # [D] map slots of alive dynamic points (-1 =
                             # none) — the per-frame dynamic snapshot
    dyn_xyz: jnp.ndarray     # [D, 3] their positions (storeDynamicPoints,
                             # SL_CoSLAM.cpp:1900-1911, rides the stats
                             # transfer instead of 3 host pulls per frame)


@partial(jax.jit, static_argnames=("cfg", "mesh"),
         donate_argnums=(0, 1))
def frame_step(state: SlamState, pyr_prev, imgs_cur: jnp.ndarray,
               K: jnp.ndarray, kc: jnp.ndarray, cfg: SlamConfig,
               mesh=None, large_err=False):
    """One tracked frame: track -> pose -> refine -> map. Returns
    (state', pyr_cur, FrameStats). The previous frame's pyramid is carried
    between calls (building it once per frame, not twice).

    ``mesh``: a camera-axis jax Mesh for multi-chip runs. The SPMD layout
    is "shard pixels, replicate points": pyramids/KLT windows/corner maps
    (the HBM-heavy work) are sharded one-camera-per-device, while the
    small track/point tables are replicated and all cross-camera stages
    (pose gating writes, classification, mapping) compute replicated —
    the camera results cross the boundary ONCE per frame (a few hundred
    KB all-gather over ICI) instead of GSPMD inserting per-index
    collectives into every unrolled per-camera loop (measured ~2000
    collectives/step without the constraints)."""
    if imgs_cur.dtype != jnp.float32:     # uint8 frames upload 4x smaller
        imgs_cur = imgs_cur.astype(jnp.float32)
    img_hw = (imgs_cur.shape[1], imgs_cur.shape[2])
    ncc_blocks = None
    if mesh is None:
        pyr_cur = build_pyramid(imgs_cur, cfg.klt.n_levels)
        tracks = steps.advance_tracks(pyr_prev, pyr_cur, state.tracks, K,
                                      kc, state.frame + 1, cfg)
    else:
        # explicit SPMD for the pixel-touching work: pyramid + KLT +
        # corner redetect + NCC extraction run inside shard_map, one
        # camera block per device (all camera-local), and ONLY the
        # finished [C, N, *] table crosses to replicated — a few hundred
        # KB all-gathered once per frame over ICI. (Leaving this to
        # GSPMD propagation instead inserts ~900-2000 small collectives
        # per step: every scalar camera index into a sharded axis
        # becomes its own permute/gather.)
        from jax import shard_map
        from jax.sharding import NamedSharding, PartitionSpec as P
        from coslam_tpu.ops.ncc import extract_ncc_blocks_batched
        cam, rep = P("cam"), P()

        def kernel(imgs_l, pyr_prev_l, tracks_l, K_l, kc_l, frame_l):
            pyr_l = build_pyramid(imgs_l, cfg.klt.n_levels)
            tr_l = steps.advance_tracks(pyr_prev_l, pyr_l, tracks_l, K_l,
                                        kc_l, frame_l, cfg)
            blk_l, ok_l = extract_ncc_blocks_batched(
                pyr_l.imgs[0], tr_l.raw, cfg.p.ncc_patch_radius)
            return pyr_l, tr_l, blk_l, ok_l

        pyr_spec = jax.tree.map(lambda _: cam, pyr_prev)
        tr_spec = jax.tree.map(lambda _: cam, state.tracks)
        pyr_cur, tracks, blk, blk_ok = shard_map(
            kernel, mesh=mesh,
            in_specs=(cam, pyr_spec, tr_spec, cam, cam, rep),
            out_specs=(pyr_spec, tr_spec, cam, cam),
            check_vma=False,
        )(imgs_cur, pyr_prev, state.tracks, K, kc, state.frame + 1)
        rep_sh = NamedSharding(mesh, rep)
        con = jax.lax.with_sharding_constraint
        tracks = jax.tree.map(lambda a: con(a, rep_sh), tracks)
        ncc_blocks = (con(blk, rep_sh), con(blk_ok, rep_sh))
    state = state._replace(tracks=tracks, frame=state.frame + 1)
    # large_err: post-merge/loop settle window — the realigned poses meet
    # widened Mahalanobis gates so inliers are not shed exactly when
    # support is scarcest (the reference's largeErr frames,
    # SL_CoSLAM.cpp:371-374,407)
    out = steps.pose_update(state, K, kc, img_hw, cfg,
                            large_err=large_err)
    state = state._replace(R=out.R, t=out.t, tracks=out.tracks,
                           mappts=out.mappts)
    state = steps.push_pose_history(state)
    if cfg.num_cameras > 1:
        # the multi-camera per-frame stages fuse in too (dynamic-feature
        # voting + whole-map classification)
        from coslam_tpu.slam.classify import (detect_dynamic_features,
                                              classify_map_points)
        state = detect_dynamic_features(state, K, cfg)
        cls = classify_map_points(state, K, cfg)
        state = state._replace(mappts=cls.mappts, tracks=cls.tracks)
        n_static, n_dynamic = cls.n_static, cls.n_dynamic
    else:
        n_static = jnp.zeros((), jnp.int32)
        n_dynamic = jnp.zeros((), jnp.int32)
    mappts, tracks2, n_new = steps.new_map_points(state, pyr_cur, K, kc,
                                                  cfg, blocks=ncc_blocks)
    mappts = steps.lifecycle_update(mappts, state.frame, cfg)
    state = state._replace(mappts=mappts, tracks=tracks2)
    # dynamic snapshot (up to D slots) for the host-side trajectory log
    from coslam_tpu.slam.state import ST_ALIVE as _ALIVE, \
        PT_DYNAMIC as _DYN
    from coslam_tpu.slam.steps import _rank_to_index
    D = state.kfs.dyn_xyz.shape[1]
    P = mappts.xyz.shape[0]
    dyn = (mappts.status == _ALIVE) & (mappts.ptype == _DYN)
    pt_of_d = _rank_to_index(dyn)[:D]
    dyn_ids = jnp.where(pt_of_d < P, pt_of_d, -1).astype(jnp.int32)
    dyn_xyz = mappts.xyz[jnp.clip(pt_of_d, 0, P - 1)]
    stats = FrameStats(
        n_inliers=out.n_inliers, coverage=out.coverage,
        med_depth=out.med_depth, med_err=out.med_err,
        n_new_points=n_new, n_tracked=jnp.sum(tracks2.valid, axis=1),
        n_static=n_static, n_dynamic=n_dynamic,
        n_mapped=jnp.sum(tracks2.valid & (tracks2.mpt >= 0), axis=1),
        R=state.R, t=state.t, dyn_ids=dyn_ids, dyn_xyz=dyn_xyz)
    return state, pyr_cur, stats


def pack_stats(fs: FrameStats) -> jnp.ndarray:
    """Flatten FrameStats into ONE f32 vector. Over the tunneled TPU each
    array readback costs a round trip regardless of size; 13 small leaves
    cost ~13x one packed transfer."""
    f32 = jnp.float32
    return jnp.concatenate([
        fs.n_inliers.astype(f32), fs.coverage.astype(f32),
        fs.med_depth.astype(f32), fs.med_err.astype(f32),
        fs.n_new_points[None].astype(f32), fs.n_tracked.astype(f32),
        fs.n_static[None].astype(f32), fs.n_dynamic[None].astype(f32),
        fs.n_mapped.astype(f32), fs.R.reshape(-1).astype(f32),
        fs.t.reshape(-1).astype(f32), fs.dyn_ids.astype(f32),
        fs.dyn_xyz.reshape(-1).astype(f32)])


def unpack_stats(v, C: int, D: int) -> FrameStats:
    """Host-side inverse of pack_stats (numpy fields)."""
    import numpy as np
    v = np.asarray(v)
    o = 0

    def take(n, shape=None):
        nonlocal o
        out = v[o:o + n]
        o += n
        return out.reshape(shape) if shape else out

    return FrameStats(
        n_inliers=take(C), coverage=take(C), med_depth=take(C),
        med_err=take(C), n_new_points=take(1)[0], n_tracked=take(C),
        n_static=take(1)[0], n_dynamic=take(1)[0], n_mapped=take(C),
        R=take(9 * C, (C, 3, 3)), t=take(3 * C, (C, 3)),
        dyn_ids=take(D).astype(int), dyn_xyz=take(3 * D, (D, 3)))


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(0, 1))
def frame_step_packed(state: SlamState, pyr_prev, imgs_cur: jnp.ndarray,
                      K: jnp.ndarray, kc: jnp.ndarray, cfg: SlamConfig,
                      mesh=None, large_err=False):
    """frame_step with the stats pre-packed into one transferable vector
    (the engine's production path)."""
    state, pyr_cur, fs = frame_step(state, pyr_prev, imgs_cur, K, kc, cfg,
                                    mesh=mesh, large_err=large_err)
    return state, pyr_cur, pack_stats(fs)


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(0, 1))
def frame_steps_scan(state: SlamState, pyr_prev, imgs_seq: jnp.ndarray,
                     K: jnp.ndarray, kc: jnp.ndarray, cfg: SlamConfig,
                     mesh=None, large_err=False):
    """Process a CHUNK of frames in one device call: lax.scan over
    frame_step. Removes the per-frame dispatch/tunnel overhead entirely —
    the pure device-compute throughput of the tracked-frame core. Host
    cadence (keyframes, BA, merge) does not run inside the chunk; the
    engine (chunk mode) runs it at chunk boundaries on the packed
    per-frame stats rows, and bench uses this directly for the core-scan
    metric.

    imgs_seq: [F, C, H, W]. Returns (state', pyr_last, packed stats
    [F, S] — one pack_stats row per frame)."""
    if imgs_seq.dtype != jnp.float32:
        imgs_seq = imgs_seq.astype(jnp.float32)

    def body(carry, imgs):
        st, pyr = carry
        st, pyr, fs = frame_step(st, pyr, imgs, K, kc, cfg,
                                 mesh=mesh, large_err=large_err)
        return (st, pyr), pack_stats(fs)

    (state, pyr_prev), stats = jax.lax.scan(body, (state, pyr_prev),
                                            imgs_seq)
    return state, pyr_prev, stats


@partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=(0, 1))
def frame_steps_chunk(state: SlamState, pyr_prev, imgs_seq: jnp.ndarray,
                      K: jnp.ndarray, kc: jnp.ndarray, cfg: SlamConfig,
                      mesh=None, large_err=False):
    """frame_steps_scan + the periodic host-decision scan, packed into ONE
    flat transfer vector — the chunked engine's production path. The
    grouping/merge/loop prefilter reductions (host_scan_device) ride the
    same readback as the per-frame stats rows, so a chunk costs exactly
    one device->host round trip regardless of which cadences fire.

    Returns (state', pyr_last, flat [F*S + C*(3C+2)] vector:
    stats rows row-major, then the host-scan block)."""
    from coslam_tpu.slam.grouping import host_scan_device
    state, pyr_prev, stats = frame_steps_scan(state, pyr_prev, imgs_seq,
                                              K, kc, cfg, mesh=mesh,
                                              large_err=large_err)
    scan = host_scan_device(state, K, cfg.image_height, cfg.image_width,
                            cfg.p.loop_dormant_age)
    flat = jnp.concatenate([stats.reshape(-1),
                            scan.reshape(-1).astype(jnp.float32)])
    return state, pyr_prev, flat
