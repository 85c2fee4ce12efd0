"""Static/dynamic/false/uncertain map-point classification and dynamic
feature detection.

Replaces the reference's classification machinery:
  - ``detectDynamicFeaturePoints`` — per-feature epipolar voting over the
    track history (SL_SingleSLAM.cpp:784-823): a feature on a static
    point must satisfy the epipolar constraint against every past pose;
    persistent violations vote the feature dynamic.
  - ``mapPointsClassify`` state machine (SL_CoSLAM.cpp:418-514) built on
    ``isStaticPoint/isDynamicPoint/isStaticRemovable/isLittleMove``
    (SL_CoSLAMHelper.cpp:253-315): multi-view re-triangulation from the
    CURRENT frame only, Mahalanobis gating of every view, and a
    moved-vs-stored test deciding static vs dynamic; persistent
    inconsistency -> false.
  - ``updateDynamicPointPosition`` — dynamic points take the current-frame
    triangulation every frame (the paper's dynamic-point mechanism).

All tests run batched over the whole [P] map and [C, T, N] history —
the reference's per-point loops become masked tensor ops.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry.epipolar import fundamental_from_poses
from coslam_tpu.slam.state import (SlamState, MapPoints, ST_ALIVE, ST_FALSE,
                                   PT_STATIC, PT_DYNAMIC, PT_UNCERTAIN)


def point_obs_table(tracks, P: int):
    """Invert the track->map binding: returns (slot [P, C] feature index or
    -1, obs_px [P, C, 2], obs_ok [P, C]) — the MapPoint::pFeatures view."""
    C, N = tracks.valid.shape
    mapped = tracks.valid & (tracks.mpt >= 0)
    tgt = jnp.where(mapped, tracks.mpt, P)            # P = dropped
    slot = jnp.full((P, C), -1, jnp.int32)
    cam_ids = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
    feat_ids = jnp.broadcast_to(jnp.arange(N)[None, :], (C, N))
    slot = slot.at[tgt, cam_ids].set(feat_ids, mode="drop")
    obs_ok = slot >= 0
    sl = jnp.clip(slot, 0)
    obs_px = tracks.pos[jnp.arange(C)[None, :], sl]       # [P, C, 2]
    return slot, obs_px, obs_ok


@partial(jax.jit, static_argnames=("cfg",))
def detect_dynamic_features(state: SlamState, K: jnp.ndarray,
                            cfg: SlamConfig):
    """Epipolar voting over the rolling history. Returns updated tracks
    (dyn_votes incremented for features violating the static-world
    epipolar constraint against past poses)."""
    tracks = state.tracks
    C, T, N = tracks.hist_valid.shape
    p = cfg.p
    frame = state.frame
    k_off = jnp.arange(T)
    past_frame = frame - k_off
    ring = jnp.mod(past_frame, T)
    hist_pos = jnp.take(tracks.hist, ring, axis=1)        # [C,T,N,2]
    ages = jnp.minimum(tracks.age - 1, T - 1)
    hist_ok = jnp.take(tracks.hist_valid, ring, axis=1) & \
        (k_off[None, :, None] >= 2) & (k_off[None, :, None] <= ages[:, None]) \
        & (past_frame[None, :, None] >= 0)
    Rp = jnp.take(state.pose_hist_R, ring, axis=1)        # [C,T,3,3]
    tp = jnp.take(state.pose_hist_t, ring, axis=1)
    # F from past pose -> current pose, pixel space: [C, T, 3, 3]
    F = fundamental_from_poses(K[:, None], Rp, tp,
                               K[:, None], state.R[:, None],
                               state.t[:, None])
    # epipolar distance of (hist point, current point) under F
    x1 = jnp.concatenate([hist_pos,
                          jnp.ones_like(hist_pos[..., :1])], -1)  # [C,T,N,3]
    x2 = jnp.concatenate([tracks.pos, jnp.ones_like(tracks.pos[..., :1])],
                         -1)                                       # [C,N,3]
    l2 = jnp.einsum("ctij,ctnj->ctni", F, x1)             # lines in current
    num = jnp.abs(jnp.einsum("ctni,cni->ctn", l2, x2))
    den = jnp.maximum(jnp.linalg.norm(l2[..., :2], axis=-1), 1e-9)
    d = num / den                                          # [C,T,N]
    viol = hist_ok & (d > p.max_epi_err)
    n_checks = jnp.sum(hist_ok, axis=1)
    n_viol = jnp.sum(viol, axis=1)
    # a feature is voted dynamic this frame if >=50% of its history checks
    # violate the epipolar constraint (and it has enough history)
    vote = (n_checks >= 3) & (n_viol * 2 > n_checks)
    dyn_votes = jnp.where(tracks.valid,
                          jnp.where(vote, tracks.dyn_votes + 1,
                                    jnp.maximum(tracks.dyn_votes - 1, 0)),
                          0)
    return state._replace(tracks=tracks._replace(dyn_votes=dyn_votes))


class ClassifyOut(NamedTuple):
    mappts: MapPoints
    n_static: jnp.ndarray
    n_dynamic: jnp.ndarray
    n_false: jnp.ndarray
    tracks: object = None   # TrackTable with outlier views detached
                            # (isStaticRemovable), None before classify


def _windowed_static_err(state: SlamState, K: jnp.ndarray,
                         cfg: SlamConfig):
    """The isStaticPoint frame-window test (SL_CoSLAMHelper.cpp:253-315):
    reproject each point's STORED position against its feature's history
    observations at the historic poses, over the last
    ``classify_frame_window`` frames. Offsets within the dense ring use
    every frame; older offsets (up to the full window — the reference's
    numFrame=60 span) come from the every-LONG_STRIDE-frames long ring.
    Returns (n_checks [P], n_consistent [P]).

    Feature-major: the window errors are computed on [T, N] blocks (the
    history's native layout — no N->P gather amplification) and the
    per-feature counts scatter-add onto their bound points."""
    from coslam_tpu.slam.state import LONG_STRIDE
    tracks, mappts = state.tracks, state.mappts
    C, T, N = tracks.hist_valid.shape
    TL = tracks.hist_long_valid.shape[1]
    P = mappts.xyz.shape[0]
    p = cfg.p
    W = p.classify_frame_window
    frame = state.frame
    gate = p.max_epi_err
    # dense ring: offsets 1 .. min(W, T-1)
    k_off = jnp.arange(T)
    past_frame = frame - k_off
    ring = jnp.mod(past_frame, T)
    in_win = (k_off >= 1) & (k_off <= min(W, T - 1))
    # long ring: offsets (T-1, W] at LONG_STRIDE granularity
    m_off = jnp.arange(TL)
    m_cur = frame // LONG_STRIDE
    past_m = m_cur - m_off
    ring_l = jnp.mod(past_m, TL)
    past_frame_l = past_m * LONG_STRIDE
    k_l = frame - past_frame_l
    in_win_l = (k_l > T - 1) & (k_l <= W) & (past_frame_l >= 0)
    n_checks = jnp.zeros((P,), jnp.int32)
    n_cons = jnp.zeros((P,), jnp.int32)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]

    def window_counts(Xs, hpos, hok, Rp, tp, ok, c):
        """ok/good counts [N] of one camera's [T', N] history block
        against the stored positions Xs (3 x [N]).

        Per-frame reliability gate: a historic frame where MOST points'
        checks fail is a glitched/stale historic pose, not evidence of
        motion — a real mover fails only its own checks while the static
        majority passes. The reference never needs this because its BA
        write-back rewrites the per-frame pose list that isStaticPoint
        reprojects with (SL_CoSLAMRobustBA.cpp:230-247); our history
        rings keep the poses as-estimated, so one transient pose glitch
        would otherwise condemn every long-lived point 15 frames later."""
        Xc = [Rp[:, i, 0, None] * Xs[0][None] + Rp[:, i, 1, None] * Xs[1][None]
              + Rp[:, i, 2, None] * Xs[2][None] + tp[:, i, None]
              for i in range(3)]                            # 3 x [T', N]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        du = fx[c] * Xc[0] * zi + cx[c] - hpos[:, :, 0]
        dv = fy[c] * Xc[1] * zi + cy[c] - hpos[:, :, 1]
        e2 = du * du + dv * dv
        good = ok & (z > 1e-3) & (e2 < gate * gate)
        tot_ok = jnp.sum(ok, axis=1, dtype=jnp.int32)       # [T']
        tot_good = jnp.sum(good, axis=1, dtype=jnp.int32)   # [T']
        reliable = (tot_ok < 8) | (2 * tot_good >= tot_ok)
        ok = ok & reliable[:, None]
        good = good & reliable[:, None]
        return (jnp.sum(ok, axis=0, dtype=jnp.int32),
                jnp.sum(good, axis=0, dtype=jnp.int32))

    for c in range(C):
        mi = jnp.clip(tracks.mpt[c], 0)                    # [N]
        bound = tracks.valid[c] & (tracks.mpt[c] >= 0)
        Xf = mappts.xyz[mi]                                # [N, 3]
        Xs = [Xf[:, i] for i in range(3)]
        ages = tracks.age[c] - 1                           # [N]
        hpos = jnp.take(tracks.hist[c], ring, axis=0)      # [T, N, 2]
        hok = jnp.take(tracks.hist_valid[c], ring, axis=0)  # [T, N]
        ok = hok & bound[None, :] & in_win[:, None] & \
            (k_off[:, None] <= ages[None, :]) & (past_frame[:, None] >= 0)
        Rp = jnp.take(state.pose_hist_R[c], ring, axis=0)  # [T, 3, 3]
        tp = jnp.take(state.pose_hist_t[c], ring, axis=0)  # [T, 3]
        nc, ng = window_counts(Xs, hpos, hok, Rp, tp, ok, c)
        if W > T - 1:
            hpos_l = jnp.take(tracks.hist_long[c], ring_l, axis=0)
            hok_l = jnp.take(tracks.hist_long_valid[c], ring_l, axis=0)
            ok_l = hok_l & bound[None, :] & in_win_l[:, None] & \
                (k_l[:, None] <= ages[None, :])
            Rp_l = jnp.take(state.pose_hist_long_R[c], ring_l, axis=0)
            tp_l = jnp.take(state.pose_hist_long_t[c], ring_l, axis=0)
            nc2, ng2 = window_counts(Xs, hpos_l, hok_l, Rp_l, tp_l, ok_l, c)
            nc, ng = nc + nc2, ng + ng2
        tgt = jnp.where(bound, tracks.mpt[c], P)
        n_checks = n_checks.at[tgt].add(nc, mode="drop")
        n_cons = n_cons.at[tgt].add(ng, mode="drop")
    return n_checks, n_cons


@partial(jax.jit, static_argnames=("cfg",))
def classify_map_points(state: SlamState, K: jnp.ndarray,
                        cfg: SlamConfig) -> ClassifyOut:
    """The mapPointsClassify state machine over the whole map.

    Lane-major internals: the [P] point axis sits on the 128-lane
    dimension and every per-view 3x3/2x3 is unrolled as scalars times [P]
    vectors (a [P, C, 2, 4] row layout wastes ~96% of each vector tile;
    this form cut the stage ~4x in the fused step)."""
    from coslam_tpu.geometry.triangulate import (
        triangulate_multiview_ln, inv3x3_sym_ln)
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    P = mappts.xyz.shape[0]
    p = cfg.p
    alive = mappts.status == ST_ALIVE
    slot, obs_px, obs_ok = point_obs_table(tracks, P)
    nv = jnp.sum(obs_ok, axis=1)                           # [P]
    # lane-major views of the observation table
    pxT = obs_px.transpose(1, 2, 0)                        # [C, 2, P]
    okT = obs_ok.T                                         # [C, P]
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    xnT = jnp.stack([(pxT[:, 0] - cx[:, None]) / fx[:, None],
                     (pxT[:, 1] - cy[:, None]) / fy[:, None]], axis=1)
    # current-frame multi-view re-triangulation (isDynamicPoint test)
    X_ln, _ = triangulate_multiview_ln(state.R, state.t, xnT, okT)  # [3, P]
    dt = X_ln.dtype
    Xs_ln = mappts.xyz.T                                    # stored, [3, P]
    max_err = jnp.zeros((P,), dt)
    max_err_stored = jnp.zeros((P,), dt)
    es_all: list = []        # per-view stored-reproj errors (for drop-one)
    depth_ok = jnp.ones((P,), bool)
    Hpx = [[jnp.full((P,), 1e-9 if i == j else 0.0, dt) for j in range(3)]
           for i in range(3)]
    for c in range(C):
        R, t = state.R[c], state.t[c]
        Xc = [R[i, 0] * X_ln[0] + R[i, 1] * X_ln[1] + R[i, 2] * X_ln[2]
              + t[i] for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = fx[c] * Xc[0] * zi + cx[c]
        v = fy[c] * Xc[1] * zi + cy[c]
        e = jnp.hypot(u - pxT[c, 0], v - pxT[c, 1])
        max_err = jnp.maximum(max_err, jnp.where(okT[c], e, 0.0))
        depth_ok = depth_ok & jnp.where(okT[c], z > 1e-3, True)
        # reprojection of the STORED position against the current
        # observations (the isStaticPoint consistency test,
        # SL_CoSLAMHelper.cpp:253-315): a moving point's stored position
        # goes stale in pixels within a few frames — scale-free evidence
        Xcs = [R[i, 0] * Xs_ln[0] + R[i, 1] * Xs_ln[1] + R[i, 2] * Xs_ln[2]
               + t[i] for i in range(3)]
        zs = Xcs[2]
        zsi = 1.0 / jnp.where(jnp.abs(zs) < 1e-9, 1e-9, zs)
        us = fx[c] * Xcs[0] * zsi + cx[c]
        vs = fy[c] * Xcs[1] * zsi + cy[c]
        es = jnp.hypot(us - pxT[c, 0], vs - pxT[c, 1])
        es_all.append(jnp.where(okT[c], es, 0.0))
        max_err_stored = jnp.maximum(max_err_stored,
                                     jnp.where(okT[c], es, 0.0))
        # pixel-space projection Jacobian rows (for the dynamic-point cov):
        # du/dX = fx*(R0 - xn*R2)/z, dv/dX = fy*(R1 - yn*R2)/z
        xz = Xc[0] * zi
        yz = Xc[1] * zi
        Ju = [fx[c] * (R[0, j] - xz * R[2, j]) * zi for j in range(3)]
        Jv = [fy[c] * (R[1, j] - yz * R[2, j]) * zi for j in range(3)]
        w = okT[c].astype(dt)
        for i in range(3):
            for j in range(i + 1):
                Hpx[i][j] = Hpx[i][j] + w * (Ju[i] * Ju[j] + Jv[i] * Jv[j])
    X_cur = X_ln.T                                          # [P, 3]
    tri_ok = (nv >= 2) & depth_ok & (max_err < p.max_err) & \
        jnp.all(jnp.isfinite(X_cur), axis=1)
    is_staticp = mappts.ptype == PT_STATIC
    # N-frame static-consistency window (isStaticPoint over
    # classify_frame_window frames): stored position must keep explaining
    # the feature history; a fraction test so one glitched historic pose
    # doesn't condemn the whole map
    n_chk, n_con = _windowed_static_err(state, K, cfg)
    win_fail = alive & is_staticp & (n_chk >= 4) & \
        (n_con.astype(dt) < 0.75 * n_chk.astype(dt))
    # isStaticRemovable (drop one outlier view): a static point failing
    # the consistency tests with >=3 views may be corrupted by ONE view
    # (occlusion boundary, feature mismatch) — re-triangulate with each
    # view dropped; if the remaining views agree, detach that view and
    # keep the point static (SL_CoSLAMHelper.cpp:253-315)
    # only the WORST stored-reprojection view may be dropped: any two
    # remaining rays triangulate near-perfectly, so "first view whose
    # removal works" would happily detach a good view and keep the bad one
    es_stack = jnp.stack(es_all)                           # [C, P]
    es_masked = jnp.where(okT, es_stack, -jnp.inf)
    worst_view = jnp.argmax(es_masked, axis=0)
    # ...and the rescue only applies to SINGLE-view corruption: the other
    # views must still explain the stored position. A moving object makes
    # every view's stored error large (the stored position is stale for
    # all of them) — rescuing it would eat the moved->dynamic transition.
    es_rest = jnp.where(jnp.arange(C)[:, None] == worst_view[None, :],
                        -jnp.inf, es_masked)
    second_worst = jnp.max(es_rest, axis=0)
    one_view_bad = second_worst < p.max_epi_err
    suspect = alive & is_staticp & (nv >= 3) & (win_fail | ~tri_ok) & \
        one_view_bad
    save_any = jnp.zeros((P,), bool)
    detach_cam = jnp.zeros((P,), jnp.int32)
    X_saved = [jnp.zeros((P,), dt) for _ in range(3)]
    cam_axis = jnp.arange(C)
    for cdrop in range(C):
        okT_wo = okT & (cam_axis != cdrop)[:, None]
        X_wo, _ = triangulate_multiview_ln(state.R, state.t, xnT, okT_wo)
        max_e = jnp.zeros((P,), dt)
        dok = jnp.ones((P,), bool)
        for c in range(C):
            if c == cdrop:
                continue
            R, t = state.R[c], state.t[c]
            Xc = [R[i, 0] * X_wo[0] + R[i, 1] * X_wo[1]
                  + R[i, 2] * X_wo[2] + t[i] for i in range(3)]
            z = Xc[2]
            zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
            u = fx[c] * Xc[0] * zi + cx[c]
            v = fy[c] * Xc[1] * zi + cy[c]
            e = jnp.hypot(u - pxT[c, 0], v - pxT[c, 1])
            max_e = jnp.maximum(max_e, jnp.where(okT_wo[c], e, 0.0))
            dok = dok & jnp.where(okT_wo[c], z > 1e-3, True)
        fin = jnp.isfinite(X_wo[0]) & jnp.isfinite(X_wo[1]) & \
            jnp.isfinite(X_wo[2])
        ok_wo = suspect & okT[cdrop] & (worst_view == cdrop) & dok & \
            (max_e < p.max_err) & fin
        new_save = ok_wo & ~save_any
        detach_cam = jnp.where(new_save, cdrop, detach_cam)
        for i in range(3):
            X_saved[i] = jnp.where(new_save, X_wo[i], X_saved[i])
        save_any = save_any | new_save
    saved = save_any
    win_fail = win_fail & ~saved
    # detach the outlier view's feature from the saved point; also drop
    # the point's stored appearance for that camera so registration and
    # duplicate fusion stop matching against the corrupted view
    mpt_new = tracks.mpt
    nccv = mappts.ncc_valid
    for c in range(C):
        det = saved & (detach_cam == c) & (slot[:, c] >= 0)
        fidx = jnp.where(det, jnp.clip(slot[:, c], 0), N)
        mpt_new = mpt_new.at[c, fidx].set(-1, mode="drop")
        nccv = nccv.at[:, c].set(jnp.where(det, False, nccv[:, c]))
    tracks_out = tracks._replace(mpt=mpt_new)
    mappts = mappts._replace(ncc_valid=nccv)
    # moved test: the current observations re-triangulate consistently
    # (tri_ok) but the stored position no longer explains them — the
    # point moved. Pixel-space, so it is scale-free and trips within a
    # few frames of real motion (the old 4-sigma 3D-displacement gate
    # needed metres of drift before firing on far objects).
    moved_now = max_err_stored > p.max_epi_err
    # debounce: a single-frame pose glitch also makes stored reprojections
    # jump; require two consecutive moved frames before flipping dynamic
    mv = jnp.where(alive & tri_ok,
                   jnp.where(moved_now, mappts.moved_votes + 1, 0),
                   mappts.moved_votes)
    mv = jnp.where(saved, 0, mv)
    moved = mv >= 2
    # feature-level dynamic votes: any bound feature voted dynamic
    feat_dyn = jnp.zeros((P,), bool)
    mapped = tracks.valid & (tracks.mpt >= 0)
    dyn_feat = mapped & (tracks.dyn_votes >= 3)
    feat_dyn = feat_dyn.at[jnp.where(dyn_feat, tracks.mpt, P)].set(
        True, mode="drop")

    is_dynamic = alive & tri_ok & (moved | feat_dyn)
    is_static_ok = alive & tri_ok & ~moved & ~feat_dyn & ~win_fail
    is_incons = (alive & (nv >= 2) & ~tri_ok & ~saved) | \
        (win_fail & ~is_dynamic)
    # single-view points with dynamic-voting features become uncertain
    single_dyn = alive & (nv < 2) & feat_dyn

    ptype = mappts.ptype
    ptype = jnp.where(is_dynamic, PT_DYNAMIC, ptype)
    # once dynamic, a point stays dynamic (its trajectory is the signal);
    # consistently-static uncertain points are re-promoted
    ptype = jnp.where(is_static_ok & (ptype == PT_UNCERTAIN), PT_STATIC, ptype)
    ptype = jnp.where(single_dyn & (ptype == PT_STATIC), PT_UNCERTAIN, ptype)
    # dynamic points take the current triangulation EVERY consistent frame
    # (updateDynamicPointPosition): not just at the moved-detection frame —
    # a tracked moving object must have its position follow the object
    upd_pos = alive & tri_ok & (is_dynamic | (ptype == PT_DYNAMIC))
    xyz = jnp.where(upd_pos[:, None], X_cur, mappts.xyz)
    # saved points take the drop-one-view re-triangulation
    X_sv = jnp.stack(X_saved, axis=-1)
    xyz = jnp.where((saved & ~upd_pos)[:, None], X_sv, xyz)
    Hinv = inv3x3_sym_ln(Hpx)
    cov_dyn = jnp.stack([jnp.stack(r) for r in Hinv]) * p.pixel_err_var
    cov = jnp.where(upd_pos[:, None, None],
                    cov_dyn.transpose(2, 0, 1), mappts.cov)
    # persistent inconsistency -> false (the setFalse path)
    bad = jnp.where(is_incons, mappts.bad_votes + 1,
                    jnp.where(is_static_ok | is_dynamic | saved, 0,
                              mappts.bad_votes))
    status = jnp.where(alive & (bad >= 3), ST_FALSE, mappts.status)
    mappts = mappts._replace(xyz=xyz, cov=cov, ptype=ptype, status=status,
                             bad_votes=bad, moved_votes=mv)
    n_static = jnp.sum((mappts.status == ST_ALIVE) & (ptype == PT_STATIC))
    n_dynamic = jnp.sum((mappts.status == ST_ALIVE) & (ptype == PT_DYNAMIC))
    n_false = jnp.sum(status == ST_FALSE)
    return ClassifyOut(mappts=mappts, n_static=n_static,
                       n_dynamic=n_dynamic, n_false=n_false,
                       tracks=tracks_out)
