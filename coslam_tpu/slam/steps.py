"""Per-frame device step functions (jitted, camera-batched).

Each function here is the TPU-native equivalent of one pipeline stage of
the reference's per-frame loop (CoSLAMThread.cpp:95-129; SURVEY.md §3.3):

  advance_tracks      <- featureTracking + GPUKLT::next + redetect protocol
                         (SL_SingleSLAM.cpp:329-331, GPUKLT.cpp:36-161,
                          v3d_gpuklt.cpp:592-889)
  choose_grid_features <- SingleSLAM::chooseStaticFeatPts block grid
                         (SL_SingleSLAM.cpp:345-397)
  pose_update         <- poseUpdate3D: IRLS pose + Mahalanobis gating +
                         seqTriangulate refinement (SL_SingleSLAM.cpp:600-753)
  new_map_points      <- SingleSLAM::newMapPoints two-view triangulation of
                         mature unmapped tracks with the parallax-widest
                         second view (SL_SingleSLAM.cpp:922-1050)
  add_keyframe        <- CoSLAM::addKeyFrame / addKeyPose
  build_ba_table /
  apply_ba_table_results <- RobustBundleRTS window collection + write-back
                         (SL_CoSLAMRobustBA.cpp:37-180,273-316); the
                         engine's fast path (dense [S, P] table solver).
                         build_ba_problem/apply_ba_results keep the
                         observation-list form (distributed sharding)

All dynamic structure (variable feature counts, allocation) is expressed
with masks and cumsum-rank compaction so shapes stay static (no recompiles).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry.camera import (
    undistort_points, pixel_to_normalized, project_points, projection_cov,
    mahalanobis2_2d, camera_center)
from coslam_tpu.geometry.triangulate import (
    triangulate_two_view_midpoint, triangulation_cov, seq_triangulate_update)
from coslam_tpu.ops import klt_track, detect_corners, extract_ncc_blocks
from coslam_tpu.ops.pyramid import Pyramid
from coslam_tpu.solvers.pose import irls_pose
from coslam_tpu.solvers.ba import BAProblem, BAResult
from coslam_tpu.slam.state import (
    SlamState, TrackTable, MapPoints, KeyframeStore, history_len,
    ST_FREE, ST_ALIVE, ST_FALSE, PT_STATIC, PT_DYNAMIC, PT_UNCERTAIN)


# ---------------------------------------------------------------------------
# tracking + redetect
# ---------------------------------------------------------------------------

def _rank_to_index(mask: jnp.ndarray) -> jnp.ndarray:
    """out[r] = index of the r-th True entry of ``mask`` (len(mask) where
    r >= count). The scatter form of "argsort(~mask) then take": one
    cumsum + one scatter instead of a full sort."""
    n = mask.shape[0]
    rank = jnp.cumsum(mask) - 1
    return jnp.full((n,), n, jnp.int32).at[
        jnp.where(mask, rank, n)].set(jnp.arange(n, dtype=jnp.int32),
                                      mode="drop")


@partial(jax.jit, static_argnames=("cfg",))
def advance_tracks(pyr_prev: Pyramid, pyr_cur: Pyramid, tracks: TrackTable,
                   K: jnp.ndarray, kc: jnp.ndarray, frame: jnp.ndarray,
                   cfg: SlamConfig) -> TrackTable:
    """KLT-track all slots, then refill dead slots from fresh corners
    (the every-frame ``redetect`` protocol, GPUKLT.cpp:144-161).

    Entirely camera-local — the multi-chip fused step runs this whole
    function inside shard_map, one camera block per device
    (fused.frame_step mesh mode)."""
    C, N = tracks.valid.shape
    T = tracks.hist.shape[1]
    res = klt_track(pyr_prev, pyr_cur, tracks.raw, tracks.valid, cfg.klt)
    survived = tracks.valid & res.valid
    raw = jnp.where(survived[..., None], res.pos, tracks.raw)
    # detect replacement corners away from surviving tracks
    det = detect_corners(pyr_cur.imgs[0], pyr_cur.dxs[0], pyr_cur.dys[0],
                         cfg.klt, N, exclude_pos=raw, exclude_valid=survived)

    def refill(raw_c, surv_c, det_pos_c, det_ok_c):
        # k-th detection fills the k-th free slot: rank free slots with a
        # cumsum + scatter (an argsort costs ~10x more on TPU)
        slot = _rank_to_index(~surv_c)            # [N], N where rank>=free
        use = det_ok_c & (slot < N)
        tgt = jnp.where(use, slot, N)
        raw_c = raw_c.at[tgt].set(det_pos_c, mode="drop")
        newly = jnp.zeros((N,), bool).at[tgt].set(use, mode="drop")
        return raw_c, newly

    raw, newly = jax.vmap(refill)(raw, survived, det.pos, det.valid)
    valid = survived | newly
    age = jnp.where(newly, 1, jnp.where(survived, tracks.age + 1, 0))
    mpt = jnp.where(newly, -1, jnp.where(survived, tracks.mpt, -1))
    dyn_votes = jnp.where(survived, tracks.dyn_votes, 0)
    gain = jnp.where(newly, 1.0, res.gain)
    pos = undistort_points(raw, K[:, None], kc[:, None])
    # history ring: clear refilled slots' past, then write current entry
    slot_idx = jnp.mod(frame, T)
    hist_valid = jnp.where(newly[:, None, :], False, tracks.hist_valid)
    hist = tracks.hist.at[:, slot_idx].set(pos)
    hist_valid = hist_valid.at[:, slot_idx].set(valid)
    # long-horizon ring: written every LONG_STRIDE frames (keeps the
    # 60-frame classify window affordable)
    from coslam_tpu.slam.state import LONG_STRIDE
    TL = tracks.hist_long.shape[1]
    li = jnp.mod(frame // LONG_STRIDE, TL)
    wr = jnp.mod(frame, LONG_STRIDE) == 0
    hist_long_valid = jnp.where(newly[:, None, :], False,
                                tracks.hist_long_valid)
    hist_long = tracks.hist_long.at[:, li].set(
        jnp.where(wr, pos, tracks.hist_long[:, li]))
    hist_long_valid = hist_long_valid.at[:, li].set(
        jnp.where(wr, valid, hist_long_valid[:, li]))
    return TrackTable(pos=pos, raw=raw, valid=valid, age=age, gain=gain,
                      mpt=mpt, dyn_votes=dyn_votes, hist=hist,
                      hist_valid=hist_valid, hist_long=hist_long,
                      hist_long_valid=hist_long_valid)


def seed_tracks(tracks: TrackTable, pos: jnp.ndarray, valid: jnp.ndarray,
                mpt: jnp.ndarray, K: jnp.ndarray, kc: jnp.ndarray,
                frame: jnp.ndarray) -> TrackTable:
    """Overwrite the table with externally chosen points (bootstrap seeding;
    feedExternFeatPoints role, v3d_gpuklt.cpp:808-855). ``pos`` is in
    undistorted pixel space; raw positions are reconstructed by applying
    distortion (identity when kc = 0)."""
    from coslam_tpu.geometry.camera import (distort_normalized,
                                            normalized_to_pixel)
    T = tracks.hist.shape[1]
    xn = pixel_to_normalized(pos, K[:, None])
    raw = normalized_to_pixel(distort_normalized(xn, kc[:, None]), K[:, None])
    slot_idx = jnp.mod(frame, T)
    hist = jnp.zeros_like(tracks.hist).at[:, slot_idx].set(pos)
    hist_valid = jnp.zeros_like(tracks.hist_valid).at[:, slot_idx].set(valid)
    from coslam_tpu.slam.state import LONG_STRIDE
    TL = tracks.hist_long.shape[1]
    li = jnp.mod(frame // LONG_STRIDE, TL)
    wr = jnp.mod(frame, LONG_STRIDE) == 0
    hist_long = jnp.zeros_like(tracks.hist_long).at[:, li].set(
        jnp.where(wr, pos, 0.0))
    hist_long_valid = jnp.zeros_like(tracks.hist_long_valid).at[
        :, li].set(valid & wr)
    return TrackTable(
        pos=pos, raw=raw, valid=valid,
        age=jnp.where(valid, 1, 0), gain=jnp.ones_like(tracks.gain),
        mpt=jnp.where(valid, mpt, -1),
        dyn_votes=jnp.zeros_like(tracks.dyn_votes),
        hist=hist, hist_valid=hist_valid,
        hist_long=hist_long, hist_long_valid=hist_long_valid)


# ---------------------------------------------------------------------------
# pose update
# ---------------------------------------------------------------------------

def choose_grid_features(tracks: TrackTable, mappts: MapPoints,
                         img_hw, cfg: SlamConfig) -> jnp.ndarray:
    """One mapped static feature per image block (12x16 grid,
    SL_SingleSLAM.h:25-39): returns a [C, N] selection mask."""
    C, N = tracks.valid.shape
    rows, cols = cfg.cap.pose_grid_rows, cfg.cap.pose_grid_cols
    h, w = img_hw
    mapped = tracks.mpt >= 0
    pstat = (mappts.status[jnp.clip(tracks.mpt, 0)] == ST_ALIVE) & \
            (mappts.ptype[jnp.clip(tracks.mpt, 0)] == PT_STATIC)
    cand = tracks.valid & mapped & pstat
    cy = jnp.clip((tracks.pos[..., 1] * rows / h).astype(jnp.int32), 0, rows - 1)
    cx = jnp.clip((tracks.pos[..., 0] * cols / w).astype(jnp.int32), 0, cols - 1)
    cell = cy * cols + cx
    # distance to cell center as priority (lower wins)
    ccx = (cx.astype(tracks.pos.dtype) + 0.5) * (w / cols)
    ccy = (cy.astype(tracks.pos.dtype) + 0.5) * (h / rows)
    prio = jnp.hypot(tracks.pos[..., 0] - ccx, tracks.pos[..., 1] - ccy)
    prio = jnp.where(cand, prio, jnp.inf)

    def per_cam(cell_c, prio_c, cand_c):
        best = jnp.full((rows * cols,), jnp.inf, prio_c.dtype)
        best = best.at[cell_c].min(prio_c)
        sel = cand_c & (prio_c <= best[cell_c]) & jnp.isfinite(prio_c)
        return sel

    return jax.vmap(per_cam)(cell, prio, cand)


class PoseUpdateOut(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    tracks: TrackTable
    mappts: MapPoints
    n_inliers: jnp.ndarray    # [C]
    coverage: jnp.ndarray     # [C] bbox area fraction of inlier features
    med_depth: jnp.ndarray    # [C] median depth of mapped static points
    med_err: jnp.ndarray      # [C]


@partial(jax.jit, static_argnames=("cfg", "img_hw"))
def pose_update(state: SlamState, K: jnp.ndarray, kc: jnp.ndarray,
                img_hw, cfg: SlamConfig,
                large_err=False) -> PoseUpdateOut:
    """Per-camera IRLS pose + Mahalanobis inlier/outlier gating +
    sequential map-point refinement (poseUpdate3D).

    ``large_err`` (bool or 0/1 scalar, TRACED — a static flag would
    compile a second copy of every graph containing this function and
    recompile the fused step mid-run at the first merge): widens the
    IRLS tau and the outlier gate 2x for post-merge/loop settle frames
    (the reference's largeErr, SL_CoSLAM.cpp:371-374,407)."""
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    p = cfg.p
    sel = choose_grid_features(tracks, mappts, img_hw, cfg)
    mi = jnp.clip(tracks.mpt, 0)
    X = mappts.xyz[mi]                                  # [C, N, 3]
    wide = 1.0 + jnp.asarray(large_err, jnp.float32)    # 1.0 or 2.0
    tau = p.max_err * wide

    def solve_cam(Kc, R0, t0, Xc, pxc, selc):
        # 4x8 IRLS-LM iterations: frame-to-frame pose deltas are small, so
        # the 5x10 default is ~40% wasted work in the hot path
        out = irls_pose(Kc, R0, t0, Xc, pxc, selc, tau, n_irls=4, n_lm=8)
        return out.R, out.t

    R_new, t_new = jax.vmap(solve_cam)(K, state.R, state.t, X, tracks.pos, sel)
    # fall back to previous pose if too few selected points (<5), the
    # solve blew up, or the solution is physically impossible for one
    # frame of motion (the willFail/pose-carry role, SL_SingleSLAM.cpp:
    # 605-618 — a degenerate feature constellation can satisfy IRLS with
    # a wild pose; a camera does not cross half the scene depth or spin
    # 35 degrees between consecutive frames)
    n_sel = jnp.sum(sel, axis=1)
    z_old = jnp.einsum("cj,cnj->cn", state.R[:, 2], X) + state.t[:, 2:3]
    med_z_old = jnp.nanmedian(jnp.where(sel & (z_old > 1e-3), z_old,
                                        jnp.nan), axis=1)
    med_z_old = jnp.where(jnp.isfinite(med_z_old) & (med_z_old > 1e-3),
                          med_z_old, 10.0)
    c_old = -jnp.einsum("cji,cj->ci", state.R, state.t)
    c_new = -jnp.einsum("cji,cj->ci", R_new, t_new)
    jump = jnp.linalg.norm(c_new - c_old, axis=-1)
    tr_rel = jnp.einsum("cij,cij->c", R_new, state.R)
    ang_rel = jnp.arccos(jnp.clip((tr_rel - 1.0) * 0.5, -1.0, 1.0))
    ok_cam = (n_sel >= 5) & jnp.all(jnp.isfinite(R_new), axis=(1, 2)) \
        & jnp.all(jnp.isfinite(t_new), axis=1) \
        & (jump < 0.5 * med_z_old) & (ang_rel < jnp.float32(0.61))
    R_new = jnp.where(ok_cam[:, None, None], R_new, state.R)
    t_new = jnp.where(ok_cam[:, None], t_new, state.t)

    # Mahalanobis gating of ALL mapped static features under the new pose.
    # Lane-major: features on the 128-lane axis, 2x3/3x3 blocks unrolled as
    # scalars x [C, N] vectors (the [C, N, 2, 3] layouts waste the tiles).
    mapped = tracks.valid & (tracks.mpt >= 0) & \
        (mappts.status[mi] == ST_ALIVE)
    is_static = mappts.ptype[mi] == PT_STATIC
    fxc = K[:, 0, 0][:, None]
    fyc = K[:, 1, 1][:, None]
    cxc = K[:, 0, 2][:, None]
    cyc = K[:, 1, 2][:, None]
    Xg = [X[..., i] for i in range(3)]                       # 3 x [C, N]
    cov_g = [[mappts.cov[..., i, j][mi] for j in range(3)]
             for i in range(3)]                              # 3x3 x [C, N]

    def proj_jac(Rm, tm):
        """Projection + pixel Jacobian rows at Xg under (Rm [C,3,3], tm)."""
        Xc = [Rm[:, i, 0][:, None] * Xg[0] + Rm[:, i, 1][:, None] * Xg[1]
              + Rm[:, i, 2][:, None] * Xg[2] + tm[:, i][:, None]
              for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = fxc * Xc[0] * zi + cxc
        v = fyc * Xc[1] * zi + cyc
        xz = Xc[0] * zi
        yz = Xc[1] * zi
        Ju = [fxc * (Rm[:, 0, j][:, None] - xz * Rm[:, 2, j][:, None]) * zi
              for j in range(3)]
        Jv = [fyc * (Rm[:, 1, j][:, None] - yz * Rm[:, 2, j][:, None]) * zi
              for j in range(3)]
        return u, v, z, Ju, Jv

    u, v, zdep, Ju, Jv = proj_jac(R_new, t_new)
    rx = tracks.pos[..., 0] - u                              # innovation
    ry = tracks.pos[..., 1] - v
    # S = J cov J^T + pixel_var I (2x2, as three [C, N] entries)
    cJu = [sum(cov_g[i][j] * Ju[j] for j in range(3)) for i in range(3)]
    cJv = [sum(cov_g[i][j] * Jv[j] for j in range(3)) for i in range(3)]
    s00 = sum(Ju[i] * cJu[i] for i in range(3)) + p.pixel_err_var
    s01 = sum(Ju[i] * cJv[i] for i in range(3))
    s11 = sum(Jv[i] * cJv[i] for i in range(3)) + p.pixel_err_var
    det = s00 * s11 - s01 * s01
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    maha2 = (s11 * rx * rx - 2.0 * s01 * rx * ry + s00 * ry * ry) / det
    out_gate = (p.maha_outlier * wide) ** 2
    in_gate = p.maha_inlier ** 2
    outlier = mapped & is_static & (maha2 > out_gate)
    inlier = mapped & is_static & (maha2 <= in_gate)
    # outliers detach from the map (the point survives; classification and
    # registration may re-acquire or kill it later)
    tracks = tracks._replace(mpt=jnp.where(outlier, -1, tracks.mpt))

    # sequential refinement of inlier static points (seqTriangulate role):
    # fold each camera's current observation into (xyz, cov) in turn —
    # the per-camera loop preserves the information-filter ordering; the
    # Kalman algebra is the same lane-major component arithmetic
    xyz, cov = mappts.xyz, mappts.cov
    err = jnp.hypot(rx, ry)
    for c in range(C):
        w_in = inlier[c]
        Xp = xyz[mi[c]]
        Cp = cov[mi[c]]
        Xn, Cn, _ = seq_triangulate_update(
            K[c], R_new[c], t_new[c], tracks.pos[c], Xp, Cp,
            pixel_var=p.pixel_err_var, gate_maha2=in_gate)
        upd = w_in
        xyz = xyz.at[mi[c]].set(jnp.where(upd[:, None], Xn, Xp), mode="drop")
        cov = cov.at[mi[c]].set(jnp.where(upd[:, None, None], Cn, Cp),
                                mode="drop")
    # observation bookkeeping
    # NOTE: traced -1 indices WRAP (even with mode="drop"); the
    # out-of-range sentinel must be P
    P = mappts.xyz.shape[0]
    seen = jnp.zeros_like(mappts.last_obs, dtype=bool)
    seen = seen.at[jnp.where(mapped & ~outlier, tracks.mpt, P)].set(
        True, mode="drop")
    last_obs = jnp.where(seen, state.frame, mappts.last_obs)
    # ownership: lowest camera currently observing (min reduction via
    # descending-camera scatter order)
    owner = mappts.owner
    for c in range(C - 1, -1, -1):
        sel = mapped[c] & ~outlier[c]
        owner = owner.at[jnp.where(sel, tracks.mpt[c], P)].set(
            c, mode="drop")
    mappts = mappts._replace(xyz=xyz, cov=cov, last_obs=last_obs,
                             owner=owner)

    # stats
    med_depth = jnp.nanmedian(jnp.where(mapped & is_static, zdep, jnp.nan),
                              axis=1)
    med_err = jnp.nanmedian(jnp.where(inlier, err, jnp.nan), axis=1)
    h, w = img_hw
    fx = jnp.where(inlier, tracks.pos[..., 0], jnp.nan)
    fy = jnp.where(inlier, tracks.pos[..., 1], jnp.nan)
    cov_frac = ((jnp.nanmax(fx, 1) - jnp.nanmin(fx, 1))
                * (jnp.nanmax(fy, 1) - jnp.nanmin(fy, 1))) / float(h * w)
    cov_frac = jnp.where(jnp.isfinite(cov_frac), cov_frac, 0.0)
    return PoseUpdateOut(R=R_new, t=t_new, tracks=tracks, mappts=mappts,
                         n_inliers=jnp.sum(inlier, 1), coverage=cov_frac,
                         med_depth=med_depth, med_err=med_err)


# ---------------------------------------------------------------------------
# new map points (intra-camera)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg",))
def new_map_points(state: SlamState, pyr_cur: Pyramid, K: jnp.ndarray,
                   kc: jnp.ndarray, cfg: SlamConfig, blocks=None):
    """Two-view triangulation of mature unmapped tracks against the
    parallax-widest view in the rolling history (newMapPoints,
    SL_SingleSLAM.cpp:922-1050). Returns (mappts', tracks', n_new).

    ``blocks``: optional pre-extracted ([C,N,B] NCC blocks, [C,N] mask)
    at tracks.raw — the multi-chip step extracts them inside the
    per-camera shard_map so this function never touches the (sharded)
    pyramid."""
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    T = tracks.hist.shape[1]
    P = mappts.xyz.shape[0]
    p = cfg.p
    frame = state.frame
    cand = tracks.valid & (tracks.mpt < 0) & \
        (tracks.age >= p.min_feat_track_len) & \
        (tracks.dyn_votes < 3)
    # lane-major throughout: the feature axis N stays last (128 lanes);
    # 3-vectors/3x3s are unrolled component arrays ([C, T, N, 3]-trailing
    # layouts waste ~96% of each vector tile)
    from coslam_tpu.geometry.triangulate import (
        inv3x3_sym_ln, solve3x3_sym_ln)
    fx = K[:, 0, 0][:, None, None]
    fy = K[:, 1, 1][:, None, None]
    cx = K[:, 0, 2][:, None, None]
    cy = K[:, 1, 2][:, None, None]
    x_now = (tracks.pos[..., 0][:, None] - cx) / fx                # [C,1,N]
    y_now = (tracks.pos[..., 1][:, None] - cy) / fy
    # second-view candidates: a LOG-SPACED subset of history offsets
    # instead of all T of them. The parallax-widest view is nearly always
    # the oldest available one, and log spacing keeps every candidate
    # within ~25% of any exact offset — the selection loss is negligible
    # while the [C, T, N] triangulation/reproj block (the most expensive
    # stage of the fused step) shrinks ~3x. At T <= 9 (test shapes) the
    # subset is exhaustive, so small-config behavior is unchanged.
    import numpy as _np
    if T <= 9:
        offs = _np.arange(1, T)
    else:
        # geomspace over [1, T-2] plus T-1: offset 0 is always masked by
        # the hist_ok gate (k_off >= 1) so it would be a dead lane, and
        # just-matured tracks (age == T-2 the frame their point is
        # allocated — the dominant case) need an offset at exactly T-2
        # to keep their widest baseline; T-1 serves fully-aged tracks
        geo = _np.rint(_np.geomspace(1, T - 2, 7)).astype(int)
        offs = _np.unique(_np.concatenate([geo, [T - 1]]))
    Ts = len(offs)
    ages = jnp.minimum(tracks.age - 1, T - 1)
    k_off = jnp.asarray(offs, jnp.int32)                           # offset back
    past_frame = frame - k_off                                     # [Ts]
    ring = jnp.mod(past_frame, T)                                  # [Ts]
    hist_pos = jnp.take(tracks.hist, ring, axis=1)                 # [C,T,N,2]
    hx = hist_pos[..., 0]
    hy = hist_pos[..., 1]
    hist_ok = jnp.take(tracks.hist_valid, ring, axis=1) & \
        (k_off[None, :, None] >= 1) & (k_off[None, :, None] <= ages[:, None]) \
        & (past_frame[None, :, None] >= 0)
    Rp = jnp.take(state.pose_hist_R, ring, axis=1)                 # [C,T,3,3]
    tp = jnp.take(state.pose_hist_t, ring, axis=1)                 # [C,T,3]
    x_past = (hx - cx) / fx                                        # [C,T,N]
    y_past = (hy - cy) / fy
    # second-view selection by RAY-ANGLE parallax only. (The per-offset
    # two-view midpoint triangulation + reprojection pre-gates that used
    # to run here fed nothing but gates the full-chain refinement +
    # endpoint recheck below strictly supersede — and that [C,Ts,N]
    # block was the single most expensive stage of the fused step,
    # ~1.3 ms of the 6 ms step at 3x640x480. Cheirality is enforced
    # post-refine via the z_now/z_past > 0 checks.)
    dn = [state.R[:, 0, i][:, None, None] * x_now
          + state.R[:, 1, i][:, None, None] * y_now
          + state.R[:, 2, i][:, None, None] for i in range(3)]  # [C,1,N]
    dp = [Rp[:, :, 0, i][:, :, None] * x_past
          + Rp[:, :, 1, i][:, :, None] * y_past
          + Rp[:, :, 2, i][:, :, None] for i in range(3)]       # [C,Ts,N]
    num = dn[0] * dp[0] + dn[1] * dp[1] + dn[2] * dp[2]
    den2 = (dn[0] * dn[0] + dn[1] * dn[1] + dn[2] * dn[2]) * \
        (dp[0] * dp[0] + dp[1] * dp[1] + dp[2] * dp[2])
    pcos = num * jax.lax.rsqrt(jnp.maximum(den2, 1e-18))
    max_cos = jnp.cos(jnp.deg2rad(p.new_point_min_parallax_deg))
    gate2 = p.reproj_new_point_gate ** 2
    good = hist_ok & (jnp.abs(pcos) < max_cos)
    # widest parallax (smallest |cos|) among good views
    score = jnp.where(good, -jnp.abs(pcos), -jnp.inf)
    best_k = jnp.argmax(score, axis=1)                             # [C,N]
    any_good = jnp.any(good, axis=1)
    takeT = lambda A: jnp.take_along_axis(A, best_k[:, None, :], axis=1)[:, 0]
    dt = x_now.dtype
    Rb9 = [[takeT(jnp.broadcast_to(Rp[:, :, i, j][:, :, None], (C, Ts, N)))
            for j in range(3)] for i in range(3)]                  # [C,N] each
    tb3 = [takeT(jnp.broadcast_to(tp[:, :, i][:, :, None], (C, Ts, N)))
           for i in range(3)]
    # refineTriangulation parity (SL_SingleSLAM.cpp:973-982): refine the
    # two-view seed over the WHOLE track history (multi-view DLT over
    # every valid history observation + the current view), then re-check
    # reprojection at both chosen endpoint views. The two-view gate has a
    # blind spot — ANY pair of rays intersects, so a point translating
    # along its epipolar plane (e.g. a lateral mover with the epipole
    # near the image center) fits both endpoints exactly. The full-chain
    # refinement lands mid-trajectory and the endpoint errors expose the
    # motion; this keeps slow movers out of the static map the same way
    # the reference's refine-then-recheck does.
    R_cur = [[jnp.broadcast_to(state.R[:, i, j][:, None], (C, N))
              for j in range(3)] for i in range(3)]
    t_cur = [jnp.broadcast_to(state.t[:, i][:, None], (C, N))
             for i in range(3)]

    def _solve_chain(w_hist):
        """Weighted multi-view DLT over current view (weight 1) + the Ts
        history views (weights [C, Ts, N])."""
        Hh = [[jnp.full((C, N), 1e-9 if i == j else 0.0, dt)
               for j in range(3)] for i in range(3)]
        gh = [jnp.zeros((C, N), dt) for _ in range(3)]

        def acc(Rm, tm, xn, yn, wc):
            M1 = [xn * Rm[2][j] - Rm[0][j] for j in range(3)]
            M2 = [yn * Rm[2][j] - Rm[1][j] for j in range(3)]
            b1 = tm[0] - xn * tm[2]
            b2 = tm[1] - yn * tm[2]
            for i in range(3):
                for j in range(i + 1):
                    Hh[i][j] = Hh[i][j] + wc * (M1[i] * M1[j]
                                                + M2[i] * M2[j])
                gh[i] = gh[i] + wc * (M1[i] * b1 + M2[i] * b2)

        acc(R_cur, t_cur, x_now[:, 0], y_now[:, 0], jnp.ones((C, N), dt))
        for k in range(Ts):
            Rk = [[Rp[:, k, i, j][:, None] for j in range(3)]
                  for i in range(3)]
            tk = [tp[:, k, i][:, None] for i in range(3)]
            acc(Rk, tk, x_past[:, k], y_past[:, k], w_hist[:, k])
        return solve3x3_sym_ln(Hh, gh)                     # 3 x [C,N]

    def _reproj_err2_at(Xq, Rm, tm, px_x, px_y):
        Xc = [Rm[i][0] * Xq[0] + Rm[i][1] * Xq[1] + Rm[i][2] * Xq[2]
              + tm[i] for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        du = fx[:, 0] * Xc[0] * zi + cx[:, 0] - px_x
        dv = fy[:, 0] * Xc[1] * zi + cy[:, 0] - px_y
        return du * du + dv * dv, z

    # single strict pass: every valid history view participates and the
    # endpoint recheck must hold on the full-chain fit. (A robust
    # drop-the-disagreeing-views reweight pass was tried and REJECTED: it
    # admits ~2x more points but of measurably worse quality — the
    # three-camera dynamic rig's ATE doubled — because a point whose
    # history disagrees with a rigid chain fit is exactly what this gate
    # exists to keep out.)
    Xb = _solve_chain(hist_ok.astype(dt))

    e2r_now, z_now = _reproj_err2_at(Xb, R_cur, t_cur,
                                     tracks.pos[..., 0],
                                     tracks.pos[..., 1])
    e2r_past, z_past = _reproj_err2_at(Xb, Rb9, tb3, takeT(hx), takeT(hy))
    refine_ok = (e2r_now < gate2) & (e2r_past < gate2) & \
        (z_now > 1e-3) & (z_past > 1e-3)
    X_new = jnp.stack(Xb, axis=-1)                                 # [C,N,3]
    alloc = cand & any_good & refine_ok
    # covariance from the two chosen views: pixel-space J^T J accumulated
    # componentwise, cov = pixel_var * H^-1
    Hpx = [[jnp.full((C, N), 1e-9 if i == j else 0.0, dt)
            for j in range(3)] for i in range(3)]
    fx2, fy2 = fx[:, 0], fy[:, 0]                                  # [C,1]
    for view in range(2):
        if view == 0:
            Rv = [[jnp.broadcast_to(state.R[:, i, j][:, None], (C, N))
                   for j in range(3)] for i in range(3)]
            tv = [jnp.broadcast_to(state.t[:, i][:, None], (C, N))
                  for i in range(3)]
        else:
            Rv, tv = Rb9, tb3
        Xc = [Rv[i][0] * Xb[0] + Rv[i][1] * Xb[1] + Rv[i][2] * Xb[2] + tv[i]
              for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        xz = Xc[0] * zi
        yz = Xc[1] * zi
        Ju = [fx2 * (Rv[0][j] - xz * Rv[2][j]) * zi for j in range(3)]
        Jv = [fy2 * (Rv[1][j] - yz * Rv[2][j]) * zi for j in range(3)]
        for i in range(3):
            for j in range(i + 1):
                Hpx[i][j] = Hpx[i][j] + Ju[i] * Ju[j] + Jv[i] * Jv[j]
    Hinv = inv3x3_sym_ln(Hpx)
    covs = jnp.stack([jnp.stack(r) for r in Hinv]).transpose(2, 3, 0, 1) \
        * p.pixel_err_var                                          # [C,N,3,3]
    # NCC appearance at the current frame (whole camera batch, Pallas
    # window kernel on TPU)
    if blocks is None:
        from coslam_tpu.ops.ncc import extract_ncc_blocks_batched
        blocks, blk_ok = extract_ncc_blocks_batched(
            pyr_cur.imgs[0], tracks.raw, p.ncc_patch_radius)
    else:
        blocks, blk_ok = blocks
    # refresh stored appearance of points observed this frame, but only
    # while the new view still resembles the stored one (NCC >= 0.8) —
    # an unconditional refresh drifts the template toward oblique/blurred
    # last-glimpse views, which is exactly the wrong appearance to match
    # on a later frontal revisit (template update with drift correction)
    cam_of3 = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N))
    mi_b = jnp.clip(tracks.mpt, 0)
    old_blk = mappts.ncc[mi_b, cam_of3]                     # [C, N, B]
    old_ok = mappts.ncc_valid[mi_b, cam_of3]
    sim = jnp.einsum("cnb,cnb->cn", old_blk, blocks)
    mapped_b = tracks.valid & (tracks.mpt >= 0) & blk_ok
    refresh = mapped_b & ((sim >= 0.8) | ~old_ok)
    cam_of = jnp.arange(C * N) // N
    obs_slot = jnp.where(refresh, tracks.mpt, P).reshape(-1)
    mappts = mappts._replace(
        ncc=mappts.ncc.at[obs_slot, cam_of].set(
            blocks.reshape(C * N, -1), mode="drop"),
        ncc_valid=mappts.ncc_valid.at[obs_slot, cam_of].set(
            True, mode="drop"))
    # ---- allocate map slots (free-list via cumsum-rank scatter) ----
    flat_alloc = alloc.reshape(-1)
    flat_X = X_new.reshape(-1, 3)
    flat_cov = covs.reshape(-1, 3, 3)
    free = mappts.status == ST_FREE
    idx_of_rank = _rank_to_index(free)              # [P], P where no slot
    want_rank = jnp.cumsum(flat_alloc) - 1          # rank among allocators
    slot = idx_of_rank[jnp.clip(want_rank, 0, P - 1)]
    can = flat_alloc & (slot < P)
    slot = jnp.where(can, slot, P)                  # P = drop
    xyz = mappts.xyz.at[slot].set(flat_X, mode="drop")
    cov = mappts.cov.at[slot].set(flat_cov, mode="drop")
    gen = mappts.gen.at[slot].add(1, mode="drop")   # invalidate stale kf obs
    status = mappts.status.at[slot].set(ST_ALIVE, mode="drop")
    ptype = mappts.ptype.at[slot].set(PT_STATIC, mode="drop")
    first_frame = mappts.first_frame.at[slot].set(frame, mode="drop")
    last_obs = mappts.last_obs.at[slot].set(frame, mode="drop")
    bad_votes = mappts.bad_votes.at[slot].set(0, mode="drop")
    moved_votes = mappts.moved_votes.at[slot].set(0, mode="drop")
    # per-camera NCC write: slot s belongs to camera c = flat_idx // N
    cam_of = jnp.arange(C * N) // N
    owner = mappts.owner.at[slot].set(cam_of.astype(jnp.int32), mode="drop")
    ncc = mappts.ncc.at[slot, cam_of].set(blocks.reshape(C * N, -1),
                                          mode="drop")
    ncc_valid = mappts.ncc_valid.at[slot, cam_of].set(blk_ok.reshape(-1),
                                                      mode="drop")
    mpt = jnp.where((slot < P).reshape(C, N), slot.reshape(C, N), tracks.mpt)
    tracks = tracks._replace(mpt=mpt)
    mappts = MapPoints(xyz=xyz, cov=cov, gen=gen, status=status, ptype=ptype,
                       first_frame=first_frame, last_obs=last_obs,
                       bad_votes=bad_votes, moved_votes=moved_votes,
                       owner=owner, ncc=ncc,
                       ncc_valid=ncc_valid)
    return mappts, tracks, jnp.sum(can)


# ---------------------------------------------------------------------------
# keyframes + BA window
# ---------------------------------------------------------------------------

@jax.jit
def add_keyframe(state: SlamState) -> KeyframeStore:
    kfs = state.kfs
    KF = kfs.frame.shape[0]
    D = kfs.dyn_xyz.shape[1]
    P = state.mappts.xyz.shape[0]
    w = jnp.mod(kfs.n, KF)
    mapped = state.tracks.valid & (state.tracks.mpt >= 0)
    mi = jnp.clip(state.tracks.mpt, 0)
    # dynamic-point snapshot (storeDynamicMapPoints): deep-copy up to D
    # alive dynamic points' positions + per-camera observations so the BA
    # window can constrain this keyframe's cameras through them
    from coslam_tpu.slam.classify import point_obs_table
    dyn = (state.mappts.status == ST_ALIVE) & \
        (state.mappts.ptype == PT_DYNAMIC)
    pt_of_d = _rank_to_index(dyn)[:D]            # [D], P where none
    d_ok = pt_of_d < P
    pt_c = jnp.clip(pt_of_d, 0, P - 1)
    _, obs_px, obs_ok = point_obs_table(state.tracks, P)   # [P,C,2],[P,C]
    dyn_px = obs_px[pt_c].transpose(1, 0, 2)     # [C, D, 2]
    dyn_ok = (obs_ok[pt_c] & d_ok[:, None]).T    # [C, D]
    return KeyframeStore(
        frame=kfs.frame.at[w].set(state.frame),
        R=kfs.R.at[w].set(state.R),
        t=kfs.t.at[w].set(state.t),
        obs_pos=kfs.obs_pos.at[w].set(state.tracks.pos),
        obs_mpt=kfs.obs_mpt.at[w].set(
            jnp.where(mapped, state.tracks.mpt, -1)),
        obs_gen=kfs.obs_gen.at[w].set(state.mappts.gen[mi]),
        dyn_xyz=kfs.dyn_xyz.at[w].set(state.mappts.xyz[pt_c]),
        dyn_obs_px=kfs.dyn_obs_px.at[w].set(dyn_px),
        dyn_obs_ok=kfs.dyn_obs_ok.at[w].set(dyn_ok),
        n=kfs.n + 1)


@partial(jax.jit, static_argnames=("cfg", "window"))
def build_ba_problem(state: SlamState, K: jnp.ndarray,
                     cfg: SlamConfig, window: int | None = None):
    """Collect the last ``ba_window`` keyframes into a BAProblem
    (RobustBundleRTS::addKeyFrames/addPoints). Returns (problem,
    window_ring_idx [W]) with window position 0 = oldest.

    ``window`` overrides the keyframe count and frees the mid-window
    poses even when the window is only partially filled — the merge-time
    joint BA semantics, mirroring build_ba_table (the list form is what
    multi-host BA shards, so it needs the same override)."""
    free_partial = window is not None
    kfs, mappts = state.kfs, state.mappts
    KF, C, N = kfs.obs_mpt.shape
    P = mappts.xyz.shape[0]
    W = min(window or cfg.cap.ba_window, KF)
    # chronological window: positions n-W .. n-1 (clipped at 0)
    start = jnp.maximum(kfs.n - W, 0)
    kf_ord = start + jnp.arange(W)                  # absolute kf numbers
    kf_ok = kf_ord < kfs.n
    ring = jnp.mod(kf_ord, KF)
    Rw = kfs.R[ring]                                # [W,C,3,3]
    tw = kfs.t[ring]
    obs_pos = kfs.obs_pos[ring]                     # [W,C,N,2]
    obs_mpt = kfs.obs_mpt[ring]                     # [W,C,N]
    obs_gen = kfs.obs_gen[ring]                     # [W,C,N]
    mi = jnp.clip(obs_mpt, 0)
    pt_ok = (mappts.status[mi] == ST_ALIVE) & (mappts.ptype[mi] == PT_STATIC) \
        & (mappts.gen[mi] == obs_gen)               # reject recycled slots
    obs_valid = (obs_mpt >= 0) & pt_ok & kf_ok[:, None, None]
    O = W * C * N
    obs_cam = jnp.broadcast_to(
        (jnp.arange(W)[:, None, None] * C + jnp.arange(C)[None, :, None]),
        (W, C, N)).reshape(O)
    obs_pt = mi.reshape(O)
    # points need >=2 window observations to move; points established
    # BEFORE the window act as gauge anchors (the nPtsCon mechanism of
    # bundleAdjustRobust, SL_CoSLAMRobustBA.h:30-46) — without them a
    # sliding monocular window lets scale wander
    cnt = jax.ops.segment_sum(obs_valid.reshape(O).astype(jnp.int32),
                              obs_pt, num_segments=P)
    oldest_frame = kfs.frame[ring[jnp.argmax(kf_ok)]]
    pre_window = mappts.first_frame < oldest_frame
    point_fixed = (cnt < 2) | pre_window
    obs_valid = obs_valid.reshape(O) & (cnt[obs_pt] >= 2)
    # bound the problem at max_obs_per_ba observation slots (the list
    # form is what multi-host BA shards; the cap keeps per-device work
    # bounded at full capacity)
    obs_valid = obs_valid & (jnp.cumsum(obs_valid) - 1
                             < cfg.cap.max_obs_per_ba)
    # gauge: cameras of the two oldest valid keyframes are fixed
    # gauge: the two oldest valid keyframes (window positions 0, 1 —
    # start is clamped at 0, so valid entries always lead) are fixed;
    # positions beyond kfs.n carry no observations and are held fixed
    # too. Until the window FILLS, all poses stay fixed (structure-only
    # refinement) — the reference skips BA entirely below a full window
    # (SL_CoSLAM.cpp:1737-1757) because young keyframes anchor the
    # bootstrap datum. An explicit ``window`` override (merge-time joint
    # BA) frees the mid-window keyframes instead: absorbing separation
    # drift is the whole point there.
    kf_fixed = (jnp.arange(W) < 2) | ~kf_ok
    if not free_partial:
        kf_fixed = kf_fixed | (jnp.sum(kf_ok) < W)
    cam_fixed = jnp.broadcast_to(kf_fixed[:, None], (W, C)).reshape(W * C)
    prob = BAProblem(
        K=jnp.broadcast_to(K[None], (W, C, 3, 3)).reshape(W * C, 3, 3),
        R=Rw.reshape(W * C, 3, 3), t=tw.reshape(W * C, 3),
        X=mappts.xyz,
        obs_cam=obs_cam.astype(jnp.int32), obs_pt=obs_pt.astype(jnp.int32),
        obs_px=obs_pos.reshape(O, 2), obs_valid=obs_valid,
        cam_fixed=cam_fixed, point_fixed=point_fixed)
    return prob, ring, kf_ok


@partial(jax.jit, static_argnames=("cfg", "window"))
def build_ba_table(state: SlamState, K: jnp.ndarray, cfg: SlamConfig,
                   window: int | None = None):
    """Dense [S, P] window table for ``bundle_adjust_table`` (the
    scatter-free fast path; S = ba_window x cameras). Same collection
    semantics as build_ba_problem: recycled-slot rejection via
    generations, >=2-obs requirement, pre-window anchors, 2-keyframe
    gauge. ``window`` overrides the keyframe count (the merge-time joint
    BA widens it to cover both groups' separation-era keyframes,
    genMergeInfoVer2's role — SL_MergeCameraGroup.cpp:557-725).
    Returns (BATableProblem, ring [W], kf_ok [W])."""
    free_partial = window is not None
    from coslam_tpu.solvers.ba import BATableProblem
    kfs, mappts = state.kfs, state.mappts
    KF, C, N = kfs.obs_mpt.shape
    P = mappts.xyz.shape[0]
    W = min(window or cfg.cap.ba_window, KF)
    S = W * C
    start = jnp.maximum(kfs.n - W, 0)
    kf_ord = start + jnp.arange(W)
    kf_ok = kf_ord < kfs.n
    ring = jnp.mod(kf_ord, KF)
    Rw = kfs.R[ring].reshape(S, 3, 3)
    tw = kfs.t[ring].reshape(S, 3)
    obs_pos = kfs.obs_pos[ring]                     # [W, C, N, 2]
    obs_mpt = kfs.obs_mpt[ring]
    obs_gen = kfs.obs_gen[ring]
    mi = jnp.clip(obs_mpt, 0)
    pt_ok = (mappts.status[mi] == ST_ALIVE) & \
        (mappts.ptype[mi] == PT_STATIC) & (mappts.gen[mi] == obs_gen)
    ok = (obs_mpt >= 0) & pt_ok & kf_ok[:, None, None]
    slot_of = jnp.broadcast_to(
        (jnp.arange(W)[:, None, None] * C + jnp.arange(C)[None, :, None]),
        (W, C, N)).reshape(-1)
    tgt = jnp.where(ok, obs_mpt, P).reshape(-1)     # P = drop
    tbl_ok = jnp.zeros((S, P), bool).at[slot_of, tgt].set(True, mode="drop")
    tbl_u = jnp.zeros((S, P), obs_pos.dtype).at[slot_of, tgt].set(
        obs_pos[..., 0].reshape(-1), mode="drop")
    tbl_v = jnp.zeros((S, P), obs_pos.dtype).at[slot_of, tgt].set(
        obs_pos[..., 1].reshape(-1), mode="drop")
    cnt = jnp.sum(tbl_ok, axis=0)
    oldest_frame = kfs.frame[ring[jnp.argmax(kf_ok)]]
    point_fixed = (cnt < 2) | (mappts.first_frame < oldest_frame)
    valid = tbl_ok & (cnt >= 2)[None]
    # gauge: the two oldest valid keyframes (window positions 0, 1 —
    # start is clamped at 0, so valid entries always lead) are fixed;
    # positions beyond kfs.n carry no observations and are held fixed
    # too. Until the window FILLS, all poses stay fixed (structure-only
    # refinement) — the reference skips BA entirely below a full window
    # (SL_CoSLAM.cpp:1737-1757) because young keyframes anchor the
    # bootstrap datum. An explicit ``window`` override (merge-time joint
    # BA) frees the mid-window keyframes instead: absorbing separation
    # drift is the whole point there.
    kf_fixed = (jnp.arange(W) < 2) | ~kf_ok
    if not free_partial:
        kf_fixed = kf_fixed | (jnp.sum(kf_ok) < W)
    cam_fixed = jnp.broadcast_to(kf_fixed[:, None], (W, C)).reshape(S)
    # --- dynamic-snapshot columns (SL_CoSLAMRobustBA.cpp:66-77): each
    # keyframe's deep-copied dynamic points become independent landmarks
    # observed ONLY by that keyframe's cameras (a moving point has no
    # cross-keyframe identity). They add same-instant multi-camera
    # constraints — the paper's "dynamic points help the cameras" effect
    # inside the BA window. Column layout: [P static | W*D dyn (padded)].
    D = kfs.dyn_xyz.shape[1]
    E = -(-(W * D) // 128) * 128                 # lane-pad the dyn block
    dyn_px = kfs.dyn_obs_px[ring]                # [W, C, D, 2]
    dyn_ok = kfs.dyn_obs_ok[ring] & kf_ok[:, None, None]
    eyeW = jnp.eye(W, dtype=bool)
    ok_ext = dyn_ok[:, :, None, :] & eyeW[:, None, :, None]  # [W,C,W,D]
    u_ext = jnp.where(ok_ext, dyn_px[:, :, None, :, 0], 0.0)
    v_ext = jnp.where(ok_ext, dyn_px[:, :, None, :, 1], 0.0)
    ok_ext = ok_ext.reshape(S, W * D)
    u_ext = u_ext.reshape(S, W * D)
    v_ext = v_ext.reshape(S, W * D)
    pad = E - W * D
    dt = tbl_u.dtype
    if pad:
        ok_ext = jnp.pad(ok_ext, ((0, 0), (0, pad)))
        u_ext = jnp.pad(u_ext, ((0, 0), (0, pad)))
        v_ext = jnp.pad(v_ext, ((0, 0), (0, pad)))
    cnt_ext = jnp.sum(ok_ext, axis=0)
    ok_ext = ok_ext & (cnt_ext >= 2)[None]
    X_ext = jnp.pad(kfs.dyn_xyz[ring].reshape(W * D, 3).astype(dt),
                    ((0, pad), (0, 0)))
    prob = BATableProblem(
        K=jnp.broadcast_to(K[None], (W, C, 3, 3)).reshape(S, 3, 3),
        R=Rw, t=tw,
        X=jnp.concatenate([mappts.xyz, X_ext], axis=0),
        obs_px=jnp.concatenate(
            [jnp.stack([tbl_u, tbl_v], axis=1),
             jnp.stack([u_ext, v_ext], axis=1)], axis=2),
        obs_valid=jnp.concatenate([valid, ok_ext], axis=1),
        cam_fixed=cam_fixed,
        point_fixed=jnp.concatenate([point_fixed, cnt_ext < 2]))
    return prob, ring, kf_ok


@partial(jax.jit, static_argnames=("cfg",))
def apply_ba_table_results(state: SlamState, res, ring: jnp.ndarray,
                           kf_ok: jnp.ndarray, cfg: SlamConfig,
                           gen0: jnp.ndarray | None = None) -> SlamState:
    """apply_ba_results for the table solver's BATableResult (the
    per-point outlier counts come from the [S, P] flag table). Columns
    beyond the map capacity are per-keyframe dynamic snapshots — they
    constrain the solve but do not write back."""
    P = state.mappts.xyz.shape[0]
    n_bad = jnp.sum(res.obs_outlier[:, :P], axis=0)
    n_obs = jnp.sum(res.obs_valid[:, :P], axis=0)
    return _apply_ba_core(state, res.R, res.t, res.X[:P], n_bad, n_obs,
                          ring, kf_ok, cfg, gen0)


def _apply_ba_core(state: SlamState, R_res, t_res, X_res, n_bad, n_obs,
                   ring, kf_ok, cfg: SlamConfig, gen0):
    kfs, mappts = state.kfs, state.mappts
    C = kfs.R.shape[1]
    W = ring.shape[0]
    R_new = R_res.reshape(W, C, 3, 3)
    t_new = t_res.reshape(W, C, 3)
    # divergence gate: BA is a REFINEMENT — a solution that moves any
    # window camera center by a large fraction of the scene depth (or
    # spins it >35 deg) means the solve ran away on a degenerate window
    # (low-parallax span, glitched gauge keyframe). Committing it would
    # teleport the live pose via the D-correction below and strand the
    # whole run in a broken frame; skip the entire write-back instead.
    R_win_old = state.kfs.R[ring]                          # [W, C, 3, 3]
    t_win_old = state.kfs.t[ring]
    c_w_old = -jnp.einsum("wcji,wcj->wci", R_win_old, t_win_old)
    c_w_new = -jnp.einsum("wcji,wcj->wci", R_new, t_new)
    jump_w = jnp.linalg.norm(c_w_new - c_w_old, axis=-1)   # [W, C]
    tr_w = jnp.einsum("wcij,wcij->wc", R_new, R_win_old)
    ang_w = jnp.arccos(jnp.clip((tr_w - 1.0) * 0.5, -1.0, 1.0))
    z_map = jnp.einsum("cj,pj->cp", state.R[:, 2], mappts.xyz) \
        + state.t[:, 2:3]
    alive0 = mappts.status == ST_ALIVE
    med_z = jnp.nanmedian(jnp.where(alive0[None] & (z_map > 1e-3), z_map,
                                    jnp.nan), axis=1)      # [C]
    med_z = jnp.where(jnp.isfinite(med_z) & (med_z > 1e-3), med_z, 10.0)
    okm = kf_ok[:, None]
    ba_ok = jnp.all(jnp.where(okm, jump_w < 0.5 * med_z[None], True)) \
        & jnp.all(jnp.where(okm, ang_w < jnp.float32(0.61), True)) \
        & jnp.all(jnp.isfinite(R_new)) & jnp.all(jnp.isfinite(t_new))
    okw = (kf_ok & ba_ok)[:, None, None, None]
    kfs = kfs._replace(
        R=kfs.R.at[ring].set(jnp.where(okw, R_new, kfs.R[ring])),
        t=kfs.t.at[ring].set(jnp.where(okw[..., 0], t_new, kfs.t[ring])))
    P = mappts.xyz.shape[0]
    same = (mappts.gen == gen0) if gen0 is not None else jnp.ones((P,), bool)
    xyz = jnp.where((same & ba_ok)[:, None], X_res, mappts.xyz)
    # outlier -> setFalse (Meas2D.outlier protocol,
    # SL_CoSLAMRobustBA.cpp:296-309), hardened two ways the reference
    # doesn't need (its robust BA runs after pose-graph-corrected poses):
    #  - majority rule: a point dies only if MOST of its window
    #    observations are outliers — one bad observation at one glitched
    #    keyframe is that observation's fault, not the point's;
    #  - mass-kill guard: if the solve would condemn a large fraction of
    #    the participating points, the SOLVE failed (bad gauge keyframe,
    #    degenerate low-parallax window) — committing the kills would
    #    destroy the live map and end tracking, so no kills are applied.
    alive = mappts.status == ST_ALIVE
    kill = (2 * n_bad > n_obs) & (n_obs > 0) & same & alive
    n_part = jnp.sum((n_obs > 0) & alive)
    solve_sane = (jnp.sum(kill) * 10 <= n_part * 3) & ba_ok
    status = jnp.where(kill & solve_sane, ST_FALSE, mappts.status)
    mappts = mappts._replace(xyz=xyz, status=status)
    newest = ring[W - 1]
    R_old = state.kfs.R[newest]
    t_old = state.kfs.t[newest]
    R_upd = kfs.R[newest]
    t_upd = kfs.t[newest]
    from coslam_tpu.geometry.se3 import orthonormalize_fast
    D_R = orthonormalize_fast(jnp.einsum("cji,cjk->cik", R_old, R_upd))
    D_t = jnp.einsum("cji,cj->ci", R_old, t_upd - t_old)
    R_cur = orthonormalize_fast(jnp.einsum("cij,cjk->cik", state.R, D_R))
    t_cur = jnp.einsum("cij,cj->ci", state.R, D_t) + state.t
    ph_R = orthonormalize_fast(
        jnp.einsum("ctij,cjk->ctik", state.pose_hist_R, D_R))
    ph_t = jnp.einsum("ctij,cj->cti", state.pose_hist_R, D_t) \
        + state.pose_hist_t
    phl_R = orthonormalize_fast(
        jnp.einsum("ctij,cjk->ctik", state.pose_hist_long_R, D_R))
    phl_t = jnp.einsum("ctij,cj->cti", state.pose_hist_long_R, D_t) \
        + state.pose_hist_long_t
    return state._replace(R=R_cur, t=t_cur, kfs=kfs, mappts=mappts,
                          pose_hist_R=ph_R, pose_hist_t=ph_t,
                          pose_hist_long_R=phl_R, pose_hist_long_t=phl_t)


@partial(jax.jit, static_argnames=("cfg",))
def apply_ba_results(state: SlamState, prob: BAProblem, res: BAResult,
                     ring: jnp.ndarray, kf_ok: jnp.ndarray,
                     cfg: SlamConfig,
                     gen0: jnp.ndarray | None = None) -> SlamState:
    """Write back BA-corrected keyframe poses and points; flag outlier
    points false (the Meas2D.outlier -> setFalse protocol,
    SL_CoSLAMRobustBA.cpp:296-309); rigidly carry the newest keyframe's
    correction onto the live pose and pose history.

    ``gen0``: map-slot generations at BA *dispatch* time. For deferred
    (asynchronous) application, point slots reclaimed and re-minted while
    the solve was in flight are skipped — the device-native analogue of
    the reference's mutex-guarded deferred write-back
    (_bundleAdjustmentThread, SL_CoSLAM.cpp:1702-1730).
    """
    P = state.mappts.xyz.shape[0]
    n_bad = jax.ops.segment_sum(res.obs_outlier.astype(jnp.int32),
                                prob.obs_pt, num_segments=P)
    n_obs = jax.ops.segment_sum(prob.obs_valid.astype(jnp.int32),
                                prob.obs_pt, num_segments=P)
    return _apply_ba_core(state, res.R, res.t, res.X, n_bad, n_obs,
                          ring, kf_ok, cfg, gen0)


@jax.jit
def push_pose_history(state: SlamState) -> SlamState:
    """Record the current pose into the ring slot for the current frame
    (call after pose_update, aligned with the track-history write)."""
    from coslam_tpu.slam.state import LONG_STRIDE
    T = state.pose_hist_R.shape[1]
    s = jnp.mod(state.frame, T)
    TL = state.pose_hist_long_R.shape[1]
    sl = jnp.mod(state.frame // LONG_STRIDE, TL)
    wr = jnp.mod(state.frame, LONG_STRIDE) == 0
    return state._replace(
        pose_hist_R=state.pose_hist_R.at[:, s].set(state.R),
        pose_hist_t=state.pose_hist_t.at[:, s].set(state.t),
        pose_hist_long_R=state.pose_hist_long_R.at[:, sl].set(
            jnp.where(wr, state.R, state.pose_hist_long_R[:, sl])),
        pose_hist_long_t=state.pose_hist_long_t.at[:, sl].set(
            jnp.where(wr, state.t, state.pose_hist_long_t[:, sl])))


@partial(jax.jit, static_argnames=("cfg",))
def lifecycle_update(mappts: MapPoints, frame: jnp.ndarray,
                     cfg: SlamConfig) -> MapPoints:
    """cur -> active -> inactive migration is implicit (derived from
    last_obs); false points are reclaimed as free slots (mapStateUpdate +
    releaseFeatPts role, SL_CoSLAM.cpp:1176-1223,1786-1799)."""
    status = jnp.where(mappts.status == ST_FALSE, ST_FREE, mappts.status)
    return mappts._replace(status=status)
