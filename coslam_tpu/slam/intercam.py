"""Inter-camera collaboration: cross-camera mapping, point registration,
and the joint multi-camera pose fallback.

Replaces three reference subsystems (SURVEY.md §2.5):
  - ``NewMapPtsNCC`` (SL_NewMapPointsInterCam.cpp): for adjacent camera
    pairs within a group, match unmapped current-frame features via
    epipolar+NCC matrices, triangulate, gate, and push new map points
    observed by both cameras.
  - the registration family ``activeMapPointsRegister`` /
    ``currentMapPointsRegister`` (SL_CoSLAM.cpp:731-1175): re-acquire
    dormant/unseen map points by projecting them into each camera and
    NCC-matching stored appearance blocks against unmapped features.
  - ``InterCamPoseEstimator`` (SL_InterCamPoseEstimator.cpp): when any
    camera's static support collapses, solve ALL cameras jointly with a
    robust BA that keeps static points fixed and lets dynamic points act
    as structure help — the paper's core collaboration mechanism.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry.camera import (pixel_to_normalized, project_points)
from coslam_tpu.geometry.epipolar import fundamental_from_poses
from coslam_tpu.geometry.triangulate import (triangulate_two_view_midpoint,
                                             triangulation_cov)
from coslam_tpu.ops.matching import guided_match, greedy_mutual_match
from coslam_tpu.ops.ncc import extract_ncc_blocks, NCC_INVALID
from coslam_tpu.solvers.ba import BAProblem, bundle_adjust
from coslam_tpu.slam.state import (SlamState, MapPoints, ST_FREE, ST_ALIVE,
                                   PT_STATIC, PT_DYNAMIC)
from coslam_tpu.slam.steps import choose_grid_features


def _alloc_slots(mappts: MapPoints, want: jnp.ndarray):
    """Allocate map slots for ``want`` [M] flags. Returns slot ids [M]
    (= P where dropped) and the updated free-rank bookkeeping inputs."""
    from coslam_tpu.slam.steps import _rank_to_index
    P = mappts.xyz.shape[0]
    free = mappts.status == ST_FREE
    idx_of_rank = _rank_to_index(free)
    rank = jnp.cumsum(want) - 1
    slot = idx_of_rank[jnp.clip(rank, 0, P - 1)]
    can = want & (slot < P)
    slot = jnp.where(can, slot, P)
    return slot, can


@partial(jax.jit, static_argnames=("cfg", "cams"))
def intercam_map_group(state: SlamState, pyr_cur, K: jnp.ndarray,
                       kc: jnp.ndarray, cams: tuple, cfg: SlamConfig):
    """Multi-view inter-camera mapping over a whole camera group.

    The reference chains pairwise epipolar+NCC matches along the group
    order into >=2-view feature tracks (featTracksFromMatches,
    SL_NewMapPointsInterCam.cpp:158), triangulates them multi-view
    (:224,631), and types each new point by its dynamic neighborhood
    (decidePointType, :25-91). Here the chains are index-propagation
    arrays over the static group tuple, triangulation is the lane-major
    multiview DLT, and the neighborhood test is a masked min-distance
    reduction per view. Returns (mappts', tracks', n_new)."""
    from coslam_tpu.ops.ncc import extract_ncc_blocks_batched
    from coslam_tpu.geometry.triangulate import (triangulate_multiview_ln,
                                                 inv3x3_sym_ln)
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    P = mappts.xyz.shape[0]
    G = len(cams)
    p = cfg.p
    blocks_all, ok_all = extract_ncc_blocks_batched(
        pyr_cur.imgs[0], tracks.raw, p.ncc_patch_radius)
    free = [tracks.valid[c] & (tracks.mpt[c] < 0) & ok_all[c]
            & (tracks.dyn_votes[c] < 3) for c in cams]
    # adjacent-pair guided matches along the group order
    links = []
    for g in range(G - 1):
        a, b = cams[g], cams[g + 1]
        F = fundamental_from_poses(K[a], state.R[a], state.t[a],
                                   K[b], state.R[b], state.t[b])
        m = guided_match(blocks_all[a], blocks_all[b], free[g], free[g + 1],
                         tracks.pos[a], tracks.pos[b], F=F,
                         max_epi=p.max_epi_err, min_ncc=p.ncc_min_score)
        links.append(m.a_to_b)                     # [N] -> cam b index | -1
    # chain the links into tracks: each chain is rooted at the first
    # group camera where its feature appears; roots are features that are
    # not the target of the previous link (so every chain minted once)
    M = (G - 1) * N
    arangeN = jnp.arange(N, dtype=jnp.int32)
    fidx = jnp.full((G, G - 1, N), -1, jnp.int32)  # [view, root-set, feat]
    for r in range(G - 1):
        if r > 0:
            lk = links[r - 1]
            is_target = jnp.zeros((N,), bool).at[
                jnp.where(lk >= 0, lk, N)].set(True, mode="drop")
        else:
            is_target = jnp.zeros((N,), bool)
        cur = jnp.where(free[r] & ~is_target & (links[r] >= 0), arangeN, -1)
        fidx = fidx.at[r, r].set(cur)
        for g in range(r, G - 1):
            cur = jnp.where(cur >= 0, links[g][jnp.clip(cur, 0)], -1)
            fidx = fidx.at[g + 1, r].set(cur)
    fidx = fidx.reshape(G, M)                      # [G, M]
    obs_ok = fidx >= 0
    fsl = jnp.clip(fidx, 0)
    px = jnp.stack([tracks.pos[c][fsl[g]]
                    for g, c in enumerate(cams)])  # [G, M, 2]
    # lane-major multiview triangulation
    Rg = jnp.stack([state.R[c] for c in cams])
    tg = jnp.stack([state.t[c] for c in cams])
    Kg = jnp.stack([K[c] for c in cams])
    fx, fy = Kg[:, 0, 0], Kg[:, 1, 1]
    cx, cy = Kg[:, 0, 2], Kg[:, 1, 2]
    pxT = px.transpose(0, 2, 1)                    # [G, 2, M]
    xnT = jnp.stack([(pxT[:, 0] - cx[:, None]) / fx[:, None],
                     (pxT[:, 1] - cy[:, None]) / fy[:, None]], axis=1)
    X_ln, _ = triangulate_multiview_ln(Rg, tg, xnT, obs_ok)   # [3, M]
    dt = X_ln.dtype
    max_err = jnp.zeros((M,), dt)
    depth_ok = jnp.ones((M,), bool)
    Hpx = [[jnp.full((M,), 1e-9 if i == j else 0.0, dt) for j in range(3)]
           for i in range(3)]
    for g in range(G):
        R, t = Rg[g], tg[g]
        Xc = [R[i, 0] * X_ln[0] + R[i, 1] * X_ln[1] + R[i, 2] * X_ln[2]
              + t[i] for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = fx[g] * Xc[0] * zi + cx[g]
        v = fy[g] * Xc[1] * zi + cy[g]
        e = jnp.hypot(u - pxT[g, 0], v - pxT[g, 1])
        max_err = jnp.maximum(max_err, jnp.where(obs_ok[g], e, 0.0))
        depth_ok = depth_ok & jnp.where(obs_ok[g], z > 1e-3, True)
        xz = Xc[0] * zi
        yz = Xc[1] * zi
        Ju = [fx[g] * (R[0, j] - xz * R[2, j]) * zi for j in range(3)]
        Jv = [fy[g] * (R[1, j] - yz * R[2, j]) * zi for j in range(3)]
        w = obs_ok[g].astype(dt)
        for i in range(3):
            for j in range(i + 1):
                Hpx[i][j] = Hpx[i][j] + w * (Ju[i] * Ju[j] + Jv[i] * Jv[j])
    # parallax: widest angle between point->camera-center directions
    centers = -jnp.einsum("gji,gj->gi", Rg, tg)    # [G, 3]
    dirs = []
    for g in range(G):
        d = [X_ln[i] - centers[g, i] for i in range(3)]
        nrm = jnp.sqrt(d[0] ** 2 + d[1] ** 2 + d[2] ** 2 + 1e-18)
        dirs.append([d[i] / nrm for i in range(3)])
    min_cos = jnp.ones((M,), dt)
    for g1 in range(G):
        for g2 in range(g1 + 1, G):
            cth = jnp.abs(sum(dirs[g1][i] * dirs[g2][i] for i in range(3)))
            both = obs_ok[g1] & obs_ok[g2]
            min_cos = jnp.minimum(min_cos, jnp.where(both, cth, 1.0))
    max_cos = jnp.cos(jnp.deg2rad(p.new_point_min_parallax_deg))
    fin = jnp.isfinite(X_ln[0]) & jnp.isfinite(X_ln[1]) & jnp.isfinite(X_ln[2])
    good = (jnp.sum(obs_ok, axis=0) >= 2) & depth_ok & fin & \
        (max_err < p.reproj_new_point_gate) & (min_cos < max_cos)
    # decidePointType: near a dynamic feature in any observing view ->
    # the new point belongs to the moving object, mint it dynamic
    near_dyn = jnp.zeros((M,), bool)
    # Chebyshev (square-mask) neighborhood: the reference builds a
    # (2*hw+1)^2 square mask around each feature bound to a MAPPED
    # dynamic point (hw=20, getMappedDynPts,
    # SL_NewMapPointsInterCam.cpp:25-91) — vote-only dynamic features do
    # NOT mask (votes spike spuriously during pose drift; masking on them
    # starves the static map of new points exactly when it needs them)
    r = p.dyn_neighborhood_px
    for g, c in enumerate(cams):
        mic = jnp.clip(tracks.mpt[c], 0)
        dyn_feat = tracks.valid[c] & (
            (tracks.mpt[c] >= 0) & (mappts.status[mic] == ST_ALIVE)
            & (mappts.ptype[mic] == PT_DYNAMIC))
        dch = jnp.maximum(
            jnp.abs(px[g][:, None, 0] - tracks.pos[c][None, :, 0]),
            jnp.abs(px[g][:, None, 1] - tracks.pos[c][None, :, 1]))
        dmin = jnp.min(jnp.where(dyn_feat[None, :], dch, jnp.inf), axis=1)
        near_dyn = near_dyn | (obs_ok[g] & (dmin <= r))
    # allocate + write
    slot, can = _alloc_slots(mappts, good)
    X_new = X_ln.T                                 # [M, 3]
    Hinv = inv3x3_sym_ln(Hpx)
    covs = jnp.stack([jnp.stack(row) for row in Hinv]) \
        .transpose(2, 0, 1) * p.pixel_err_var      # [M, 3, 3]
    import numpy as _np
    owner_m = jnp.asarray(_np.repeat(_np.asarray(cams[:G - 1], _np.int32), N))
    ptype_new = jnp.where(near_dyn, PT_DYNAMIC, PT_STATIC).astype(jnp.int32)
    mp = mappts._replace(
        xyz=mappts.xyz.at[slot].set(X_new, mode="drop"),
        cov=mappts.cov.at[slot].set(covs, mode="drop"),
        gen=mappts.gen.at[slot].add(1, mode="drop"),
        status=mappts.status.at[slot].set(ST_ALIVE, mode="drop"),
        ptype=mappts.ptype.at[slot].set(ptype_new, mode="drop"),
        first_frame=mappts.first_frame.at[slot].set(state.frame, mode="drop"),
        last_obs=mappts.last_obs.at[slot].set(state.frame, mode="drop"),
        bad_votes=mappts.bad_votes.at[slot].set(0, mode="drop"),
        moved_votes=mappts.moved_votes.at[slot].set(0, mode="drop"),
        owner=mappts.owner.at[slot].set(owner_m, mode="drop"))
    mpt = tracks.mpt
    slot_i32 = jnp.where(can, slot, 0).astype(jnp.int32)
    for g, c in enumerate(cams):
        use = obs_ok[g] & can
        tgt = jnp.where(use, fsl[g], N)
        mpt = mpt.at[c, tgt].set(jnp.where(use, slot_i32, 0), mode="drop")
        pslot = jnp.where(use, slot, P)
        mp = mp._replace(
            ncc=mp.ncc.at[pslot, c].set(blocks_all[c][fsl[g]], mode="drop"),
            ncc_valid=mp.ncc_valid.at[pslot, c].set(
                ok_all[c][fsl[g]], mode="drop"))
    tracks = tracks._replace(mpt=mpt)
    return mp, tracks, jnp.sum(can)


@partial(jax.jit,
         static_argnames=("cfg", "gate_scale", "min_score", "steal_young"))
def register_map_points(state: SlamState, pyr_cur, K: jnp.ndarray,
                        cfg: SlamConfig, max_age: int | None = None,
                        gate_scale: float = 1.0,
                        min_age: int | None = None,
                        min_score: float | None = None,
                        steal_young: bool = False):
    """Re-acquire unseen alive points per camera by projection + NCC
    (activeMapPointsRegister, SL_CoSLAM.cpp:1037-1109). Binds unmapped
    features to points whose projection lands within the error gate and
    whose stored appearance matches. ``min_age`` restricts candidates to
    dormant points (loop-closure re-acquisition); with ``steal_young``,
    features bound to points younger than ``min_age`` are also eligible —
    on a revisit, the re-entered structure has usually been re-mapped as
    fresh duplicates before the closure runs, and the dormant original
    must win those features back."""
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    P = mappts.xyz.shape[0]
    p = cfg.p
    gate = jnp.sqrt(p.pixel_err_var) * 3.0 * gate_scale
    alive = (mappts.status == ST_ALIVE) & (mappts.ptype == PT_STATIC)
    if max_age is not None:
        alive = alive & (state.frame - mappts.last_obs <= max_age)
    if min_age is not None:
        alive = alive & (state.frame - mappts.last_obs >= min_age)
    # registration stays within the camera group (the reference registers
    # per group; cross-group re-acquisition is the merge machinery's job)
    owner_grp = state.group_id[jnp.clip(mappts.owner, 0, C - 1)]
    mpt = tracks.mpt
    n_new = jnp.zeros((), jnp.int32)
    from coslam_tpu.ops.ncc import extract_ncc_blocks_batched
    blocks_all, ok_all = extract_ncc_blocks_batched(
        pyr_cur.imgs[0], tracks.raw, p.ncc_patch_radius)
    for c in range(C):
        # points already observed by camera c are excluded
        seen = jnp.zeros((P,), bool).at[
            jnp.where(tracks.valid[c] & (mpt[c] >= 0), mpt[c], P)
        ].set(True, mode="drop")
        cand_p = alive & ~seen & mappts.ncc_valid[:, c] \
            & (owner_grp == state.group_id[c])
        pr = project_points(K[c], state.R[c], state.t[c], mappts.xyz)
        blocks_f, ok_f = blocks_all[c], ok_all[c]
        free_f = tracks.valid[c] & (mpt[c] < 0) & ok_f
        if steal_young and min_age is not None:
            mic = jnp.clip(mpt[c], 0)
            young = (mpt[c] >= 0) & \
                (mappts.first_frame[mic] > state.frame - min_age)
            free_f = tracks.valid[c] & ok_f & ((mpt[c] < 0) | young)
        # score matrix [P, N]: NCC of stored blocks vs current features,
        # masked by projection distance
        s = jnp.dot(mappts.ncc[:, c], blocks_f.T,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
        dist = jnp.linalg.norm(pr[:, None, :] - tracks.pos[c][None], axis=-1)
        bad = ~(cand_p[:, None] & free_f[None, :]) | (dist > gate)
        s = jnp.where(bad, NCC_INVALID, s)
        mres = greedy_mutual_match(
            s, min_score=p.ncc_min_score if min_score is None else min_score,
            rounds=4)
        got = mres.a_to_b >= 0                       # [P]
        fsl = jnp.clip(mres.a_to_b, 0)
        mpt = mpt.at[c, fsl].set(
            jnp.where(got, jnp.arange(P), mpt[c, fsl]).astype(jnp.int32),
            mode="drop")
        n_new = n_new + jnp.sum(got)
    return state._replace(tracks=tracks._replace(mpt=mpt)), n_new


@partial(jax.jit, static_argnames=("cfg",))
def joint_pose_update(state: SlamState, K: jnp.ndarray, cfg: SlamConfig,
                      img_hw=None):
    """InterCamPoseEstimator: one robust BA over all cameras at the current
    frame — static points fixed (one grid-chosen measurement each),
    dynamic points free with all their current views (structure help).
    Returns (R, t)."""
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    P = mappts.xyz.shape[0]
    p = cfg.p
    mi = jnp.clip(tracks.mpt, 0)
    mapped = tracks.valid & (tracks.mpt >= 0) & (mappts.status[mi] == ST_ALIVE)
    is_static = mapped & (mappts.ptype[mi] == PT_STATIC)
    is_dyn = mapped & (mappts.ptype[mi] == PT_DYNAMIC)
    dyn_pt = jnp.zeros((P,), bool).at[
        jnp.where(is_dyn, tracks.mpt, P)].set(True, mode="drop")
    # cap the dynamic structure-help points at dyn_max_points (the
    # reference collects at most 60, SL_InterCamPoseEstimator.cpp:18-91)
    dyn_rank = jnp.cumsum(dyn_pt) - 1
    dyn_pt = dyn_pt & (dyn_rank < p.dyn_max_points)
    is_dyn = is_dyn & dyn_pt[mi]
    obs_valid = (is_static | is_dyn).reshape(C * N)
    obs_cam = jnp.broadcast_to(jnp.arange(C)[:, None], (C, N)).reshape(-1)
    obs_pt = mi.reshape(-1)
    obs_px = tracks.pos.reshape(C * N, 2)
    prob = BAProblem(
        K=K, R=state.R, t=state.t, X=mappts.xyz,
        obs_cam=obs_cam.astype(jnp.int32), obs_pt=obs_pt.astype(jnp.int32),
        obs_px=obs_px, obs_valid=obs_valid,
        cam_fixed=jnp.zeros((C,), bool),
        point_fixed=~dyn_pt)          # static structure fixed, dynamic free
    res = bundle_adjust(prob, max_err=p.max_err, max_iter=3, inner_iter=15)
    ok = jnp.all(jnp.isfinite(res.R)) & jnp.all(jnp.isfinite(res.t))
    R = jnp.where(ok, res.R, state.R)
    t = jnp.where(ok, res.t, state.t)
    return R, t
