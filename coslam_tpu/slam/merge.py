"""Camera-group merge: overlap detection, wide-baseline re-matching,
pose-graph realignment with unknown-scale merge edges, duplicate fusion.

Replaces ``MergeCameraGroup`` (reference: SL_MergeCameraGroup.h:85-248,
.cpp — candidate detection by mutual map-point projection overlap +
camera distance :56-177, SURF+E-matrix matching between the bridging
cameras :190-421, duplicate map-point fusion :425-520, pose graph with
``uncertainScale`` merge edges solved for rotations then translations
with a unified scale :884-1116, group-set merging :1117-1174).

Group SPLIT is implicit here exactly as in the reference: camera_grouping
recomputes connected components every few frames, so groups fall apart
when view overlap dies (SL_CoSLAM.cpp:1632-1697).

Design deltas: SURF -> NCC corner matching (as in init); instead of
rebuilding per-camera all-frame graphs, the realignment is applied as the
rigid transform implied by the solved bridging pose to the whole moving
group's state (poses, histories, keyframes, owned map points) — the same
fixed-scale-gauge correction, expressed functionally.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry import camera as cam
from coslam_tpu.geometry import epipolar
from coslam_tpu.geometry.se3 import (relative_pose, orthonormalize_fast,
                                     se3_exp, se3_log)
from coslam_tpu.ops.matching import guided_match
from coslam_tpu.ops.ncc import extract_ncc_blocks
from coslam_tpu.slam.state import SlamState, ST_ALIVE, ST_FALSE, PT_STATIC
from coslam_tpu.solvers.pose_graph import (PoseGraph, solve_rotations,
                                           solve_translations)


class MergeCandidate(NamedTuple):
    cam_a: int      # camera in the anchor group
    cam_b: int      # camera in the moving group
    overlap: int


from functools import partial as _jit_partial


@_jit_partial(jax.jit, static_argnames=("h", "w", "dormant_age"))
def scan_candidates_device(state: SlamState, K: jnp.ndarray,
                           h: int, w: int, dormant_age: int):
    """Small device-side reduction feeding the merge/loop candidate scans.

    Pulling the whole map (xyz/status/owner/...) to host every few frames
    costs multiple multi-ms transfers over the TPU tunnel; this computes
    the cheap superset tests on device and transfers only [C, C] + [C] +
    [C] scalars. Returns:
      merge_counts [C, C]: alive static points owned by camera j
                           projecting inside camera i's image
      alive_per_owner [C]: alive static points per owner camera
      dormant_counts [C]:  dormant (unseen >= dormant_age) alive static
                           points projecting inside each camera
    """
    mp = state.mappts
    C = state.R.shape[0]
    alive = (mp.status == ST_ALIVE) & (mp.ptype == PT_STATIC)
    Xc = jnp.einsum("cij,pj->cpi", state.R, mp.xyz) + state.t[:, None, :]
    z = Xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = Xc[..., 0] * zi * K[:, 0, 0, None] + K[:, 0, 2, None]
    v = Xc[..., 1] * zi * K[:, 1, 1, None] + K[:, 1, 2, None]
    inside = alive[None] & (z > 1e-3) & (u >= 0) & (u < w) & \
        (v >= 0) & (v < h)
    own = jax.nn.one_hot(jnp.clip(mp.owner, 0, C - 1), C,
                         dtype=jnp.float32) * alive[:, None].astype(
                             jnp.float32)
    merge_counts = jnp.dot(inside.astype(jnp.float32), own)
    dormant = alive & (state.frame - mp.last_obs >= dormant_age)
    dormant_counts = jnp.sum(inside & dormant[None], axis=1)
    return merge_counts, jnp.sum(own, axis=0), dormant_counts


def find_merge_candidates(state: SlamState, cfg: SlamConfig,
                          group_id: np.ndarray) -> list[MergeCandidate]:
    """checkPossibleMergable: for cameras in different groups, count each
    other's alive static points that project inside the image with
    positive depth, and gate on camera distance."""
    p = cfg.p
    C = cfg.num_cameras
    h, w = cfg.image_height, cfg.image_width
    mp = state.mappts
    alive = np.asarray((mp.status == ST_ALIVE) & (mp.ptype == PT_STATIC))
    owner = np.asarray(mp.owner)
    xyz = np.asarray(mp.xyz)
    R = np.asarray(state.R)
    t = np.asarray(state.t)
    centers = -np.einsum("cji,cj->ci", R, t)
    out = []
    for a in range(C):
        for b in range(C):
            if group_id[a] == group_id[b]:
                continue
            # points owned by b's group, projected into camera a
            own_b = alive & (group_id[owner] == group_id[b])
            if own_b.sum() < p.merge_overlap_min:
                continue
            Xb = xyz[own_b]
            Xc = Xb @ R[a].T + t[a]
            z = Xc[:, 2]
            ok = z > 1e-3
            # med-depth distance gate (checkCamDist, maxDistRatio)
            med_z = np.median(z[ok]) if ok.any() else np.inf
            if np.linalg.norm(centers[a] - centers[b]) > \
                    p.max_dist_ratio * max(med_z, 1e-3):
                continue
            out.append((a, b, Xc, ok))
    return out


def projected_overlap(K, Xc, ok, h, w, feat_hull=None):
    """Count points projecting into camera a's view. When ``feat_hull`` (a
    CCW polygon of the camera's live feature positions) is given, the test
    is containment in that hull — the reference's checkViewOverlap builds a
    convex-hull mask of the viewing camera's features and counts the other
    group's projections inside it (SL_MergeCameraGroup.cpp:103-141), which
    rejects overlaps where the projections land on untracked image regions.
    """
    z = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    u = Xc[:, 0] / z * K[0, 0] + K[0, 2]
    v = Xc[:, 1] / z * K[1, 1] + K[1, 2]
    inside = ok & (u >= 0) & (u < w) & (v >= 0) & (v < h)
    if feat_hull is not None and len(feat_hull) >= 3:
        from coslam_tpu.geometry.hull import points_in_hull
        inside = inside & points_in_hull(np.stack([u, v], -1), feat_hull)
    return int(inside.sum())


def merge_candidates(state: SlamState, cfg: SlamConfig, K: np.ndarray,
                     group_id: np.ndarray) -> list[MergeCandidate]:
    from coslam_tpu.geometry.hull import convex_hull
    cands = []
    h, w = cfg.image_height, cfg.image_width
    pos = np.asarray(state.tracks.pos)
    tvalid = np.asarray(state.tracks.valid)
    hulls = [convex_hull(pos[c][tvalid[c]]) if tvalid[c].sum() >= 3 else None
             for c in range(cfg.num_cameras)]
    for (a, b, Xc, ok) in find_merge_candidates(state, cfg, group_id):
        n = projected_overlap(K[a], Xc, ok, h, w, feat_hull=hulls[a])
        # absolute floor OR fraction of the other group's candidate points
        # (checkPossibleMergable's ">=50 inliers or >=ratio" test,
        # SL_MergeCameraGroup.cpp:56-177)
        n_cand = int(ok.sum())
        if n >= cfg.p.merge_overlap_min or \
                (n_cand > 0 and n / n_cand >= cfg.p.merge_overlap_ratio):
            cands.append(MergeCandidate(cam_a=a, cam_b=b, overlap=n))
    cands.sort(key=lambda c: -c.overlap)
    return cands


class MergeResult(NamedTuple):
    ok: bool
    state: SlamState
    scale: float          # metric bridge-baseline length
    n_matches: int
    scale_move: float = 1.0   # moving group's estimated map-scale drift
    noop: bool = False        # merged WITHOUT realignment (identity won)


def _dbg(*args):
    """Merge-gate tracing (set COSLAM_MERGE_DEBUG=1); silent by default."""
    import os
    if os.environ.get("COSLAM_MERGE_DEBUG"):
        print("[merge]", *args, flush=True)


def consensus_log_scale(ratio: np.ndarray, min_members: int = 8,
                        max_width: float = 0.45) -> float | None:
    """Robust scale from depth ratios: median of the densest half-window
    of log-ratios. A global MAD gate rejects the whole estimate when a
    MINORITY of mismatched pairs widens the spread — but the true pairs
    of a clean bridge cluster tightly, so find the tightest window
    holding at least half (and >= ``min_members``) of the samples and
    require only ITS width to be small. Returns None when no such
    cluster exists (a genuinely mismatched bridge has near-uniform
    log-ratios)."""
    ratio = ratio[np.isfinite(ratio) & (ratio > 0)]
    if len(ratio) < min_members:
        return None
    lr = np.sort(np.log(ratio))
    k = max(min_members, (len(lr) + 1) // 2)
    if len(lr) < k:
        return None
    widths = lr[k - 1:] - lr[:len(lr) - k + 1]
    i = int(np.argmin(widths))
    if float(widths[i]) > max_width:
        return None
    return float(np.exp(np.median(lr[i:i + k])))


def merge_groups(state: SlamState, cfg: SlamConfig, pyr, K, kc,
                 group_id: np.ndarray, cand: MergeCandidate,
                 f_sep: int | None = None) -> MergeResult:
    """Estimate the bridging relative pose (NCC match + E-RANSAC), solve
    the pose graph with an unknown-scale merge edge, and realign the
    moving group's entire state. ``f_sep`` = last co-grouped frame; the
    realignment ramps from identity there to the full correction now."""
    p = cfg.p
    C = cfg.num_cameras
    a, b = cand.cam_a, cand.cam_b
    tracks = state.tracks
    # wide-baseline matching between the bridging cameras. Features that
    # look dynamic are EXCLUDED from the bridge: a mover crossing the
    # shared view (the very thing that splits groups in the dynamic
    # scenario) would otherwise dominate the matches and poison the
    # E-geometry and the scale evidence — the realignment must be
    # estimated on the static world only (the reference matches SURF
    # against the full frame but gates candidates through static map
    # projections, SL_MergeCameraGroup.cpp:262-307; same exclusion as
    # new-point minting, steps.py chooses static-only there too).
    from coslam_tpu.slam.state import PT_DYNAMIC
    mp0 = state.mappts
    mi_all = jnp.clip(tracks.mpt, 0)
    mapped_dyn = (tracks.mpt >= 0) & \
        (mp0.ptype[mi_all] == PT_DYNAMIC) & \
        (mp0.status[mi_all] == ST_ALIVE)
    static_feat = tracks.valid & (tracks.dyn_votes < 3) & ~mapped_dyn
    blocks_a, ok_a = extract_ncc_blocks(pyr.imgs[0][a], tracks.raw[a],
                                        p.ncc_patch_radius)
    blocks_b, ok_b = extract_ncc_blocks(pyr.imgs[0][b], tracks.raw[b],
                                        p.ncc_patch_radius)
    # disparity prior: the bridging cameras are one physical rig's
    # cameras looking at a shared scene, so TRUE correspondences lie
    # within a bounded pixel disparity regardless of how wrong the
    # drifted/stale POSE estimates are (pixel positions are
    # pose-independent). Unguided mutual-best NCC on repetitive texture
    # measured only ~20% correct with wrong matches spread ~100+ px —
    # the bound removes most of them before they can starve the PnP
    # floor (the reference's checkViewOverlap distance gates play the
    # same role, SL_MergeCameraGroup.cpp:56-177).
    # (measured on the occlusion scenario: true correspondences sit at
    # ~0.1-0.15 image widths of disparity, wrong mutual-best matches at
    # ~0.3-0.5 — 0.3*W keeps essentially all true pairs)
    m = guided_match(blocks_a, blocks_b, ok_a & static_feat[a],
                     ok_b & static_feat[b], tracks.pos[a], tracks.pos[b],
                     F=None, min_ncc=p.ncc_min_score, rounds=8,
                     max_disparity=0.3 * cfg.image_width)
    sel = np.asarray(m.a_to_b)
    pairs = np.nonzero(sel >= 0)[0]
    if len(pairs) < 16:
        _dbg(f"reject: {len(pairs)} NCC pairs < 16")
        return MergeResult(False, state, 1.0, len(pairs))
    # Bridge pose by PnP on the ANCHOR MAP: matched cam_a features bound
    # to anchor-group map points are metric 3D anchors observed by camera
    # b — solve b's metric pose directly (RANSAC-DLT + Tukey-IRLS
    # polish). This replaces an earlier E-matrix + depth-ratio-scale
    # bridge: racing 8-pt/5-pt models by inlier count is blind to planar
    # degeneracy (a wall-dominated bridge lets a homography-compatible F
    # win with garbage triangulated depths), while PnP against the map
    # has no scale ambiguity and the SE(3) IRLS polish is well-posed on
    # planar scenes. (Reference role: the SURF+E bridge is immediately
    # backed by fused map points + local BA carrying this same metric
    # information, SL_MergeCameraGroup.cpp:190-421,557-725.)
    mpt_a = np.asarray(tracks.mpt)[a][pairs]
    mp = state.mappts
    alive_pt = (np.asarray(mp.status) == ST_ALIVE) & \
        (np.asarray(mp.ptype) == PT_STATIC)
    grp_owner = group_id[np.clip(np.asarray(mp.owner), 0, C - 1)]
    bound = (mpt_a >= 0)
    bound &= alive_pt[np.clip(mpt_a, 0, None)]
    bound &= grp_owner[np.clip(mpt_a, 0, None)] == group_id[a]
    if int(bound.sum()) < 10:
        _dbg(f"reject: {int(bound.sum())} anchor-bound pairs < 10 "
             f"of {len(pairs)}")
        return MergeResult(False, state, 1.0, len(pairs))
    feats_a = pairs                       # downstream indexes [bound]
    # fixed-capacity padding for the device solvers: the bound-pair count
    # differs at EVERY attempt, and eager jax ops compile a fresh
    # executable per distinct shape — over the tunneled backend that is
    # ~15 s of hidden compile time per failed attempt (measured:
    # cad_merge was ~70% of a long split run's wall clock). Padding to
    # MAXB keeps one cached executable for every attempt; overflow keeps
    # the best-scored pairs.
    MAXB = 512
    bidx_all = np.nonzero(bound)[0]
    sc_all = np.asarray(m.score)[pairs[bound]]
    if len(bidx_all) > MAXB:
        keep = np.sort(np.argsort(-sc_all)[:MAXB])
        bound = np.zeros_like(bound)
        bound[bidx_all[keep]] = True
    nb = int(bound.sum())
    X_anchor = np.asarray(mp.xyz)[mpt_a[bound]]
    xn_b = np.asarray(cam.normalize_points(tracks.pos[b], K[b],
                                           kc[b]))[sel[pairs[bound]]]
    ncc_sc = np.asarray(m.score)[pairs[bound]]
    pad = MAXB - nb
    X_pad = np.pad(X_anchor.astype(np.float32), ((0, pad), (0, 0)))
    xn_pad = np.pad(xn_b.astype(np.float32), ((0, pad), (0, 0)))
    sc_pad = np.pad(ncc_sc.astype(np.float32), (0, pad),
                    constant_values=-2.0)
    mask_pad = np.arange(MAXB) < nb
    from coslam_tpu.geometry.pnp import ransac_pnp
    fpx = float(np.asarray(K[b])[0, 0])
    # 8px inlier gate: wide-baseline NCC matches against a drifted map
    # carry ~5-10px of noise (discrete corner positions + map drift) —
    # the IRLS polish and the post-merge joint BA tighten from there.
    # PROSAC-tiered sampling by NCC score (a repetitive-texture bridge
    # yields ~80% wrong mutual-best matches — uniform 6-point sampling
    # cannot survive that, while the top-matches-by-NCC tier measured
    # ~86% inliers on the same data). The current pose is deliberately
    # NOT seeded as a hypothesis here: the bridge must stay an
    # INDEPENDENT measurement of camera b against the anchor map (its
    # baseline is the sanity check, and the no-op test below compares
    # identity separately).
    res_pnp = ransac_pnp(
        jax.random.PRNGKey(int(state.frame)),
        jnp.asarray(X_pad), jnp.asarray(xn_pad),
        jnp.asarray(mask_pad), num_hypotheses=1024,
        thresh=8.0 / fpx, score=jnp.asarray(sc_pad))
    n_matches = int(res_pnp.num_inliers)
    if n_matches < 10:
        _dbg(f"reject: PnP inliers {n_matches} < 10 of {nb}")
        import os as _os
        if _os.environ.get("COSLAM_MERGE_DEBUG"):
            np.savez(f"/tmp/merge_reject_f{int(state.frame)}.npz",
                     X=X_anchor, xn_b=xn_b,
                     px_a=np.asarray(tracks.pos[a])[pairs[bound]],
                     px_b=np.asarray(tracks.pos[b])[sel[pairs[bound]]],
                     K_a=np.asarray(K[a]), K_b=np.asarray(K[b]),
                     R_a=np.asarray(state.R[a]), t_a=np.asarray(state.t[a]),
                     R_b=np.asarray(state.R[b]), t_b=np.asarray(state.t[b]))
        return MergeResult(False, state, 1.0, n_matches)
    from coslam_tpu.solvers.pose import irls_pose
    px_b = np.asarray(tracks.pos[b])[sel[pairs[bound]]]
    px_b_pad = np.pad(px_b.astype(np.float32), ((0, pad), (0, 0)))
    pol = irls_pose(K[b], res_pnp.R, res_pnp.t,
                    jnp.asarray(X_pad),
                    jnp.asarray(px_b_pad), res_pnp.inliers,
                    tau=float(p.max_err))
    R_b_pnp = np.asarray(pol.R)
    t_b_pnp = np.asarray(pol.t)
    if not (np.isfinite(R_b_pnp).all() and np.isfinite(t_b_pnp).all()):
        _dbg("reject: PnP polish not finite")
        return MergeResult(False, state, 1.0, n_matches)
    # pose graph: nodes = cameras; rigid chain edges inside each group from
    # current estimates; one metric merge edge a -> b from the PnP pose
    R = np.asarray(state.R)
    t = np.asarray(state.t)
    edges_i, edges_j, eR, et, sg = [], [], [], [], []
    for g in np.unique(group_id):
        cams = np.nonzero(group_id == g)[0]
        for k in range(len(cams) - 1):
            i, j = int(cams[k]), int(cams[k + 1])
            Rji, tji = relative_pose(jnp.asarray(R[i]), jnp.asarray(t[i]),
                                     jnp.asarray(R[j]), jnp.asarray(t[j]))
            edges_i.append(i)
            edges_j.append(j)
            eR.append(np.asarray(Rji))
            et.append(np.asarray(tji))
            sg.append(-1)
    R_ab, t_ab = relative_pose(jnp.asarray(R[a]), jnp.asarray(t[a]),
                               jnp.asarray(R_b_pnp), jnp.asarray(t_b_pnp))
    scale = float(np.linalg.norm(np.asarray(t_ab)))   # bridge baseline
    edges_i.append(a)
    edges_j.append(b)
    eR.append(np.asarray(R_ab))
    et.append(np.asarray(t_ab))
    sg.append(-1)    # metric edge: PnP pose carries the map's scale
    fixed = group_id == group_id[a]          # anchor group stays put
    E = len(edges_i)
    pg = PoseGraph(
        edge_i=jnp.asarray(np.array(edges_i, np.int32)),
        edge_j=jnp.asarray(np.array(edges_j, np.int32)),
        edge_R=jnp.asarray(np.stack(eR).astype(np.float32)),
        edge_t=jnp.asarray(np.stack(et).astype(np.float32)),
        edge_valid=jnp.ones(E, bool),
        edge_weight=jnp.ones(E, jnp.float32),
        scale_group=jnp.asarray(np.array(sg, np.int32)),
        fixed=jnp.asarray(fixed),
        fixed_R=jnp.asarray(R), fixed_t=jnp.asarray(t),
        node_valid=jnp.ones(C, bool))
    R_sol = solve_rotations(pg)
    t_sol, scales = solve_translations(pg, R_sol, num_scales=1)
    if not bool(jnp.all(jnp.isfinite(R_sol)) & jnp.all(jnp.isfinite(t_sol))):
        _dbg("reject: pose-graph solution not finite")
        return MergeResult(False, state, 1.0, n_matches)
    # geometric verification BEFORE committing: the anchor-bound map points
    # must reproject onto camera b's matched features under b's solved
    # pose. A bad bridge (wrong scale / wrong E decomposition) fails this
    # loudly; committing it would corrupt the moving group's entire state.
    Xm_v = np.asarray(mp.xyz)[mpt_a[bound]]
    pos_b = np.asarray(tracks.pos[b])[sel[feats_a][bound]]
    R_b_new = np.asarray(R_sol[cand.cam_b])
    t_b_new = np.asarray(t_sol[cand.cam_b])
    K_b = np.asarray(K[b])

    def _reproj_err(R_h, t_h):
        """Full-length per-pair error (inf where behind the camera)."""
        Xc_h = Xm_v @ R_h.T + t_h
        z_h = np.where(np.abs(Xc_h[:, 2]) < 1e-9, 1e-9, Xc_h[:, 2])
        u_h = Xc_h[:, 0] / z_h * K_b[0, 0] + K_b[0, 2]
        v_h = Xc_h[:, 1] / z_h * K_b[1, 1] + K_b[1, 2]
        e_h = np.hypot(u_h - pos_b[:, 0], v_h - pos_b[:, 1])
        return np.where(Xc_h[:, 2] > 1e-3, e_h, np.inf), Xc_h

    # gates run on each pose's OWN consensus set, not on all matched
    # pairs: a repetitive-texture bridge is ~80% wrong mutual-best
    # matches, so a median over everything sits on the error of a WRONG
    # match (~200 px) and rejects every working bridge. Consensus size +
    # consensus median is the verification pair.
    gate_px = float(p.pixel_err_var)
    err_v, Xc_v = _reproj_err(R_b_new, t_b_new)
    in_sol = err_v < gate_px
    med_sol = float(np.median(err_v[in_sol])) if in_sol.sum() else np.inf
    if int(in_sol.sum()) < 8 or med_sol > gate_px:
        _dbg(f"reject: verify consensus {int(in_sol.sum())} of "
             f"{len(err_v)} med={med_sol:.2f}")
        return MergeResult(False, state, 1.0, n_matches)
    # no-op hypothesis: if camera b's CURRENT pose already explains the
    # anchor-map bridge observations as well as the solved pose does, the
    # groups never actually drifted apart (a split caused by a mover
    # occluding the shared view, not by divergence). The correct
    # correction is identity — committing a solved Sim(3) here would
    # inject a realignment where none is needed and corrupt the moving
    # group's whole chain (the reference's checkViewOverlap + camera
    # distance gates at SL_MergeCameraGroup.cpp:56-177 play this
    # conservative role).
    err_id, _ = _reproj_err(R[b], t[b])
    in_id = err_id < gate_px
    med_id = float(np.median(err_id[in_id])) if int(in_id.sum()) >= 8 \
        else np.inf
    _dbg(f"noop-test: count_sol={int(in_sol.sum())} med_sol={med_sol:.2f} "
         f"count_id={int(in_id.sum())} med_id={med_id:.2f} "
         f"baseline={scale:.3f}")
    if med_id <= gate_px and int(in_id.sum()) >= 0.8 * int(in_sol.sum()):
        # identity committed: record the CURRENT inter-camera baseline
        # (the geometry actually kept), not the PnP pose's — with a
        # narrow match strip the PnP baseline rides a bas-relief
        # ambiguity the no-op decision just declared irrelevant
        c_a = -R[a].T @ t[a]
        c_b = -R[b].T @ t[b]
        return MergeResult(True, state, float(np.linalg.norm(c_a - c_b)),
                           n_matches, scale_move=1.0, noop=True)
    # moving-group scale drift (Sim(3) correction): the bridge features
    # bound to BOTH groups' maps see the same physical points along the
    # same rays from camera b — the anchor-depth / moving-depth ratio is
    # the accumulated scale drift of the separated group (the role of the
    # reference's uncertainScale pose-graph variables,
    # SL_GlobalPoseEstimation.cpp:283-335)
    R_new_b = np.asarray(R_sol[b])
    t_new_b = np.asarray(t_sol[b])
    s_move = 1.0
    mov = np.nonzero(alive_pt & (grp_owner == group_id[b]))[0]
    if len(mov) >= 8:
        xyz_all = np.asarray(mp.xyz)
        Xcb = xyz_all[mov] @ R[b].T + t[b]          # moving map in cam b
        okb = Xcb[:, 2] > 1e-3
        zb = Xcb[okb, 2]
        ub = Xcb[okb, 0] / zb * K_b[0, 0] + K_b[0, 2]
        vb = Xcb[okb, 1] / zb * K_b[1, 1] + K_b[1, 2]
        if okb.sum() >= 8:
            # anchor point (new pose) vs nearest moving point projecting
            # onto the same matched pixel in camera b
            dpx = np.linalg.norm(
                pos_b[:, None] - np.stack([ub, vb], -1)[None], axis=-1)
            jn = dpx.argmin(1)
            # scale evidence only from pairs the solved pose verified —
            # wrong mutual-best matches must not vote on the drift scale
            okp = (dpx.min(1) < 3.0) & (Xc_v[:, 2] > 1e-3) & in_sol
            if okp.sum() >= 8:
                ratio = Xc_v[okp, 2] / np.maximum(zb[jn[okp]], 1e-6)
                s_est = consensus_log_scale(ratio, min_members=8,
                                            max_width=0.4)
                if s_est is not None and 0.4 < s_est < 2.5:
                    s_move = s_est
    # world-frame correction S for the moving group, from camera b:
    # T_new = (R_old R_s^T, s t_old - R_new t_s)
    R_s = R_new_b.T @ R[b]
    t_s = R_new_b.T @ (s_move * t[b] - t_new_b)
    move = group_id == group_id[b]
    state = apply_group_transform(state, cfg, move, R_s.astype(np.float32),
                                  t_s.astype(np.float32), group_id,
                                  f_sep=f_sep, scale=s_move)
    return MergeResult(True, state, scale, n_matches,
                       scale_move=s_move)


def apply_group_transform(state: SlamState, cfg: SlamConfig,
                          move_cams: np.ndarray, R_s: np.ndarray,
                          t_s: np.ndarray, group_id: np.ndarray,
                          f_sep: int | None = None,
                          anchor_before: int | None = None,
                          scale: float = 1.0) -> SlamState:
    """Apply the world-frame correction x -> R_s x + t_s to the moving
    group's state: camera poses T' = T o S^-1, pose histories, keyframe
    poses, and owned map points (recomputeKeyCamPoses /
    recomputeAllCameraPoses / recomputeMapPoints roles).

    With ``f_sep`` given (the last frame the merging groups were still
    co-grouped), the correction is DISTRIBUTED over the separation window
    instead of applied rigidly: entity minted/observed at frame f gets
    S^w with w = (f - f_sep) / (f_merge - f_sep), interpolated in se(3).
    This is the functional equivalent of the reference's keyframe pose
    graph back to the last co-grouped keyframe
    (SL_MergeCameraGroup.cpp:884-1116, a chain with both ends pinned):
    drift accumulated gradually during separation, so the correction must
    ramp from identity at separation to S at the merge — a rigid S would
    corrupt pre-separation poses and put the full discrepancy at the
    separation point."""
    mv = jnp.asarray(move_cams)
    Rs = jnp.asarray(R_s)
    ts = jnp.asarray(t_s)
    f_merge = int(state.frame)
    rigid = f_sep is None         # no anchor known: w = 1 for everything
    if rigid or f_merge - f_sep < 2:
        span = 1
        f0 = f_merge - 1          # sep was ~now: only current entities move
    else:
        span = f_merge - f_sep
        f0 = f_sep
    xi = se3_log(Rs, ts)          # [6] correction twist
    lam = float(np.log(max(scale, 1e-6)))   # log-scale (Sim(3) extension)

    def w_of(frames):
        if rigid:
            return jnp.ones(frames.shape, jnp.float32)
        return jnp.clip((frames.astype(jnp.float32) - f0) / span, 0.0, 1.0)

    def S_at(w):
        """Graded correction (exp(w*xi), s^w): ([...,3,3], [...,3], [...])."""
        Rw, tw = se3_exp(w[..., None] * xi)
        return Rw, tw, jnp.exp(w * lam)

    def xf_pose(R, t, Rw, tw, sw):
        # world correction x' = s Rw x + tw; the camera sees the same
        # image under T' = (R Rw^T, s t - R Rw^T tw) (camera coords scale
        # by s, projectively invisible)
        Rn = orthonormalize_fast(R @ jnp.swapaxes(Rw, -1, -2))
        tn = sw[..., None] * t - jnp.einsum("...ij,...j->...i", Rn, tw)
        return Rn, tn

    one = jnp.ones((), jnp.float32)
    R_full, t_full, s_full = S_at(one)
    R_new, t_new = xf_pose(state.R, state.t, R_full, t_full,
                           jnp.broadcast_to(s_full, state.t.shape[:-1]))
    R_cur = jnp.where(mv[:, None, None], R_new, state.R)
    t_cur = jnp.where(mv[:, None], t_new, state.t)
    # pose-history ring: slot k holds frame f_merge - ((f_merge - k) % T)
    T = state.pose_hist_R.shape[1]
    k = jnp.arange(T)
    f_hist = f_merge - jnp.mod(f_merge - k, T)
    Rw_h, tw_h, sw_h = S_at(w_of(f_hist))                # [T, 3, 3], [T, 3]
    phR, pht = xf_pose(state.pose_hist_R, state.pose_hist_t,
                       Rw_h[None], tw_h[None], sw_h[None])
    pose_hist_R = jnp.where(mv[:, None, None, None], phR, state.pose_hist_R)
    pose_hist_t = jnp.where(mv[:, None, None], pht, state.pose_hist_t)
    # long-horizon pose ring: slot k holds frame LONG_STRIDE*m with
    # m = m_cur - ((m_cur - k) mod TL), m_cur = f_merge // LONG_STRIDE
    from coslam_tpu.slam.state import LONG_STRIDE
    TL = state.pose_hist_long_R.shape[1]
    kl = jnp.arange(TL)
    m_cur = f_merge // LONG_STRIDE
    f_hist_l = LONG_STRIDE * (m_cur - jnp.mod(m_cur - kl, TL))
    Rw_hl, tw_hl, sw_hl = S_at(w_of(f_hist_l))
    phRl, phtl = xf_pose(state.pose_hist_long_R, state.pose_hist_long_t,
                         Rw_hl[None], tw_hl[None], sw_hl[None])
    pose_hist_long_R = jnp.where(mv[:, None, None, None], phRl,
                                 state.pose_hist_long_R)
    pose_hist_long_t = jnp.where(mv[:, None, None], phtl,
                                 state.pose_hist_long_t)
    # keyframes: graded by their frame stamps
    Rw_k, tw_k, sw_k = S_at(w_of(state.kfs.frame))       # [KF, 3, 3], [KF, 3]
    kR, kt = xf_pose(state.kfs.R, state.kfs.t,
                     Rw_k[:, None], tw_k[:, None], sw_k[:, None])
    kfs = state.kfs._replace(
        R=jnp.where(mv[None, :, None, None], kR, state.kfs.R),
        t=jnp.where(mv[None, :, None], kt, state.kfs.t))
    # owned map points get the FULL correction: the moving cameras keep
    # tracking these points after the merge, so points and the (fully
    # corrected) current poses must stay mutually consistent — points are
    # continuously refined against current observations, so they live at
    # "now", not at their minting epoch. (Grading points by first_frame
    # was tried and leaves mid-separation points misaligned with the
    # current pose, which biases post-merge tracking.)
    mp = state.mappts
    owner_moves = mv[jnp.clip(mp.owner, 0, cfg.num_cameras - 1)] & \
        (mp.status == ST_ALIVE)
    if anchor_before is not None:
        # loop closure within one group: the dormant map that anchors the
        # correction (not observed since ``anchor_before``) must stay put —
        # only the drifted recent map realigns onto it
        owner_moves = owner_moves & (mp.last_obs >= anchor_before)
    X_new = s_full * jnp.einsum("ij,pj->pi", R_full, mp.xyz) + t_full
    cov_new = (s_full * s_full) * jnp.einsum("ij,pjk,lk->pil", R_full,
                                             mp.cov, R_full)
    mappts = mp._replace(
        xyz=jnp.where(owner_moves[:, None], X_new, mp.xyz),
        cov=jnp.where(owner_moves[:, None, None], cov_new, mp.cov))
    return state._replace(R=R_cur, t=t_cur, pose_hist_R=pose_hist_R,
                          pose_hist_t=pose_hist_t,
                          pose_hist_long_R=pose_hist_long_R,
                          pose_hist_long_t=pose_hist_long_t,
                          kfs=kfs, mappts=mappts)


def fuse_duplicate_points(state: SlamState, cfg: SlamConfig,
                          group_id: np.ndarray, cand: MergeCandidate,
                          rel_thresh: float = 0.05) -> SlamState:
    """After realignment, points from the two groups describing the same
    structure are fused (checkMergeMapPoints/mergeMapPoints): the moving
    group's duplicate goes false (its features re-register onto the
    surviving point next frame). The distance gate is depth-relative
    (``rel_thresh`` x owner-camera depth) so fusion aggressiveness does
    not depend on the arbitrary bootstrap scale."""
    mp = state.mappts
    alive = np.asarray((mp.status == ST_ALIVE) & (mp.ptype == PT_STATIC))
    owner = np.asarray(mp.owner)
    grp = group_id[np.clip(owner, 0, cfg.num_cameras - 1)]
    ga, gb = group_id[cand.cam_a], group_id[cand.cam_b]
    ia = np.nonzero(alive & (grp == ga))[0]
    ib = np.nonzero(alive & (grp == gb))[0]
    if len(ia) == 0 or len(ib) == 0:
        return state
    xyz_np = np.asarray(mp.xyz)
    R_np = np.asarray(state.R)
    t_np = np.asarray(state.t)
    own_c = np.clip(owner, 0, cfg.num_cameras - 1)
    depth = np.einsum("pj,pj->p", R_np[own_c][:, 2, :], xyz_np) \
        + t_np[own_c][:, 2]
    depth = np.where(depth > 1e-3, depth, 1e-3)
    Xa = xyz_np[ia]
    Xb = xyz_np[ib]
    # nearest-neighbor fuse; chunked so a full-capacity map can't blow up
    # host memory with an A x B distance matrix
    dup_mask = np.zeros(len(ib), bool)
    for s in range(0, len(ib), 512):
        blk = Xb[s:s + 512]
        d = np.linalg.norm(Xa[:, None] - blk[None, :], axis=-1)
        thr = rel_thresh * np.minimum(depth[ia][:, None],
                                      depth[ib[s:s + 512]][None, :])
        dup_mask[s:s + 512] = (d < thr).any(axis=0)
    dup_b = ib[dup_mask]
    if len(dup_b) == 0:
        return state
    status = np.asarray(mp.status).copy()
    status[dup_b] = ST_FALSE
    return state._replace(mappts=mp._replace(status=jnp.asarray(status)))


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("rel_thresh", "block"))
def _fuse_close_kill_mask(mappts, R: jnp.ndarray, t: jnp.ndarray,
                          rel_thresh: float = 0.025,
                          block: int = 512) -> jnp.ndarray:
    """[P] kill mask for duplicate unification, fully on device.

    A point j dies when some strictly-older (first_frame, then index)
    alive static point i sits within ``rel_thresh`` x min(depth_i,
    depth_j) of it AND their stored appearances agree (NCC >= 0.8 in some
    camera both hold a block for). Depth-relative distance makes the gate
    scale-free: the map's unit is arbitrary (anchored at bootstrap_depth),
    so a world-unit threshold would silently change fusion aggressiveness
    with the bootstrap scale. Blocked [block, P] sweeps: pairwise
    distances on the VPU, per-camera appearance agreement as MXU matmuls.
    (One pass: a point killed via a chain a<b<c may take c with it even
    though b dies too — the survivors re-acquire those features, same as
    the reference's sequential greedy refineMapPoint order effects.)"""
    P = mappts.xyz.shape[0]
    C = R.shape[0]
    alive = (mappts.status == ST_ALIVE) & (mappts.ptype == PT_STATIC)
    own = jnp.clip(mappts.owner, 0, C - 1)
    Ro = R[own]
    to = t[own]
    depth = jnp.einsum("pj,pj->p", Ro[:, 2, :], mappts.xyz) + to[:, 2]
    depth = jnp.where(depth > 1e-3, depth, 1e-3)
    X = mappts.xyz
    ff = mappts.first_frame
    idx = jnp.arange(P)
    kill = jnp.zeros((P,), bool)
    for s in range(0, P, block):
        e = min(s + block, P)
        Xb = X[s:e]
        d2 = sum((Xb[:, None, k] - X[None, :, k]) ** 2 for k in range(3))
        thr = rel_thresh * jnp.minimum(depth[s:e, None], depth[None, :])
        close = d2 < thr * thr
        sim = jnp.full((e - s, P), -jnp.inf, X.dtype)
        for c in range(C):
            simc = jnp.dot(mappts.ncc[s:e, c], mappts.ncc[:, c].T,
                           preferred_element_type=jnp.float32)
            both = mappts.ncc_valid[s:e, c, None] & \
                mappts.ncc_valid[None, :, c]
            sim = jnp.maximum(sim, jnp.where(both, simc, -jnp.inf))
        gi = idx[s:e]
        older = (ff[s:e, None] < ff[None, :]) | \
            ((ff[s:e, None] == ff[None, :]) & (gi[:, None] < idx[None, :]))
        killer = close & (sim >= 0.8) & alive[s:e, None] & alive[None, :] \
            & older
        kill = kill | jnp.any(killer, axis=0)
    return kill


def fuse_close_points(state: SlamState, cfg: SlamConfig,
                      rel_thresh: float = 0.025) -> tuple[SlamState, int]:
    """Periodic global duplicate unification (checkUnify/refineMapPoint,
    SL_CoSLAM.cpp:561-714, run by currentMapPointsRegister every 50th
    frame): alive static points closer than ``rel_thresh`` x depth with
    agreeing appearance collapse to the older slot; the newer slot goes
    false and its features re-register onto the survivor in later frames.
    Device-side (one scalar readback); see _fuse_close_kill_mask."""
    mp = state.mappts
    kill = _fuse_close_kill_mask(mp, state.R, state.t,
                                 rel_thresh=rel_thresh)
    n = int(jnp.sum(kill))
    if n == 0:
        return state, 0
    status = jnp.where(kill, ST_FALSE, mp.status)
    return state._replace(mappts=mp._replace(status=status)), n
