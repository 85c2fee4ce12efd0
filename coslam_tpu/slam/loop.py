"""Loop closure within a camera group.

The reference has no intra-group loop closure — its realignment machinery
(overlap candidates, wide-baseline bridging, graded pose-graph correction,
SL_MergeCameraGroup.cpp) only fires BETWEEN camera groups. This module
drives the same machinery when a group revisits its own *dormant* map
(points unseen for longer than the active window), closing monocular /
single-group drift loops:

  1. candidate: enough dormant static points project into the current view
     (inside the live-feature hull, like checkViewOverlap's mask test);
  2. re-acquire: dense NCC template search around each dormant point's
     projection (ops/ncc.py::ncc_search) — detected-corner matching is
     unreliable on revisits;
  3. solve: residual-field consensus (the correction is a small SE(3), so
     true matches share a coherent residual) + IRLS polish;
  4. verify: consensus size + median reprojection error gates;
  5. commit: the graded world-frame correction of merge.py
     (apply_group_transform) ramps from identity at the loop anchor frame
     to the full correction now; the dormant anchor map stays put
     (anchor_before); re-acquired points re-bind to live features.

Scope note: the correction is Sim(3) — depth-ratio scale evidence from
the matched pairs (see ``attempt_loop_closure`` below) feeds
``apply_group_transform``'s scale, so monocular scale drift accumulated
since the anchor is corrected at the revisit, not just the SE(3) part.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.slam.merge import apply_group_transform
from coslam_tpu.slam.state import SlamState, ST_ALIVE, PT_STATIC


class LoopResult(NamedTuple):
    ok: bool
    state: SlamState
    cam: int
    n_inliers: int
    f_anchor: int
    scale: float = 1.0


def find_loop_candidates(state: SlamState, cfg: SlamConfig,
                         K: np.ndarray) -> list[tuple[int, int]]:
    """[(camera, count)] of cameras whose current view contains enough
    dormant static points, best first. Host-side (tiny, merge-candidate
    cadence)."""
    from coslam_tpu.geometry.hull import convex_hull, points_in_hull
    p = cfg.p
    C = cfg.num_cameras
    h, w = cfg.image_height, cfg.image_width
    mp = state.mappts
    frame = int(state.frame)
    dormant = np.asarray((mp.status == ST_ALIVE) & (mp.ptype == PT_STATIC)) \
        & (frame - np.asarray(mp.last_obs) >= p.loop_dormant_age)
    if dormant.sum() < p.loop_overlap_min:
        return []
    xyz = np.asarray(mp.xyz)[dormant]
    R = np.asarray(state.R)
    t = np.asarray(state.t)
    pos = np.asarray(state.tracks.pos)
    tvalid = np.asarray(state.tracks.valid)
    out = []
    for c in range(C):
        Xc = xyz @ R[c].T + t[c]
        z = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        u = Xc[:, 0] / z * K[c, 0, 0] + K[c, 0, 2]
        v = Xc[:, 1] / z * K[c, 1, 1] + K[c, 1, 2]
        inside = (Xc[:, 2] > 1e-3) & (u >= 0) & (u < w) & (v >= 0) & (v < h)
        if tvalid[c].sum() >= 3:
            hull = convex_hull(pos[c][tvalid[c]])
            if len(hull) >= 3:
                inside &= points_in_hull(np.stack([u, v], -1), hull)
        n = int(inside.sum())
        if n >= p.loop_overlap_min:
            out.append((c, n))
    out.sort(key=lambda x: -x[1])
    return out


_LOOP_ANCHOR_CAP = 256      # fixed shape for the jitted search (pad/mask)


def close_loop(state: SlamState, cfg: SlamConfig, pyr, K, kc,
               group_id: np.ndarray, c: int,
               min_score: float = 0.62,
               search_radius: int = 16) -> LoopResult:
    """Attempt a loop closure anchored on camera ``c``'s dormant map.

    Re-acquisition is a dense NCC template search around each dormant
    point's projection (ops/ncc.py::ncc_search) — matching against
    *detected* corners is unreliable on revisits (redetection lands a few
    px off the original corners), while the true patch is still present
    in the image."""
    from coslam_tpu.ops.ncc import ncc_search
    p = cfg.p
    fail = LoopResult(False, state, c, 0, 0)
    frame = int(state.frame)
    mp = state.mappts
    h, w = cfg.image_height, cfg.image_width
    last_obs = np.asarray(mp.last_obs)
    dormant = np.asarray((mp.status == ST_ALIVE) & (mp.ptype == PT_STATIC)) \
        & (frame - last_obs >= p.loop_dormant_age) \
        & np.asarray(mp.ncc_valid[:, c])
    Kc = np.asarray(K[c])
    R_old = np.asarray(state.R[c])
    t_old = np.asarray(state.t[c])
    xyz = np.asarray(mp.xyz)
    Xc0 = xyz @ R_old.T + t_old
    z = np.where(np.abs(Xc0[:, 2]) < 1e-9, 1e-9, Xc0[:, 2])
    u = Xc0[:, 0] / z * Kc[0, 0] + Kc[0, 2]
    v = Xc0[:, 1] / z * Kc[1, 1] + Kc[1, 2]
    margin = p.ncc_patch_radius + search_radius + 1
    inview = dormant & (Xc0[:, 2] > 1e-3) & (u >= margin) & (v >= margin) \
        & (u < w - margin) & (v < h - margin)
    idx = np.nonzero(inview)[0][:_LOOP_ANCHOR_CAP]
    if len(idx) < p.loop_min_inliers:
        return fail
    L = _LOOP_ANCHOR_CAP
    idxp = np.zeros(L, np.int64)
    idxp[:len(idx)] = idx
    mask = np.zeros(L, bool)
    mask[:len(idx)] = True
    centers = np.stack([u[idxp], v[idxp]], -1).astype(np.float32)
    # gather on DEVICE: pulling the full [P, 121] template plane to host
    # first costs a multi-MB tunnel transfer per attempt
    templates = mp.ncc[jnp.asarray(idxp), c]
    # 2. template search around the projections (drift displaces them)
    best_px, score = ncc_search(pyr.imgs[0][c], jnp.asarray(centers),
                                templates, search_radius=search_radius,
                                patch_radius=p.ncc_patch_radius)
    good = np.asarray(mask) & (np.asarray(score) >= min_score)
    if good.sum() < p.loop_min_inliers:
        return fail
    # 3. residual-field consensus: the drift correction is a SMALL SE(3),
    # so correct re-acquisitions share a spatially coherent residual
    # (match - projection) while mismatches on self-similar texture are
    # uniform over the search window. Classic PnP RANSAC fails here (at
    # ~50-70% contamination a 6-point all-inlier DLT sample is rare);
    # 1-match residual hypotheses + a radius consensus are robust and
    # O(L^2).
    bp = np.asarray(best_px)
    r = bp - centers                                        # [L, 2]
    dist = np.linalg.norm(r[:, None] - r[None], axis=-1)    # [L, L]
    votes = (dist < 6.0) & good[None, :] & good[:, None]
    counts = votes.sum(1)
    best_h = int(np.argmax(counts))
    consensus = votes[best_h]
    n_inl = int(consensus.sum())
    if n_inl < p.loop_min_inliers:
        return fail
    # IRLS polish from the current pose over the consensus set
    X = jnp.asarray(xyz[idxp], jnp.float32)
    from coslam_tpu.solvers.pose import irls_pose
    pol = irls_pose(jnp.asarray(Kc), jnp.asarray(R_old), jnp.asarray(t_old),
                    X, best_px, jnp.asarray(consensus), tau=6.0)
    # 4. verification
    err = np.asarray(pol.err)[consensus]
    if len(err) < p.loop_min_inliers or float(np.median(err)) > 2.5:
        return fail
    R_new = np.asarray(pol.R)
    t_new = np.asarray(pol.t)
    # 5. monocular scale evidence (Sim(3) correction): pair re-acquired
    # anchor points with the YOUNG map points currently bound at (nearly)
    # the same pixels — the depth ratio anchor/young under their
    # respective poses is the accumulated scale drift (depth-ratio method,
    # like the merge's map-resolved scale)
    scale = 1.0
    tracks = state.tracks
    pos_c = np.asarray(tracks.pos[c])
    mpt_c = np.asarray(tracks.mpt[c])
    first_frame = np.asarray(mp.first_frame)
    young_f = np.asarray(tracks.valid[c]) & (mpt_c >= 0) & \
        (first_frame[np.clip(mpt_c, 0, None)] > frame - p.loop_dormant_age)
    if young_f.sum() >= 5 and n_inl >= 5:
        ypix = pos_c[young_f]
        yslot = mpt_c[young_f]
        mpix = np.asarray(best_px)[consensus]
        d = np.linalg.norm(mpix[:, None] - ypix[None], axis=-1)
        j = d.argmin(1)
        okp = d.min(1) < 3.0
        if okp.sum() >= 5:
            Xa = xyz[idxp][consensus][okp]
            Xy = xyz[yslot[j[okp]]]
            za = (Xa @ R_new.T + t_new)[:, 2]
            zy = (Xy @ R_old.T + t_old)[:, 2]
            ratio = za / np.maximum(zy, 1e-6)
            ratio = ratio[np.isfinite(ratio) & (ratio > 0)]
            if len(ratio) >= 5:
                lr = np.log(ratio)
                mad = float(np.median(np.abs(lr - np.median(lr))))
                s_est = float(np.exp(np.median(lr)))
                if mad < 0.25 and 0.5 < s_est < 2.0:
                    scale = s_est
    # graded correction over the drift window: pose update
    # T_new = (R_old R_s^T, s t_old - R_new t_s)
    R_s = (R_new.T @ R_old).astype(np.float32)
    t_s = (R_new.T @ (scale * t_old - t_new)).astype(np.float32)
    anchor_frames = last_obs[idxp][consensus]
    f_anchor = int(np.median(anchor_frames))
    move = group_id == group_id[c]
    st3 = apply_group_transform(state, cfg, move, R_s, t_s, group_id,
                                f_sep=f_anchor, anchor_before=f_anchor + 1,
                                scale=scale)
    # 6. bind re-acquired points to live features for continued tracking
    from coslam_tpu.slam.intercam import register_map_points
    st3, _ = register_map_points(st3, pyr, K, cfg,
                                 min_age=p.loop_dormant_age,
                                 min_score=0.5, steal_young=True)
    return LoopResult(True, st3, c, n_inl, f_anchor, scale)
