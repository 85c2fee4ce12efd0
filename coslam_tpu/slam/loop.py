"""Loop closure within a camera group.

The reference has no intra-group loop closure — its realignment machinery
(overlap candidates, wide-baseline bridging, graded pose-graph correction,
SL_MergeCameraGroup.cpp) only fires BETWEEN camera groups. This module
drives the same machinery when a group revisits its own *dormant* map
(points unseen for longer than the active window), closing monocular /
single-group drift loops:

  1. candidate: enough dormant static points project into the current view
     (inside the live-feature hull, like checkViewOverlap's mask test);
  2. re-acquire: NCC registration restricted to dormant points with a
     widened projection gate (drift displaces projections);
  3. solve: PnP RANSAC + IRLS polish on the re-acquired 2D-3D matches
     gives the drift-free pose;
  4. verify: inlier count + median reprojection error gates;
  5. commit: the graded world-frame correction of merge.py
     (apply_group_transform) ramps from identity at the loop anchor frame
     to the full correction now; the dormant anchor map stays put
     (anchor_before).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry import camera as cam
from coslam_tpu.geometry.pnp import ransac_pnp
from coslam_tpu.slam.merge import apply_group_transform
from coslam_tpu.slam.state import SlamState, ST_ALIVE, PT_STATIC


class LoopResult(NamedTuple):
    ok: bool
    state: SlamState
    cam: int
    n_inliers: int
    f_anchor: int


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


def close_loop(state: SlamState, cfg: SlamConfig, pyr, K, kc,
               group_id: np.ndarray, c: int) -> LoopResult:
    """Attempt a loop closure anchored on camera ``c``'s dormant map."""
    from coslam_tpu.slam.intercam import register_map_points
    p = cfg.p
    fail = LoopResult(False, state, c, 0, 0)
    frame = int(state.frame)
    # 2. dormant-only re-acquisition: widened projection gate (drift
    # displaces projections) and a looser NCC floor (appearance was stored
    # long ago; PnP RANSAC + reprojection gates verify geometrically below)
    st2, n_reg = register_map_points(state, pyr, K, cfg,
                                     gate_scale=4.0,
                                     min_age=p.loop_dormant_age,
                                     min_score=0.5, steal_young=True)
    if int(n_reg) < p.loop_min_inliers:
        return fail
    mp = st2.mappts
    tracks = st2.tracks
    mpt = np.asarray(tracks.mpt[c])
    valid = np.asarray(tracks.valid[c])
    last_obs = np.asarray(mp.last_obs)
    status = np.asarray(mp.status)
    sel = valid & (mpt >= 0)
    mi = np.clip(mpt, 0, None)
    sel &= (status[mi] == ST_ALIVE) & \
        (frame - last_obs[mi] >= p.loop_dormant_age)
    if sel.sum() < p.loop_min_inliers:
        return fail
    X = np.asarray(mp.xyz)[mpt[sel]]
    px = np.asarray(tracks.pos[c])[sel]
    Kc = np.asarray(K[c])
    f = float(Kc[0, 0])
    xn = np.asarray(cam.pixel_to_normalized(jnp.asarray(px), jnp.asarray(Kc)))
    # 3. PnP on the dormant matches only
    res = ransac_pnp(jax.random.PRNGKey(frame), jnp.asarray(X, jnp.float32),
                     jnp.asarray(xn, jnp.float32),
                     jnp.ones(len(X), bool), num_hypotheses=256,
                     thresh=3.0 / f)
    n_inl = int(res.num_inliers)
    if n_inl < p.loop_min_inliers:
        return fail
    # IRLS polish on inliers
    from coslam_tpu.solvers.pose import irls_pose
    pol = irls_pose(jnp.asarray(Kc), res.R, res.t,
                    jnp.asarray(X, jnp.float32), jnp.asarray(px, jnp.float32),
                    res.inliers, tau=p.max_err)
    # 4. verification
    err = np.asarray(pol.err)[np.asarray(res.inliers)]
    if len(err) < p.loop_min_inliers or float(np.median(err)) > 2.0:
        return fail
    R_new = np.asarray(pol.R)
    t_new = np.asarray(pol.t)
    R_old = np.asarray(state.R[c])
    t_old = np.asarray(state.t[c])
    # 5. graded correction over the drift window (T_new = T_old o S^-1)
    R_s = (R_new.T @ R_old).astype(np.float32)
    t_s = (R_new.T @ (t_old - t_new)).astype(np.float32)
    anchor_frames = last_obs[mpt[sel]][np.asarray(res.inliers)]
    f_anchor = int(np.median(anchor_frames))
    move = group_id == group_id[c]
    st3 = apply_group_transform(st2, cfg, move, R_s, t_s, group_id,
                                f_sep=f_anchor, anchor_before=f_anchor + 1)
    return LoopResult(True, st3, c, n_inl, f_anchor)
