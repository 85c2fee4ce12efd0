"""Multi-camera map initialization at frame 0.

Replaces ``InitMap`` (reference: SL_InitMap.h:35-138, .cpp:153-800 —
SURF+corner detection, pairwise descriptor matching with F-RANSAC
:257-289, NCC corner matching guided by seed disparity :291-316, camera
ordering by match counts :318-332 / selectCameraOrder, multi-view track
chaining :372-530, extrinsics via E-matrix between the order ends +
solvePnPRansac for middle cameras :644-737, and gated multi-view
reconstruction :738-800).

Design delta (SURVEY.md §7 stage 3): SURF is replaced by NCC corner
matching with a disparity bound + F-RANSAC verification — the behavior to
match is "wide-baseline bootstrap + guided matching", not SURF itself.
Score matrices and RANSAC run on device; the tiny chain/ordering logic is
host numpy.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

import os

from coslam_tpu.config import SlamConfig

_DEBUG = bool(os.environ.get("COSLAM_DEBUG"))


def _dbg(*a):
    if _DEBUG:
        print("[initmap]", *a, flush=True)
from coslam_tpu.geometry import camera as cam
from coslam_tpu.geometry import epipolar
from coslam_tpu.geometry.pnp import ransac_pnp
from coslam_tpu.geometry.triangulate import (triangulate_multiview,
                                             triangulation_cov)
from coslam_tpu.ops.matching import guided_match
from coslam_tpu.ops.ncc import extract_ncc_blocks


class InitMapResult(NamedTuple):
    ok: bool
    Rs: np.ndarray          # [C, 3, 3]
    ts: np.ndarray          # [C, 3]
    X: np.ndarray           # [M, 3] world points
    cov: np.ndarray         # [M, 3, 3]
    obs_slot: np.ndarray    # [M, C] feature-slot index per camera, -1 = none
    cam_order: list[int]


def _pairwise_matches(cfg: SlamConfig, K, kc, pos, valid, blocks, blk_ok):
    """NCC + F-RANSAC verified matches for every camera pair.

    Returns dict (i, j) -> a_to_b [N] (slot of cam j matched to slot of
    cam i, -1 otherwise) and counts matrix.
    """
    C, N = valid.shape
    p = cfg.p
    out = {}
    counts = np.zeros((C, C), int)
    max_disp = 0.6 * max(cfg.image_width, cfg.image_height)
    for i in range(C):
        for j in range(i + 1, C):
            m = guided_match(blocks[i], blocks[j], blk_ok[i] & valid[i],
                             blk_ok[j] & valid[j], pos[i], pos[j],
                             F=None, min_ncc=p.ncc_min_score,
                             max_disparity=max_disp, rounds=8)
            a_to_b = np.asarray(m.a_to_b)
            sel = a_to_b >= 0
            if sel.sum() >= 16:
                # F-RANSAC verification on normalized coords
                xa = cam.normalize_points(pos[i], K[i], kc[i])
                xb = cam.normalize_points(pos[j], K[j], kc[j])
                pair_a = np.where(sel)[0]
                x1 = np.asarray(xa)[pair_a]
                x2 = np.asarray(xb)[a_to_b[pair_a]]
                pad = max(0, N - x1.shape[0])
                x1p = np.pad(x1, ((0, pad), (0, 0)))
                x2p = np.pad(x2, ((0, pad), (0, 0)))
                maskp = np.zeros(x1p.shape[0], bool)
                maskp[: x1.shape[0]] = True
                res = epipolar.ransac_fundamental(
                    jax.random.PRNGKey(17 * i + j), jnp.asarray(x1p),
                    jnp.asarray(x2p), jnp.asarray(maskp),
                    num_hypotheses=256, thresh=3e-5)
                inl = np.asarray(res.inliers)[: x1.shape[0]]
                a_to_b2 = np.full(N, -1, int)
                a_to_b2[pair_a[inl]] = a_to_b[pair_a[inl]]
                a_to_b = a_to_b2
            else:
                a_to_b = np.full(N, -1, int)
            out[(i, j)] = a_to_b
            counts[i, j] = counts[j, i] = (a_to_b >= 0).sum()
    return out, counts


def _camera_order(counts: np.ndarray) -> list[int]:
    """Greedy path through cameras maximizing adjacent match counts
    (selectCameraOrder role)."""
    C = counts.shape[0]
    if C == 1:
        return [0]
    i, j = np.unravel_index(np.argmax(counts), counts.shape)
    order = [int(i), int(j)]
    rest = set(range(C)) - set(order)
    while rest:
        best, best_c, at_end = None, -1, True
        for r in rest:
            if counts[order[-1], r] > best_c:
                best, best_c, at_end = r, counts[order[-1], r], True
            if counts[order[0], r] > best_c:
                best, best_c, at_end = r, counts[order[0], r], False
        if at_end:
            order.append(int(best))
        else:
            order.insert(0, int(best))
        rest.discard(best)
    return order


def _chain_tracks(order, matches, N):
    """Chain adjacent-pair matches into multi-camera tracks.

    Returns obs [M, C] slot per camera (-1 = none), one row per track with
    >= 2 views.
    """
    C = len(order)

    def get(ci, cj, a):
        """match of slot a from camera index ci to cj (adjacent)."""
        i, j = order[ci], order[cj]
        if i < j:
            return matches[(i, j)][a]
        back = matches[(j, i)]
        hits = np.where(back == a)[0]
        return hits[0] if len(hits) else -1

    used = [np.zeros(N, bool) for _ in range(C)]
    rows = []
    for start in range(C - 1):
        for a in range(N):
            if used[start][a]:
                continue
            row = -np.ones(C, int)
            row[start] = a
            cur = a
            for nxt in range(start + 1, C):
                b = get(nxt - 1, nxt, cur)
                if b < 0:
                    break
                row[nxt] = b
                cur = b
            views = (row >= 0).sum()
            if views >= 2:
                for ci in range(C):
                    if row[ci] >= 0:
                        used[ci][row[ci]] = True
                obs = -np.ones(C, int)
                for ci in range(C):
                    obs[order[ci]] = row[ci]
                rows.append(obs)
    return np.stack(rows) if rows else np.zeros((0, C), int)


def init_map_multicam(cfg: SlamConfig, K, kc, pyr, pos, valid) -> InitMapResult:
    """K: [C,3,3]; kc: [C,5]; pyr: camera-batched pyramid of frame 0;
    pos: [C, N, 2] detected corner positions (undistorted px); valid: [C,N].
    """
    C, N = valid.shape
    p = cfg.p
    fail = InitMapResult(False, None, None, None, None, None, [])
    # NCC blocks at corners
    blocks, blk_ok = jax.vmap(
        lambda img, q: extract_ncc_blocks(img, q, p.ncc_patch_radius))(
        pyr.imgs[0], pos)
    matches, counts = _pairwise_matches(cfg, K, kc, pos, valid, blocks, blk_ok)
    order = _camera_order(counts)
    obs = _chain_tracks(order, matches, N)
    if obs.shape[0] < 30:
        _dbg("too few chained tracks", obs.shape[0])
        return fail
    pos_np = np.asarray(pos)
    xn = [np.asarray(cam.normalize_points(pos[c], K[c], kc[c]))
          for c in range(C)]
    # seed pair = the best-matched pair (more robust than the order ends
    # when wide-baseline chains are scarce)
    ci, cj = np.unravel_index(np.argmax(counts), counts.shape)
    ci, cj = int(min(ci, cj)), int(max(ci, cj))
    pair_rows = (obs[:, ci] >= 0) & (obs[:, cj] >= 0)
    if pair_rows.sum() < 16:
        _dbg("seed pair rows", int(pair_rows.sum()))
        return fail
    x1 = xn[ci][obs[pair_rows, ci]]
    x2 = xn[cj][obs[pair_rows, cj]]
    M0 = x1.shape[0]
    pad = max(0, 64 - M0 % 64) if M0 % 64 else 0
    x1p = np.pad(x1, ((0, pad), (0, 0)))
    x2p = np.pad(x2, ((0, pad), (0, 0)))
    maskp = np.zeros(x1p.shape[0], bool)
    maskp[:M0] = True
    res = epipolar.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(x1p), jnp.asarray(x2p),
        jnp.asarray(maskp), num_hypotheses=512, thresh=3e-5)
    R_end, t_end, Xe, good = epipolar.recover_pose_from_essential(
        res.F, jnp.asarray(x1p), jnp.asarray(x2p), res.inliers)
    if int(jnp.sum(good)) < 12:
        _dbg("E-recovery inliers", int(jnp.sum(good)), "of", M0)
        return fail
    # scale anchor: median depth in the seed camera
    med_z = float(jnp.nanmedian(jnp.where(good, Xe[:, 2], jnp.nan)))
    if not np.isfinite(med_z) or med_z <= 0:
        _dbg("bad median depth", med_z)
        return fail
    s = p.bootstrap_depth / med_z
    Xe = np.asarray(Xe) * s
    Rs = np.zeros((C, 3, 3), np.float32)
    ts = np.zeros((C, 3), np.float32)
    Rs[ci] = np.eye(3)
    Rs[cj] = np.asarray(R_end)
    ts[cj] = np.asarray(t_end) * s
    # incremental PnP: seed points -> pose remaining cameras in order of
    # support, re-triangulating over all posed cameras as we go
    good_np = np.asarray(good)[:M0]
    seed_obs = obs[pair_rows][good_np]
    X_seed = Xe[:M0][good_np]
    posed = {ci, cj}
    known_X = {r: X_seed[k] for k, r in
               enumerate(np.nonzero(pair_rows)[0][good_np])}
    fK = float(np.asarray(K)[0, 0, 0])
    while len(posed) < C:
        best_c, best_rows = -1, None
        for c in range(C):
            if c in posed:
                continue
            rows = [r for r in known_X if obs[r, c] >= 0]
            if best_rows is None or len(rows) > len(best_rows):
                best_c, best_rows = c, rows
        if best_c < 0 or len(best_rows) < 8:
            _dbg("pnp support too small", best_c,
                 0 if best_rows is None else len(best_rows))
            return fail
        c = best_c
        Xc = np.stack([known_X[r] for r in best_rows]).astype(np.float32)
        xc = xn[c][obs[best_rows, c]].astype(np.float32)
        # DLT PnP degenerates on near-coplanar init points (one dominant
        # wall); rig cameras are close together, so IRLS-LM from the
        # best-connected posed camera's pose is far more robust.
        near = max(posed, key=lambda cc: sum(obs[r, cc] >= 0
                                             for r in best_rows))
        from coslam_tpu.solvers.pose import irls_pose
        out = irls_pose(jnp.eye(3, dtype=jnp.float32),
                        jnp.asarray(Rs[near]), jnp.asarray(ts[near]),
                        jnp.asarray(Xc), jnp.asarray(xc),
                        jnp.ones(Xc.shape[0], bool),
                        tau=30.0 / fK, n_irls=6, n_lm=12)
        n_inl = int(jnp.sum(out.err < 4.0 / fK))
        if n_inl < 8 or not bool(jnp.all(jnp.isfinite(out.R))):
            _dbg("pnp inliers", n_inl, "cam", c)
            return fail
        Rs[c] = np.asarray(out.R)
        ts[c] = np.asarray(out.t)
        posed.add(c)
        # extend known points with rows visible in >=2 posed cameras
        # (batched midpoint triangulation, one device call per new camera)
        posed_list = sorted(posed)
        new_rows, av, bv = [], [], []
        for rr in range(obs.shape[0]):
            if rr in known_X:
                continue
            vis = [cc for cc in posed_list if obs[rr, cc] >= 0]
            if len(vis) >= 2:
                new_rows.append(rr)
                av.append(vis[0])
                bv.append(vis[-1])
        if new_rows:
            from coslam_tpu.geometry.triangulate import \
                triangulate_two_view_midpoint
            av = np.array(av)
            bv = np.array(bv)
            ra = np.array(new_rows)
            xa = np.stack([xn[a][obs[r, a]] for r, a in zip(ra, av)])
            xb = np.stack([xn[b][obs[r, b]] for r, b in zip(ra, bv)])
            Xr, s1, s2, _ = triangulate_two_view_midpoint(
                jnp.asarray(Rs[av]), jnp.asarray(ts[av]),
                jnp.asarray(Rs[bv]), jnp.asarray(ts[bv]),
                jnp.asarray(xa), jnp.asarray(xb))
            Xr = np.asarray(Xr)
            okr = (np.asarray(s1) > 0) & (np.asarray(s2) > 0)
            for k, rr in enumerate(ra):
                if okr[k]:
                    known_X[rr] = Xr[k]
    # reconstruct ALL tracks (>= 2 views) with final poses, gated
    M = obs.shape[0]
    xns = np.zeros((M, C, 2), np.float32)
    mask = obs >= 0
    for c in range(C):
        rowsc = mask[:, c]
        xns[rowsc, c] = xn[c][obs[rowsc, c]]
    Rb = jnp.broadcast_to(jnp.asarray(Rs), (M, C, 3, 3))
    tb = jnp.broadcast_to(jnp.asarray(ts), (M, C, 3))
    X = triangulate_multiview(Rb, tb, jnp.asarray(xns), jnp.asarray(mask))
    # --- init bundle adjustment (the RobustBundleRTS call right after
    # initMap, SL_CoSLAM.cpp:239): the 8-point E estimate degrades on
    # near-planar scenes; a robust BA over all cameras + init points
    # restores geometric consistency before anything is committed.
    from coslam_tpu.solvers.ba import BAProblem, bundle_adjust
    px_all = np.zeros((M, C, 2), np.float32)
    for c in range(C):
        rowsc = mask[:, c]
        px_all[rowsc, c] = np.asarray(pos)[c][obs[rowsc, c]]
    Mp = int(np.ceil(max(M, 1) / 256) * 256)       # pad to bound recompiles
    O = Mp * C
    obs_cam = np.tile(np.arange(C), Mp).astype(np.int32)
    obs_pt = np.repeat(np.arange(Mp), C).astype(np.int32)
    obs_px = np.zeros((Mp, C, 2), np.float32)
    obs_px[:M] = px_all
    obs_ok = np.zeros((Mp, C), bool)
    obs_ok[:M] = mask
    Xp0 = np.zeros((Mp, 3), np.float32)
    Xp0[:M] = np.asarray(X)
    cam_fixed = np.zeros(C, bool)
    cam_fixed[ci] = True
    prob = BAProblem(
        K=jnp.asarray(K), R=jnp.asarray(Rs), t=jnp.asarray(ts),
        X=jnp.asarray(Xp0),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_px=jnp.asarray(obs_px.reshape(O, 2)),
        obs_valid=jnp.asarray(obs_ok.reshape(O)),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(Mp, bool))
    bres = bundle_adjust(prob, max_err=p.max_err, max_iter=3, inner_iter=25)
    if bool(jnp.all(jnp.isfinite(bres.R))) and \
            bool(jnp.all(jnp.isfinite(bres.X[:M]))):
        Rs = np.asarray(bres.R)
        ts = np.asarray(bres.t)
        X = bres.X[:M]
        Rb = jnp.broadcast_to(jnp.asarray(Rs), (M, C, 3, 3))
        tb = jnp.broadcast_to(jnp.asarray(ts), (M, C, 3))
    # reprojection gate (undistorted px) + positive depth in every view
    Ks = jnp.asarray(K)
    pr = cam.project_points(Ks[None], jnp.asarray(Rs)[None],
                            jnp.asarray(ts)[None], np.asarray(X)[:, None])
    px_obs = np.zeros((M, C, 2), np.float32)
    for c in range(C):
        rowsc = mask[:, c]
        px_obs[rowsc, c] = pos_np[c][obs[rowsc, c]]
    err = np.linalg.norm(np.asarray(pr) - px_obs, axis=-1)
    depth = np.asarray(cam.camera_depths(
        jnp.asarray(Rs)[None], jnp.asarray(ts)[None], np.asarray(X)[:, None]))
    ok_view = (~mask) | ((err < 2.0 * p.reproj_new_point_gate) & (depth > 1e-3))
    keep = ok_view.all(axis=1) & (mask.sum(1) >= 2) & \
        np.isfinite(np.asarray(X)).all(axis=1)
    _dbg("final keep", int(keep.sum()), "of", M, "median err",
         float(np.median(err[mask])))
    if keep.sum() < 30:
        return fail
    Xk = np.asarray(X)[keep]
    obs_k = obs[keep]
    mask_k = mask[keep]
    Mk = Xk.shape[0]
    covX = triangulation_cov(
        jnp.broadcast_to(Ks, (Mk, C, 3, 3)),
        jnp.broadcast_to(jnp.asarray(Rs), (Mk, C, 3, 3)),
        jnp.broadcast_to(jnp.asarray(ts), (Mk, C, 3)),
        jnp.asarray(Xk), jnp.asarray(mask_k), pixel_var=p.pixel_err_var)
    return InitMapResult(True, Rs, ts, Xk.astype(np.float32),
                         np.asarray(covX), obs_k, order)
