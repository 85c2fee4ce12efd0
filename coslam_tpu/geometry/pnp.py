"""PnP: absolute pose from 3D-2D correspondences.

Replaces ``solvePnPRansac/solvePnP/solvePnPRobust`` (SL_SLAMHelper.h:15-31)
and the sba-based ``solvePnPIter`` (SL_SolvePnP.h:18-55) used to place
middle cameras during map init (SL_InitMap.cpp:644-737).

Design: DLT on normalized coordinates (6+ point linear solve via 12x12
eigh) followed by orthonormal projection of the rotation; batched-hypothesis
RANSAC like epipolar.py. Refinement to gold accuracy is done by the IRLS
LM pose solver (solvers/pose.py), which callers run on the RANSAC inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.se3 import project_to_so3


def pnp_dlt(X: jnp.ndarray, xn: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT pose. X: [..., N, 3] world, xn: [..., N, 2] normalized,
    w: [..., N]. Returns (R [...,3,3], t [...,3]).

    Solves for P = [R|t] up to scale from x ~ P X, fixes scale/sign via
    det(R)>0 and ||rows(R)||, then projects to SO(3).

    The world points are Hartley-normalized (centroid to origin, RMS
    radius to sqrt(3)) before building the normal equations: the DLT
    squares A's conditioning into AtA, and with raw scene coordinates
    (|X| ~ 10) the 12x12 f32 eigh returns a garbage null vector on TPU —
    0 RANSAC inliers on a problem where 80% of matches fit at 2 px
    (CPU LAPACK scrapes by on the same matrix, which is why tests passed
    while production merges silently failed). Normalization brings the
    condition number down to where f32 is comfortable on both backends.
    """
    wn = w / jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    c = jnp.sum(X * wn[..., None], axis=-2, keepdims=True)   # [..., 1, 3]
    Xc_ = X - c
    rms = jnp.sqrt(jnp.maximum(jnp.sum(
        jnp.sum(Xc_ * Xc_, axis=-1) * wn, axis=-1), 1e-12))  # [...]
    s = jnp.sqrt(3.0) / rms                                   # [...]
    Xh_ = Xc_ * s[..., None, None]
    Xh = jnp.concatenate([Xh_, jnp.ones_like(Xh_[..., :1])], axis=-1)
    zeros = jnp.zeros_like(Xh)
    u = xn[..., 0:1]
    v = xn[..., 1:2]
    row1 = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # [..., N, 12]
    row2 = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([row1 * w[..., None], row2 * w[..., None]], axis=-2)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    p = V[..., :, 0]
    P = p.reshape(*p.shape[:-1], 3, 4)
    # un-normalize: x ~ P_hat [s(X - c); 1]  =>  M = s*M_hat,
    # t = t_hat - s*M_hat c
    M = P[..., :, :3] * s[..., None, None]
    t = P[..., :, 3] - jnp.einsum("...ij,...j->...i", M, c[..., 0, :])
    # scale: average row norm of M should be 1; sign: det(M) > 0
    det = jnp.linalg.det(M)
    sign = jnp.where(det >= 0, 1.0, -1.0)
    scale = jnp.cbrt(jnp.abs(det) + 1e-20)
    M = M * (sign / scale)[..., None, None]
    t = t * (sign / scale)[..., None]
    R = project_to_so3(M)
    return R, t


class PnPRansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def ransac_pnp(key: jax.Array, X: jnp.ndarray, xn: jnp.ndarray,
               mask: jnp.ndarray, num_hypotheses: int = 256,
               thresh: float = 0.01, sample_size: int = 6,
               refit_rounds: int = 2, score: jnp.ndarray | None = None,
               R0: jnp.ndarray | None = None,
               t0: jnp.ndarray | None = None) -> PnPRansacResult:
    """Batched-hypothesis PnP RANSAC. thresh on normalized-coord reprojection
    distance (~ px_thresh / focal).

    ``score`` (optional, [N]): match-quality prior (e.g. NCC). When given,
    sampling is PROSAC-flavored: half the hypotheses draw only from the
    top ~48 matches by score, a quarter from the top ~128, the rest from
    all. A 6-point minimal sample needs inlier_ratio^6 luck — at the ~20%
    ratios a repetitive-texture bridge produces, uniform sampling is
    hopeless (0.2^6 * 2048 ~ 0.1 clean samples) while the top-50-by-NCC
    tier measured ~86% inliers on the same data. Scoring/refit always use
    ALL points.

    ``R0``/``t0`` (optional): an extra caller-supplied pose hypothesis
    scored alongside the sampled ones (e.g. the current pose — wins
    instantly when the bridge is a no-op).
    """
    logits = jnp.where(mask, 0.0, -1e9)
    if score is not None:
        s = jnp.where(mask, score, -jnp.inf)
        order = jnp.argsort(-s)
        rank = jnp.zeros_like(order).at[order].set(jnp.arange(len(order)))
        n_ok = jnp.sum(mask)
        k1 = jnp.clip(n_ok, sample_size, 48)
        k2 = jnp.clip(n_ok, sample_size, 128)
        l1 = jnp.where(mask & (rank < k1), 0.0, -1e9)
        l2 = jnp.where(mask & (rank < k2), 0.0, -1e9)
        kA, kB, kC = jax.random.split(key, 3)
        S = num_hypotheses
        idx = jnp.concatenate([
            jax.random.categorical(kA, l1[None, :], shape=(S // 2,
                                                           sample_size)),
            jax.random.categorical(kB, l2[None, :], shape=(S // 4,
                                                           sample_size)),
            jax.random.categorical(kC, logits[None, :],
                                   shape=(S - S // 2 - S // 4,
                                          sample_size))])
    else:
        idx = jax.random.categorical(
            key, logits[None, :], shape=(num_hypotheses, sample_size))
    Rs, ts = pnp_dlt(X[idx], xn[idx], jnp.ones(idx.shape, dtype=X.dtype))
    if R0 is not None:
        Rs = jnp.concatenate([Rs, R0[None].astype(Rs.dtype)])
        ts = jnp.concatenate([ts, t0[None].astype(ts.dtype)])

    def residual(R, t):
        Xc = jnp.einsum("ij,nj->ni", R, X) + t
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
        pr = Xc[..., :2] / z[..., None]
        ok_depth = Xc[..., 2] > 1e-6
        return jnp.linalg.norm(pr - xn, axis=-1), ok_depth

    errs, depth_ok = jax.vmap(residual)(Rs, ts)          # [S, N]
    inl = (errs < thresh) & depth_ok & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    R, t, inliers = Rs[best], ts[best], inl[best]
    for _ in range(refit_rounds):
        w = inliers.astype(X.dtype)
        R2, t2 = pnp_dlt(X, xn, w)
        e, dok = residual(R2, t2)
        new_inl = (e < thresh) & dok & mask
        # a refit that LOSES the consensus (degenerate weighted DLT)
        # must not replace a working hypothesis
        better = jnp.sum(new_inl) >= jnp.sum(inliers)
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        inliers = jnp.where(better, new_inl, inliers)
    return PnPRansacResult(R=R, t=t, inliers=inliers,
                           num_inliers=jnp.sum(inliers))
