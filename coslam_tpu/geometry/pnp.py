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
    """
    N = X.shape[-2]
    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)  # [..., N, 4]
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
    M = P[..., :, :3]
    # scale: average row norm of M should be 1; sign: det(M) > 0
    det = jnp.linalg.det(M)
    sign = jnp.where(det >= 0, 1.0, -1.0)
    scale = jnp.cbrt(jnp.abs(det) + 1e-20)
    P = P * (sign / scale)[..., None, None]
    R = project_to_so3(P[..., :, :3])
    t = P[..., :, 3]
    return R, t


class PnPRansacResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray
    num_inliers: jnp.ndarray


def ransac_pnp(key: jax.Array, X: jnp.ndarray, xn: jnp.ndarray,
               mask: jnp.ndarray, num_hypotheses: int = 256,
               thresh: float = 0.01, sample_size: int = 6,
               refit_rounds: int = 2) -> PnPRansacResult:
    """Batched-hypothesis PnP RANSAC. thresh on normalized-coord reprojection
    distance (~ px_thresh / focal)."""
    logits = jnp.where(mask, 0.0, -1e9)
    idx = jax.random.categorical(
        key, logits[None, :], shape=(num_hypotheses, sample_size))
    Rs, ts = pnp_dlt(X[idx], xn[idx], jnp.ones(idx.shape, dtype=X.dtype))

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
        R, t = pnp_dlt(X, xn, w)
        e, dok = residual(R, t)
        inliers = (e < thresh) & dok & mask
    return PnPRansacResult(R=R, t=t, inliers=inliers,
                           num_inliers=jnp.sum(inliers))
