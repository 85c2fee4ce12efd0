"""Epipolar geometry: F/E estimation, batched-hypothesis RANSAC, E decomposition.

Replaces the LibVisualSLAM surface used for bootstrap and merge:
``findFMatrix`` F-RANSAC (SL_InitMap.cpp:128), ``estimateEMat``
(SL_MergeCameraGroup.cpp:197), 5-point via SL_5point.h, and
``CalibTwoCam`` two-view calibration (SL_CoSLAM.cpp:173-183).

TPU-first design: RANSAC is *batched-hypothesis* — S minimal samples are
drawn at once, S models are fit with one batched 9x9 eigendecomposition,
and all S x N residuals are evaluated as one dense [S, N] computation
(SURVEY.md §7 hard part #3). We use the normalized 8-point algorithm on
undistorted normalized coordinates (the calibrated setting makes 8-point
an adequate substitute for the reference's 5-point; cited behavior is
"wide-baseline two-view bootstrap", not the specific minimal solver).

Conventions: x2^T E x1 = 0 with E = [t21]_x R21 and x2 = R21 x1 + t21
(points in normalized camera coords, homogeneous z=1).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.triangulate import triangulate_two_view


def _homog(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def _normalize_for_8pt(x: jnp.ndarray, w: jnp.ndarray):
    """Hartley normalization with weights w [..., N]. Returns (xh, T)."""
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-9
    mean = jnp.sum(x * w[..., None], axis=-2, keepdims=True) / wsum[..., None]
    d = jnp.linalg.norm(x - mean, axis=-1)
    mean_d = jnp.sum(d * w, axis=-1, keepdims=True) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-9)
    xs = (x - mean) * s[..., None]
    # T = [[s,0,-s*mx],[0,s,-s*my],[0,0,1]]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    T = jnp.stack([
        jnp.stack([s[..., 0], zeros[..., 0], -s[..., 0] * mx], axis=-1),
        jnp.stack([zeros[..., 0], s[..., 0], -s[..., 0] * my], axis=-1),
        jnp.stack([zeros[..., 0], zeros[..., 0], ones[..., 0]], axis=-1),
    ], axis=-2)
    return xs, T


def fit_fundamental(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Weighted normalized 8-point fit. x1, x2: [..., N, 2]; w: [..., N].

    Returns F (or E when inputs are normalized camera coords): [..., 3, 3]
    with rank-2 enforcement, scaled to unit Frobenius norm.
    """
    x1s, T1 = _normalize_for_8pt(x1, w)
    x2s, T2 = _normalize_for_8pt(x2, w)
    u1, v1 = x1s[..., 0], x1s[..., 1]
    u2, v2 = x2s[..., 0], x2s[..., 1]
    ones = jnp.ones_like(u1)
    # x2^T F x1 = 0 rows
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones],
                  axis=-1)  # [..., N, 9]
    A = A * w[..., None]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, V = jnp.linalg.eigh(AtA)
    f = V[..., :, 0]
    F = f.reshape(*f.shape[:-1], 3, 3)
    # rank-2 enforcement
    U, s, Vt = jnp.linalg.svd(F)
    s2 = s.at[..., 2].set(0.0)
    F = (U * s2[..., None, :]) @ Vt
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    return F / jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-12)


def sampson_error(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) error. F: [..., 3, 3]; x*: [..., N, 2]."""
    x1h = _homog(x1)
    x2h = _homog(x2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1h)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2h)
    num = jnp.square(jnp.einsum("...ni,...ni->...n", x2h, Fx1))
    den = (jnp.square(Fx1[..., 0]) + jnp.square(Fx1[..., 1])
           + jnp.square(Ftx2[..., 0]) + jnp.square(Ftx2[..., 1]))
    return num / jnp.maximum(den, 1e-12)


def epipolar_dists(F: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric point-to-epiline distance (the reference's epipolar error
    measure, Const::MAX_EPI_ERR gates; SL_FeatureMatching.h getEpiNccMat)."""
    x1h = _homog(x1)
    x2h = _homog(x2)
    l2 = jnp.einsum("...ij,...nj->...ni", F, x1h)   # line in image 2
    l1 = jnp.einsum("...ji,...nj->...ni", F, x2h)   # line in image 1
    d2 = jnp.abs(jnp.einsum("...ni,...ni->...n", x2h, l2)) / jnp.maximum(
        jnp.linalg.norm(l2[..., :2], axis=-1), 1e-12)
    d1 = jnp.abs(jnp.einsum("...ni,...ni->...n", x1h, l1)) / jnp.maximum(
        jnp.linalg.norm(l1[..., :2], axis=-1), 1e-12)
    return 0.5 * (d1 + d2)


class RansacResult(NamedTuple):
    F: jnp.ndarray           # [3, 3] best model (refit on inliers)
    inliers: jnp.ndarray     # [N] bool
    num_inliers: jnp.ndarray


def ransac_fundamental(key: jax.Array, x1: jnp.ndarray, x2: jnp.ndarray,
                       mask: jnp.ndarray, num_hypotheses: int = 256,
                       thresh: float = 2e-5, sample_size: int = 8,
                       refit_rounds: int = 2) -> RansacResult:
    """Batched-hypothesis RANSAC for F (or E on normalized coords).

    x1, x2: [N, 2]; mask: [N] valid correspondences. thresh is on Sampson
    error (squared units of the input coordinate space; for normalized
    coords ~ (px_thresh / focal)^2).
    """
    n = x1.shape[0]
    logits = jnp.where(mask, 0.0, -1e9)
    idx = jax.random.categorical(
        key, logits[None, :], shape=(num_hypotheses, sample_size))  # [S, 8]
    s_x1 = x1[idx]            # [S, 8, 2]
    s_x2 = x2[idx]
    w = jnp.ones(idx.shape, dtype=x1.dtype)
    Fs = fit_fundamental(s_x1, s_x2, w)                    # [S, 3, 3]
    errs = sampson_error(Fs, x1[None], x2[None])           # [S, N]
    inl = (errs < thresh) & mask[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    inliers = inl[best]
    F = Fs[best]
    # iterative refit on inliers (weighted all-point 8-point)
    for _ in range(refit_rounds):
        wF = inliers.astype(x1.dtype)
        F = fit_fundamental(x1, x2, wF)
        inliers = (sampson_error(F, x1, x2) < thresh) & mask
    return RansacResult(F=F, inliers=inliers, num_inliers=jnp.sum(inliers))


def ransac_essential(key: jax.Array, x1n: jnp.ndarray, x2n: jnp.ndarray,
                     mask: jnp.ndarray, num_hypotheses: int = 256,
                     thresh: float = 2e-5,
                     n_hyp_5pt: int = 64) -> RansacResult:
    """Essential-matrix RANSAC on normalized coordinates: the batched
    8-point device path plus the 5-point minimal solver (SL_5point.h
    equivalent, geometry/fivepoint.py), keeping whichever model explains
    more correspondences. The 5-point path wins on minimal/near-planar
    wide-baseline samples where 8-point hypotheses are degenerate."""
    res8 = ransac_fundamental(key, x1n, x2n, mask,
                              num_hypotheses=num_hypotheses, thresh=thresh)
    if n_hyp_5pt <= 0 or int(jnp.sum(mask)) < 5:
        return res8
    import numpy as np
    from coslam_tpu.geometry.fivepoint import ransac_essential_5pt
    E5, inl5, n5 = ransac_essential_5pt(
        np.asarray(x1n), np.asarray(x2n), np.asarray(mask),
        n_hyp=n_hyp_5pt, thresh=thresh,
        seed=int(jax.random.randint(key, (), 0, 2**31 - 1)))
    if n5 <= int(res8.num_inliers):
        return res8
    # polish the 5-point winner with a weighted all-inlier refit
    inliers = jnp.asarray(inl5)
    F = jnp.asarray(E5, x1n.dtype)
    for _ in range(2):
        F = fit_fundamental(x1n, x2n, inliers.astype(x1n.dtype))
        inliers = (sampson_error(F, x1n, x2n) < thresh) & mask
    # keep the refit only if it did not lose inliers
    keep = jnp.sum(inliers) >= n5
    F = jnp.where(keep, F, jnp.asarray(E5, x1n.dtype))
    inliers = jnp.where(keep, inliers, jnp.asarray(inl5))
    return RansacResult(F=F, inliers=inliers,
                        num_inliers=jnp.sum(inliers))


def decompose_essential(E: jnp.ndarray):
    """E -> four (R, t) candidates, ||t|| = 1. Returns (Rs [4,3,3], ts [4,3])."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))[..., None, None]
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def recover_pose_from_essential(E: jnp.ndarray, x1n: jnp.ndarray, x2n: jnp.ndarray,
                                mask: jnp.ndarray):
    """Pick the (R21, t21) candidate with maximal cheirality support and
    triangulate. Returns (R, t, X [N, 3], good [N] bool)."""
    Rs, ts = decompose_essential(E)  # [4,3,3], [4,3]
    eye = jnp.eye(3, dtype=E.dtype)
    zero = jnp.zeros((3,), dtype=E.dtype)

    def tri(R, t):
        X = triangulate_two_view(eye, zero, R, t, x1n, x2n)
        z1 = X[..., 2]
        z2 = jnp.einsum("ij,nj->ni", R, X)[..., 2] + t[2]
        ok = (z1 > 1e-6) & (z2 > 1e-6) & mask
        return X, ok

    Xs, oks = jax.vmap(tri)(Rs, ts)
    counts = jnp.sum(oks, axis=-1)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], Xs[best], oks[best]


def essential_from_poses(R1, t1, R2, t2) -> jnp.ndarray:
    """E = [t21]_x R21 for cameras (R1,t1), (R2,t2) in a common world frame."""
    from coslam_tpu.geometry.se3 import relative_pose, so3_hat
    R21, t21 = relative_pose(R1, t1, R2, t2)
    return so3_hat(t21) @ R21


def fundamental_from_poses(K1, R1, t1, K2, R2, t2) -> jnp.ndarray:
    """F = K2^{-T} E K1^{-1} (pixel-space epipolar geometry for guided
    matching; getEpiNccMat equivalent feeds on this)."""
    E = essential_from_poses(R1, t1, R2, t2)
    K1i = jnp.linalg.inv(K1)
    K2i = jnp.linalg.inv(K2)
    F = jnp.swapaxes(K2i, -1, -2) @ E @ K1i
    return F / jnp.maximum(jnp.linalg.norm(F, axis=(-2, -1), keepdims=True), 1e-12)
