"""Per-camera 3D->2D pose refinement: Tukey-IRLS damped Levenberg-Marquardt.

Replaces ``intraCamEstimate`` (reference: SL_IntraCamPose.h:92-125, .cpp —
SO(3) exp map :10-38, numeric Jacobians :44-117, damped LM
``intraCamWeightedLMProc``, Tukey re-weighting loops :640-655,687-703 with
tau = Param::maxErr and maxIterRW = 5 outer iterations).

TPU-first deltas: analytic Jacobians on the se(3) left-increment (the
reference differentiates numerically), branch-free LM accept/reject via
``jnp.where`` so the whole solver jits and vmaps over the camera axis —
the reference's per-camera serial loop (parallelPoseUpdate,
SL_CoSLAM.cpp:390-417) becomes one batched call.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.se3 import se3_exp, so3_hat
from coslam_tpu.geometry.robust import tukey_weight, huber_weight


class IRLSPoseResult(NamedTuple):
    R: jnp.ndarray        # [..., 3, 3]
    t: jnp.ndarray        # [..., 3]
    weights: jnp.ndarray  # [..., N] final IRLS weights (0 for outliers)
    err: jnp.ndarray      # [..., N] final per-point reprojection error (px)
    cost: jnp.ndarray     # [...] final weighted cost


def _residuals(K, R, t, X, px):
    Xc = jnp.einsum("ij,nj->ni", R, X) + t
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = Xc[:, :2] / zs[:, None]
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pr = jnp.stack([fx * xn[:, 0] + cx, fy * xn[:, 1] + cy], axis=-1)
    return pr - px, Xc


def _jacobian(K, Xc):
    """d(residual)/d(xi) for left-increment xi=(w,v): Xc' = Xc + w x Xc + v."""
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = K[0, 0], K[1, 1]
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1)   # [N, 3]
    dv = jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1)
    Jc = jnp.stack([du, dv], axis=-2)                              # [N, 2, 3]
    dXc = jnp.concatenate([-so3_hat(Xc), jnp.broadcast_to(
        jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))], axis=-1)  # [N,3,6]
    return Jc @ dXc                                                # [N, 2, 6]


def _weighted_cost(r, w):
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


# --- lane-major internals -------------------------------------------------
# The LM loop keeps every per-point array as [.., N] so the point axis sits
# on the 128-wide lane dimension; the [N, 2, 6] Jacobian layout puts 6 (of
# 128) lanes x 2 (of 8) sublanes to work (~5% occupancy) and was the single
# most expensive fusion of the fused frame step (~2 ms/frame in the
# while-loop body).


def _residuals_ln(K, R, t, XT, pxT):
    """XT: [3, N] world points; pxT: [2, N]. Returns (ru, rv, Xc [3, N])."""
    Xc = R @ XT + t[:, None]
    z = Xc[2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    ru = fx * Xc[0] / zs + cx - pxT[0]
    rv = fy * Xc[1] / zs + cy - pxT[1]
    return ru, rv, Xc


def _jacobian_ln(K, Xc):
    """Analytic rows of the 2x6 left-increment Jacobian, points on lanes.

    Returns (Ju, Jv): [6, N] each, columns ordered (w1, w2, w3, v1, v2, v3).
    Same math as _jacobian (Jc @ [-hat(Xc) | I]) written out flat."""
    x, y, z = Xc[0], Xc[1], Xc[2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = K[0, 0], K[1, 1]
    xz = x * zi
    yz = y * zi
    zero = jnp.zeros_like(x)
    Ju = jnp.stack([-fx * xz * yz, fx * (1.0 + xz * xz), -fx * yz,
                    fx * zi, zero, -fx * xz * zi])
    Jv = jnp.stack([-fy * (1.0 + yz * yz), fy * xz * yz, fy * xz,
                    zero, fy * zi, -fy * yz * zi])
    return Ju, Jv


def _chol_solve6(A, b):
    """Solve the SPD 6x6 system A x = b by fully unrolled Cholesky (the
    lax.linalg LU custom-call + two triangular solves cost ~8 us per LM
    iteration for this tiny, batched-over-cameras system)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-20))
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


@partial(jax.jit, static_argnames=("n_irls", "n_lm"))
def irls_pose(K: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
              X: jnp.ndarray, px: jnp.ndarray, valid: jnp.ndarray,
              tau: float = 10.0, n_irls: int = 5, n_lm: int = 10,
              point_weight: jnp.ndarray | None = None) -> IRLSPoseResult:
    """Single camera (vmap for the camera axis).

    K: [3,3]; R0,t0: initial pose; X: [N,3] world points; px: [N,2]
    undistorted pixel observations; valid: [N] mask. ``point_weight``
    optionally scales each point's influence (the reference's density
    weights, computeDensityWeights).
    """
    base_w = valid.astype(X.dtype)
    if point_weight is not None:
        base_w = base_w * point_weight
    XT = X.T                     # [3, N] — points on lanes
    pxT = px.T                   # [2, N]

    def lm_inner(carry, _):
        R, t, lam, w = carry
        ru, rv, Xc = _residuals_ln(K, R, t, XT, pxT)
        we = jnp.where(Xc[2] <= 1e-6, 0.0, w)
        Ju, Jv = _jacobian_ln(K, Xc)                     # [6, N] each
        Juw = Ju * we[None, :]
        Jvw = Jv * we[None, :]
        H = Juw @ Ju.T + Jvw @ Jv.T                      # [6, 6]
        g = Juw @ ru + Jvw @ rv                          # [6]
        cost = jnp.sum(we * (ru * ru + rv * rv))
        Hd = H + lam * jnp.diag(jnp.diagonal(H) + 1e-6)
        delta = -_chol_solve6(Hd, g)
        dR, dt = se3_exp(delta)
        R_new = dR @ R
        t_new = jnp.einsum("ij,j->i", dR, t) + dt
        ru_n, rv_n, Xc_new = _residuals_ln(K, R_new, t_new, XT, pxT)
        we_new = jnp.where(Xc_new[2] <= 1e-6, 0.0, w)
        cost_new = jnp.sum(we_new * (ru_n * ru_n + rv_n * rv_n))
        ok = (cost_new < cost) & jnp.all(jnp.isfinite(delta))
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        lam = jnp.where(ok, lam * 0.3, lam * 5.0)
        lam = jnp.clip(lam, 1e-8, 1e8)
        return (R, t, lam, w), None

    def irls_outer(carry, k):
        R, t, w = carry
        ru, rv, _ = _residuals_ln(K, R, t, XT, pxT)
        en = jnp.sqrt(ru * ru + rv * rv)
        # Tukey on EVERY pass (the reference's intraCamWeightedLMProc,
        # SL_IntraCamPose.cpp:640-655): a hard outlier must contribute
        # nothing from the first iteration. Huber here is catastrophic —
        # a single corrupt map point at r=300 px still contributes
        # w*r^2 = tau*r ~ 3000 (thousands of times any inlier), enough to
        # drag the solve into a wrong basin the final Tukey pass cannot
        # escape. Huber only as a fallback when Tukey rejects (nearly)
        # everything — a far-off init must still produce a gradient.
        w_tuk = tukey_weight(en, tau)
        n_live = jnp.sum(base_w * (w_tuk > 0))
        w_rob = jnp.where(n_live >= 6, w_tuk, huber_weight(en, tau))
        w = base_w * w_rob
        lam0 = jnp.asarray(1e-3, X.dtype)
        (R, t, _, _), _ = jax.lax.scan(lm_inner, (R, t, lam0, w), None,
                                       length=n_lm)
        return (R, t, w), None

    w0 = base_w
    (R, t, w), _ = jax.lax.scan(irls_outer, (R0, t0, w0), jnp.arange(n_irls))
    from coslam_tpu.geometry.se3 import orthonormalize_fast
    R = orthonormalize_fast(R)
    r, Xc = _residuals(K, R, t, X, px)
    err = jnp.linalg.norm(r, axis=-1)
    w_final = base_w * tukey_weight(err, tau) * (Xc[:, 2] > 1e-6)
    return IRLSPoseResult(R=R, t=t, weights=w_final, err=err,
                          cost=_weighted_cost(r, w_final))


irls_pose_multicam = jax.vmap(irls_pose,
                              in_axes=(0, 0, 0, 0, 0, 0, None, None, None))


# ---------------------------------------------------------------------------
# epipolar-augmented variant
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("n_irls", "n_lm"))
def irls_pose_epi(K: jnp.ndarray, R0: jnp.ndarray, t0: jnp.ndarray,
                  X: jnp.ndarray, px: jnp.ndarray, valid3: jnp.ndarray,
                  prev_R: jnp.ndarray, prev_t: jnp.ndarray,
                  px_prev: jnp.ndarray, valid2: jnp.ndarray,
                  tau: float = 10.0, epi_weight: float = 1.0,
                  n_irls: int = 4, n_lm: int = 8) -> IRLSPoseResult:
    """``intraCamEstimateEpi`` equivalent (SL_IntraCamPose.h:117-125): the
    3D->2D objective augmented with 2D-2D epipolar terms against the
    previous pose, so unmapped-but-tracked features still constrain the
    pose when mapped points are scarce.

    px_prev/px: the same feature slots' pixels at the previous/current
    frame; valid2 masks the epipolar-only features. Jacobians of the
    epipolar distance come from forward-mode autodiff on the se(3)
    increment (6 JVPs — cheaper than deriving them by hand, identical
    result)."""
    from coslam_tpu.geometry.epipolar import fundamental_from_poses
    from coslam_tpu.geometry.se3 import orthonormalize_fast
    base3 = valid3.astype(X.dtype)
    base2 = valid2.astype(X.dtype) * epi_weight

    def residuals(xi, R, t):
        dR, dt = se3_exp(xi)
        Rn = dR @ R
        tn = jnp.einsum("ij,j->i", dR, t) + dt
        r3, _ = _residuals(K, Rn, tn, X, px)
        F = fundamental_from_poses(K, prev_R, prev_t, K, Rn, tn)
        ph = jnp.concatenate([px_prev, jnp.ones_like(px_prev[:, :1])], -1)
        ch = jnp.concatenate([px, jnp.ones_like(px[:, :1])], -1)
        l = ph @ F.T
        r2 = jnp.einsum("ni,ni->n", ch, l) / jnp.maximum(
            jnp.linalg.norm(l[:, :2], axis=-1), 1e-9)
        return r3, r2

    def lm_inner(carry, _):
        R, t, lam, w3, w2 = carry
        zero = jnp.zeros((6,), X.dtype)
        r3, r2 = residuals(zero, R, t)
        J3 = jax.jacfwd(lambda xi: residuals(xi, R, t)[0])(zero)  # [N,2,6]
        J2 = jax.jacfwd(lambda xi: residuals(xi, R, t)[1])(zero)  # [N,6]
        H = jnp.einsum("n,nki,nkj->ij", w3, J3, J3) \
            + jnp.einsum("n,ni,nj->ij", w2, J2, J2)
        g = jnp.einsum("n,nki,nk->i", w3, J3, r3) \
            + jnp.einsum("n,ni,n->i", w2, J2, r2)
        cost = jnp.sum(w3 * jnp.sum(r3 * r3, -1)) + jnp.sum(w2 * r2 * r2)
        Hd = H + lam * jnp.diag(jnp.diagonal(H) + 1e-6)
        delta = -jnp.linalg.solve(Hd, g)
        r3n, r2n = residuals(delta, R, t)
        cost_new = jnp.sum(w3 * jnp.sum(r3n * r3n, -1)) \
            + jnp.sum(w2 * r2n * r2n)
        ok = (cost_new < cost) & jnp.all(jnp.isfinite(delta))
        dR, dt = se3_exp(jnp.where(ok, delta, 0.0))
        R = dR @ R
        t = jnp.einsum("ij,j->i", dR, t) + dt
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 5.0), 1e-8, 1e8)
        return (R, t, lam, w3, w2), None

    def outer(carry, k):
        R, t, w3, w2 = carry
        r3, r2 = residuals(jnp.zeros((6,), X.dtype), R, t)
        e3 = jnp.linalg.norm(r3, axis=-1)
        e2 = jnp.abs(r2)
        # Tukey on every pass with Huber only as the degenerate-pass
        # fallback — same rationale as irls_pose above
        t3 = tukey_weight(e3, tau)
        t2 = tukey_weight(e2, tau)
        n_live = jnp.sum(base3 * (t3 > 0)) + jnp.sum(base2 * (t2 > 0))
        rob3 = jnp.where(n_live >= 6, t3, huber_weight(e3, tau))
        rob2 = jnp.where(n_live >= 6, t2, huber_weight(e2, tau))
        lam0 = jnp.asarray(1e-3, X.dtype)
        (R, t, _, _, _), _ = jax.lax.scan(
            lm_inner, (R, t, lam0, base3 * rob3, base2 * rob2), None,
            length=n_lm)
        return (R, t, base3 * rob3, base2 * rob2), None

    (R, t, w3, _), _ = jax.lax.scan(outer, (R0, t0, base3, base2),
                                    jnp.arange(n_irls))
    R = orthonormalize_fast(R)
    r3, _ = _residuals(K, R, t, X, px)
    err = jnp.linalg.norm(r3, axis=-1)
    w_final = base3 * tukey_weight(err, tau)
    return IRLSPoseResult(R=R, t=t, weights=w_final, err=err,
                          cost=jnp.sum(w_final * err * err))
