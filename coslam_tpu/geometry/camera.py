"""Camera model: intrinsics, radial-tangential distortion, projection.

Replaces the LibVisualSLAM distortion/projection surface the reference
uses everywhere (SURVEY.md §2.9): ``undistorPoint``/``normPoint``/
``invDistorParam`` (SL_Distortion.h, used at GPUKLT.cpp:43-47 and
SL_CoSLAM.cpp:97-98), ``project``/``getProjectionCovMat``
(SL_Triangulate.h), ``getCameraCenter`` (SL_Geometry.h).

Distortion model = OpenCV 5-coefficient (k1,k2,p1,p2,k3), matching the
reference's calibration file format (README.md:101-116). The reference
precomputes an inverse-distortion polynomial (``invDistorParam``); here we
undistort by fixed-point iteration (8 rounds), which is jit/vmap friendly
and accurate to <1e-4 px for realistic coefficients.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Intrinsics(NamedTuple):
    """Per-camera intrinsics. K is [..., 3, 3]; kc is [..., 5]."""

    K: jnp.ndarray
    kc: jnp.ndarray

    @property
    def fx(self):
        return self.K[..., 0, 0]

    @property
    def fy(self):
        return self.K[..., 1, 1]

    @property
    def cx(self):
        return self.K[..., 0, 2]

    @property
    def cy(self):
        return self.K[..., 1, 2]

    @staticmethod
    def simple(f: float, cx: float, cy: float, dtype=jnp.float32) -> "Intrinsics":
        K = jnp.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=dtype)
        return Intrinsics(K=K, kc=jnp.zeros((5,), dtype=dtype))


def distort_normalized(xn: jnp.ndarray, kc: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized coords [..., 2]."""
    x, y = xn[..., 0], xn[..., 1]
    k1, k2, p1, p2, k3 = kc[..., 0], kc[..., 1], kc[..., 2], kc[..., 3], kc[..., 4]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xd: jnp.ndarray, kc: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert distortion by fixed-point iteration (replaces invDistorParam)."""
    def body(_, xn):
        # xd = distort(xn) ~ xn * radial + tang  =>  xn = (xd - tang)/radial
        x, y = xn[..., 0], xn[..., 1]
        k1, k2, p1, p2, k3 = kc[..., 0], kc[..., 1], kc[..., 2], kc[..., 3], kc[..., 4]
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
        tx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        ty = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        nx = (xd[..., 0] - tx) / radial
        ny = (xd[..., 1] - ty) / radial
        return jnp.stack([nx, ny], axis=-1)

    return jax.lax.fori_loop(0, iters, body, xd)


def pixel_to_normalized(px: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] pixel -> normalized (pre-distortion-removal)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    s = K[..., 0, 1]
    y = (px[..., 1] - cy) / fy
    x = (px[..., 0] - cx - s * y) / fx
    return jnp.stack([x, y], axis=-1)


def normalized_to_pixel(xn: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    s = K[..., 0, 1]
    u = fx * xn[..., 0] + s * xn[..., 1] + cx
    v = fy * xn[..., 1] + cy
    return jnp.stack([u, v], axis=-1)


def undistort_points(px: jnp.ndarray, K: jnp.ndarray, kc: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted pixel coords (GPUKLT.cpp:43-47
    pipeline: the SLAM core works in undistorted pixel space)."""
    xn = undistort_normalized(pixel_to_normalized(px, K), kc)
    return normalized_to_pixel(xn, K)


def normalize_points(px: jnp.ndarray, K: jnp.ndarray, kc: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixel coords -> undistorted normalized coords (normPoint)."""
    return undistort_normalized(pixel_to_normalized(px, K), kc)


def project_points(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   X: jnp.ndarray, kc: jnp.ndarray | None = None) -> jnp.ndarray:
    """World points [..., 3] -> (undistorted) pixels [..., 2].

    Broadcasts: K/R/t may carry leading batch axes compatible with X.
    If kc is given, applies distortion (for synthesizing raw observations).
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    xn = Xc[..., :2] / zs[..., None]
    if kc is not None:
        xn = distort_normalized(xn, kc)
    return normalized_to_pixel(xn, K)


def camera_depths(R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...j,...j->...", R[..., 2, :], X) + t[..., 2]


def camera_center(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """c = -R^T t (SL_Geometry.h getCameraCenter)."""
    return -jnp.einsum("...ji,...j->...i", R, t)


def projection_jacobian(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                        X: jnp.ndarray) -> jnp.ndarray:
    """d(pixel)/d(X_world): [..., 2, 3] (no distortion — SLAM core is in
    undistorted pixel space, as in the reference)."""
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    # d(u,v)/dXc
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1)
    dv = jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1)
    J_cam = jnp.stack([du, dv], axis=-2)  # [..., 2, 3]
    return J_cam @ R


def projection_cov(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   X: jnp.ndarray, cov_X: jnp.ndarray,
                   pixel_var: float = 1.0) -> jnp.ndarray:
    """Covariance of the projected pixel given 3D point covariance
    (getProjectionCovMat equivalent): J cov_X J^T + pixel_var I."""
    J = projection_jacobian(K, R, t, X)
    C = J @ cov_X @ jnp.swapaxes(J, -1, -2)
    eye = jnp.eye(2, dtype=C.dtype)
    return C + pixel_var * eye


def mahalanobis2_2d(d: jnp.ndarray, cov: jnp.ndarray) -> jnp.ndarray:
    """Squared Mahalanobis distance of 2D residual d under 2x2 cov
    (mahaDist2 equivalent; closed-form inverse)."""
    a = cov[..., 0, 0]
    b = cov[..., 0, 1]
    c = cov[..., 1, 1]
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dx, dy = d[..., 0], d[..., 1]
    return (c * dx * dx - 2.0 * b * dx * dy + a * dy * dy) / det
