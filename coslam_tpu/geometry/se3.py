"""SO(3) / SE(3) exponential and logarithm maps, batched.

Replaces the reference's rotation utilities: the hand-rolled SO(3) exp map in
SL_IntraCamPose.cpp:10-38, quaternion conversions (LibVisualSLAM
SL_Quaternion.h, used at SL_CoSLAMBA.cpp:313,490) and
``approxRotationMat`` re-orthonormalization used by the pose-graph solver
(SL_GlobalPoseEstimation.cpp — rotations solved linearly then projected).

Conventions: rotations are 3x3 row-major world->camera matrices; a camera
pose is (R, t) with x_cam = R @ x_world + t (matches the reference's
CamPoseItem, SL_Camera.h:12-56). All functions are pure, f32-friendly, and
batch over leading axes via vmap or native broadcasting where noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: [..., 3] axis-angle -> [..., 3, 3] rotation.

    Taylor-safe near theta=0 (needed because jitted IRLS repeatedly calls
    this with near-zero updates).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    # sin(t)/t and (1-cos t)/t^2 with series fallback
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle (theta in [0, pi])."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # vee of (R - R^T)/2
    v = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], axis=-1) * 0.5
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    scale = jnp.where(small, 1.0 + theta * theta / 6.0, theta / jnp.where(small, 1.0, sin_t + _EPS))
    w = v * scale[..., None]
    # near theta = pi the vee formula degenerates; use diagonal extraction
    near_pi = theta > 3.1
    Rd = jnp.diagonal(R, axis1=-2, axis2=-1)
    axis_sq = jnp.clip((Rd - cos_t[..., None]) / jnp.where(cos_t[..., None] < 1.0, 1.0 - cos_t[..., None], 1.0), 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs from off-diagonals
    sx = jnp.sign(R[..., 2, 1] - R[..., 1, 2])
    sy = jnp.sign(R[..., 0, 2] - R[..., 2, 0])
    sz = jnp.sign(R[..., 1, 0] - R[..., 0, 1])
    s = jnp.stack([jnp.where(sx == 0, 1.0, sx),
                   jnp.where(sy == 0, 1.0, sy),
                   jnp.where(sz == 0, 1.0, sz)], axis=-1)
    w_pi = axis * s * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w)


def se3_exp(xi: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 6] twist (w, v) -> (R [...,3,3], t [...,3]).

    t = V(w) @ v with the standard left-Jacobian V.
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta + _EPS))
    W = so3_hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    R = so3_exp(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> [..., 6] twist (w, v)."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    W = so3_hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2)(1 - theta sin/(2(1-cos))) W^2
    cot_term = jnp.where(
        small, 1.0 / 12.0 + theta2 / 720.0,
        (1.0 - theta * jnp.sin(theta) / (2.0 * (1.0 - jnp.cos(theta)) + _EPS)) / (theta2 + _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    Vinv = eye - 0.5 * W + cot_term[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([w, v], axis=-1)


def project_to_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation to [..., 3, 3] M (Frobenius), det +1.

    The reference's ``approxRotationMat``: pose-graph rotations are solved as
    9 free entries per node and then re-orthonormalized
    (SL_GlobalPoseEstimation.cpp:52-219).
    """
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.concatenate(
        [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]],
        axis=-1)
    return (U * D[..., None, :]) @ Vt


def orthonormalize_fast(R: jnp.ndarray, iters: int = 2) -> jnp.ndarray:
    """Cheap Newton re-orthonormalization: R <- R (3I - R^T R) / 2.

    Quadratic convergence for near-orthonormal input — repeated f32
    rotation composition (LM updates, BA corrections, history rotations)
    drifts off SO(3) multiplicatively (observed 5e-2 after ~50 frames of
    chained solves); every solver output passes through this.
    """
    eye3 = 3.0 * jnp.eye(3, dtype=R.dtype)
    for _ in range(iters):
        R = 0.5 * R @ (eye3 - jnp.swapaxes(R, -1, -2) @ R)
    return R


def compose(Ra, ta, Rb, tb):
    """(Ra,ta) after (Rb,tb): x -> Ra(Rb x + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def invert(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def relative_pose(R1, t1, R2, t2):
    """Relative transform taking camera-1 coords to camera-2 coords:
    x2 = R21 x1 + t21 where R21 = R2 R1^T, t21 = t2 - R21 t1."""
    R21 = R2 @ jnp.swapaxes(R1, -1, -2)
    t21 = t2 - jnp.einsum("...ij,...j->...i", R21, t1)
    return R21, t21


def so3_exp_np(w) -> "np.ndarray":
    """Host-side Rodrigues ([3] -> [3, 3], numpy). Trajectory/test-scene
    generators call so3_exp once per frame; on a tunneled device each of
    those tiny calls is a full round trip, so host helpers use this."""
    import numpy as np
    w = np.asarray(w, np.float64)
    th = float(np.linalg.norm(w))
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-8:
        R = np.eye(3) + W
    else:
        R = np.eye(3) + np.sin(th) / th * W \
            + (1 - np.cos(th)) / th ** 2 * (W @ W)
    return R.astype(np.float32)
