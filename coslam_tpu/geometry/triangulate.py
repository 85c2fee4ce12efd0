"""Triangulation: two-view / multi-view DLT, covariances, sequential refine.

Replaces LibVisualSLAM geometry/SL_Triangulate.h (``binTriangulate``,
``triangulateMultiView``, ``seqTriangulate``, ``getTriangulateCovMat``,
``isAtCameraBack``, ``reprojErrorSingle`` — call sites e.g.
SL_SingleSLAM.cpp:950,1047, SL_CoSLAM.cpp:651-661, SL_CoSLAMHelper.cpp).

Design: everything is batched over a leading point axis with a per-view
validity mask, so a single call triangulates thousands of candidate points
across up to ``max_cameras`` views — the per-point work is tiny 3x3/4x4
dense algebra that XLA fuses well. DLT is solved via the smallest
eigenvector of the 4x4 normal matrix A^T A (batched eigh), avoiding
batched SVD of tall matrices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.camera import projection_jacobian


def _dlt_rows(R: jnp.ndarray, t: jnp.ndarray, xn: jnp.ndarray) -> jnp.ndarray:
    """Two DLT rows per view from normalized coords.

    P = [R | t] (3x4); rows: x*P3 - P1, y*P3 - P2.  Returns [..., 2, 4].
    """
    P = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    x = xn[..., 0:1, None]
    y = xn[..., 1:2, None]
    r1 = x * P[..., 2:3, :] - P[..., 0:1, :]
    r2 = y * P[..., 2:3, :] - P[..., 1:2, :]
    return jnp.concatenate([r1, r2], axis=-2)


def triangulate_multiview(Rs: jnp.ndarray, ts: jnp.ndarray, xns: jnp.ndarray,
                          mask: jnp.ndarray) -> jnp.ndarray:
    """Masked multi-view DLT.

    Rs: [..., V, 3, 3], ts: [..., V, 3], xns: [..., V, 2] normalized coords,
    mask: [..., V] bool. Returns X: [..., 3]. Invalid views contribute zero
    rows. With <2 valid views the result is meaningless — callers gate on
    ``mask.sum(-1) >= 2``.
    """
    rows = _dlt_rows(Rs, ts, xns)  # [..., V, 2, 4]
    rows = rows * mask[..., None, None].astype(rows.dtype)
    A = rows.reshape(*rows.shape[:-3], -1, 4)  # [..., 2V, 4]
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    # smallest eigenvector of symmetric 4x4
    w, V = jnp.linalg.eigh(AtA)
    h = V[..., :, 0]
    wh = h[..., 3]
    wh = jnp.where(jnp.abs(wh) < 1e-12, jnp.sign(wh) * 1e-12 + 1e-15, wh)
    return h[..., :3] / wh[..., None]


def inv3x3_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched symmetric 3x3 inverse (cofactors)."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    inv = jnp.stack([
        jnp.stack([co00, co01, co02], axis=-1),
        jnp.stack([co01, co11, co12], axis=-1),
        jnp.stack([co02, co12, co22], axis=-1),
    ], axis=-2)
    return inv / det[..., None, None]


def triangulate_multiview_linear(Rs: jnp.ndarray, ts: jnp.ndarray,
                                 xns: jnp.ndarray,
                                 mask: jnp.ndarray) -> jnp.ndarray:
    """Inhomogeneous multi-view DLT: solve A[:, :3] X = -A[:, 3] via 3x3
    normal equations in closed form. ~10x cheaper than the eigh-based
    homogeneous solve (no batched eigendecomposition) and equivalent for
    finite points; use the eigh variant when points near infinity matter.
    Shapes as triangulate_multiview.
    """
    rows = _dlt_rows(Rs, ts, xns)                       # [..., V, 2, 4]
    rows = rows * mask[..., None, None].astype(rows.dtype)
    A = rows.reshape(*rows.shape[:-3], -1, 4)           # [..., 2V, 4]
    M = A[..., :3]
    b = -A[..., 3]
    H = jnp.einsum("...ki,...kj->...ij", M, M) + 1e-9 * jnp.eye(3, dtype=A.dtype)
    g = jnp.einsum("...ki,...k->...i", M, b)
    return jnp.einsum("...ij,...j->...i", inv3x3_sym(H), g)


def triangulate_multiview_ln(Rs: jnp.ndarray, ts: jnp.ndarray,
                             xn: jnp.ndarray, w: jnp.ndarray):
    """Lane-major multiview DLT for shared camera poses.

    Rs: [C, 3, 3], ts: [C, 3] (the same views for every point);
    xn: [C, 2, P] normalized coords; w: [C, P] weights/mask.
    Returns (X [3, P], Hn [3][3] lower-triangular list of [P] normal-matrix
    entries). The point axis sits on the 128-lane dimension and every 3x3
    is unrolled scalars-times-vectors — the [P, V, 2, 4] row layout of
    ``triangulate_multiview_linear`` wastes ~96% of each vector tile when
    P is a leading axis (measured: the classification stage dropped ~4x
    on rewriting to this form)."""
    C = Rs.shape[0]
    P = xn.shape[-1]
    dt = xn.dtype
    H = [[jnp.full((P,), 1e-9 if i == j else 0.0, dt) for j in range(3)]
         for i in range(3)]
    g = [jnp.zeros((P,), dt) for _ in range(3)]
    for c in range(C):
        R = Rs[c]
        t = ts[c]
        x, y = xn[c, 0], xn[c, 1]
        wc = w[c].astype(dt)
        M1 = [x * R[2, j] - R[0, j] for j in range(3)]   # 3 x [P]
        M2 = [y * R[2, j] - R[1, j] for j in range(3)]
        b1 = t[0] - x * t[2]
        b2 = t[1] - y * t[2]
        for i in range(3):
            for j in range(i + 1):
                H[i][j] = H[i][j] + wc * (M1[i] * M1[j] + M2[i] * M2[j])
            g[i] = g[i] + wc * (M1[i] * b1 + M2[i] * b2)
    X = solve3x3_sym_ln(H, g)
    return jnp.stack(X), H


def solve3x3_sym_ln(H, g):
    """Solve the symmetric 3x3 system H x = g, entries as [P] vectors.
    H: 3x3 nested list (lower triangle filled); g: list of 3 [P] arrays.
    Returns a list of 3 [P] arrays (adjugate/determinant closed form)."""
    a00, a01, a02 = H[0][0], H[1][0], H[2][0]
    a11, a12, a22 = H[1][1], H[2][1], H[2][2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    x0 = (c00 * g[0] + c01 * g[1] + c02 * g[2]) / det
    x1 = (c01 * g[0] + c11 * g[1] + c12 * g[2]) / det
    x2 = (c02 * g[0] + c12 * g[1] + c22 * g[2]) / det
    return [x0, x1, x2]


def inv3x3_sym_ln(H):
    """Inverse of symmetric 3x3 with [P]-vector entries: returns a 3x3
    nested list (full, symmetric)."""
    a00, a01, a02 = H[0][0], H[1][0], H[2][0]
    a11, a12, a22 = H[1][1], H[2][1], H[2][2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    det = jnp.where(jnp.abs(det) < 1e-18, 1e-18, det)
    i00, i01, i02 = c00 / det, c01 / det, c02 / det
    i11, i12, i22 = c11 / det, c12 / det, c22 / det
    return [[i00, i01, i02], [i01, i11, i12], [i02, i12, i22]]


def triangulate_two_view(R1, t1, R2, t2, xn1, xn2) -> jnp.ndarray:
    """binTriangulate equivalent. All args broadcast; xn* are [..., 2]."""
    Rs = jnp.stack([jnp.broadcast_to(R1, xn1.shape[:-1] + (3, 3)),
                    jnp.broadcast_to(R2, xn2.shape[:-1] + (3, 3))], axis=-3)
    ts = jnp.stack([jnp.broadcast_to(t1, xn1.shape[:-1] + (3,)),
                    jnp.broadcast_to(t2, xn2.shape[:-1] + (3,))], axis=-2)
    xns = jnp.stack([xn1, xn2], axis=-2)
    mask = jnp.ones(xns.shape[:-1], dtype=bool)
    return triangulate_multiview(Rs, ts, xns, mask)


def triangulate_two_view_midpoint(R1, t1, R2, t2, xn1, xn2):
    """Closed-form midpoint triangulation (no eigh — cheap enough to run
    for every candidate (track, history-view) pair when seeding new map
    points). All args broadcast over leading axes; xn* are normalized
    coords [..., 2].

    Returns (X [..., 3], depth1 [...], depth2 [...], parallax_cos [...]).
    depth* are signed ray parameters (positive = in front); parallax_cos
    is the cosine of the ray angle (near 1 = degenerate baseline).
    """
    c1 = -jnp.einsum("...ji,...j->...i", R1, t1)
    c2 = -jnp.einsum("...ji,...j->...i", R2, t2)
    d1 = jnp.einsum("...ji,...j->...i", R1,
                    jnp.concatenate([xn1, jnp.ones_like(xn1[..., :1])], axis=-1))
    d2 = jnp.einsum("...ji,...j->...i", R2,
                    jnp.concatenate([xn2, jnp.ones_like(xn2[..., :1])], axis=-1))
    n1 = jnp.linalg.norm(d1, axis=-1, keepdims=True)
    n2 = jnp.linalg.norm(d2, axis=-1, keepdims=True)
    u1 = d1 / jnp.maximum(n1, 1e-12)
    u2 = d2 / jnp.maximum(n2, 1e-12)
    b = c2 - c1
    d12 = jnp.einsum("...i,...i->...", u1, u2)
    bd1 = jnp.einsum("...i,...i->...", b, u1)
    bd2 = jnp.einsum("...i,...i->...", b, u2)
    den = 1.0 - d12 * d12
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    s = (bd1 - d12 * bd2) / den        # along u1
    r = (d12 * bd1 - bd2) / den        # along u2
    X = 0.5 * (c1 + s[..., None] * u1 + c2 + r[..., None] * u2)
    return X, s, r, d12


def triangulate_two_view_midpoint_ln(R1, t1, R2, t2, x1, y1, x2, y2):
    """Lane-major midpoint triangulation: 3-vectors as component arrays.

    R1/R2: [..., 3, 3], t1/t2: [..., 3] — leading dims must broadcast
    against the coordinate arrays' leading dims; x1, y1, x2, y2: [..., N]
    normalized coordinates with the point axis last (on the 128 lanes).
    Returns (X: list of 3 [..., N] arrays, s1, s2, parallax_cos), matching
    ``triangulate_two_view_midpoint`` (unit-ray signed depths) without the
    [..., 3]-trailing layout that wastes vector tiles when the point axis
    leads."""
    def cam_center(R, t):
        return [-(R[..., 0, i] * t[..., 0] + R[..., 1, i] * t[..., 1]
                  + R[..., 2, i] * t[..., 2])[..., None] for i in range(3)]

    def ray(R, x, y):
        d = [R[..., 0, i][..., None] * x + R[..., 1, i][..., None] * y
             + R[..., 2, i][..., None] for i in range(3)]
        n = jnp.sqrt(d[0] * d[0] + d[1] * d[1] + d[2] * d[2])
        n = jnp.maximum(n, 1e-12)
        return [di / n for di in d]

    c1 = cam_center(R1, t1)
    c2 = cam_center(R2, t2)
    u1 = ray(R1, x1, y1)
    u2 = ray(R2, x2, y2)
    b = [c2[i] - c1[i] for i in range(3)]
    d12 = u1[0] * u2[0] + u1[1] * u2[1] + u1[2] * u2[2]
    bd1 = b[0] * u1[0] + b[1] * u1[1] + b[2] * u1[2]
    bd2 = b[0] * u2[0] + b[1] * u2[1] + b[2] * u2[2]
    den = 1.0 - d12 * d12
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    s = (bd1 - d12 * bd2) / den
    r = (d12 * bd1 - bd2) / den
    X = [0.5 * (c1[i] + s * u1[i] + c2[i] + r * u2[i]) for i in range(3)]
    return X, s, r, d12


def reproj_errors(K, R, t, X, px) -> jnp.ndarray:
    """Euclidean reprojection error in pixels (reprojErrorSingle)."""
    from coslam_tpu.geometry.camera import project_points
    pr = project_points(K, R, t, X)
    return jnp.linalg.norm(pr - px, axis=-1)


def is_at_camera_back(R, t, X) -> jnp.ndarray:
    """True where the point has non-positive depth in the camera."""
    z = jnp.einsum("...j,...j->...", R[..., 2, :], X) + t[..., 2]
    return z <= 0.0


def triangulation_cov(Ks, Rs, ts, X, mask, pixel_var: float = 1.0) -> jnp.ndarray:
    """getTriangulateCovMat equivalent: 3x3 covariance of the triangulated
    point from first-order propagation of iid pixel noise.

    Ks: [..., V, 3, 3], Rs: [..., V, 3, 3], ts: [..., V, 3], X: [..., 3],
    mask: [..., V].  cov = pixel_var * (sum_v J_v^T J_v)^{-1}.
    """
    J = projection_jacobian(Ks, Rs, ts, X[..., None, :])  # [..., V, 2, 3]
    J = J * mask[..., None, None].astype(J.dtype)
    H = jnp.einsum("...vki,...vkj->...ij", J, J)  # [..., 3, 3]
    H = H + 1e-9 * jnp.eye(3, dtype=H.dtype)
    return pixel_var * inv3x3_sym(H)


def seq_triangulate_update(K, R, t, px_undist, X, cov,
                           pixel_var: float = 1.0,
                           gate_maha2: float | None = None):
    """Sequential (information-filter) refinement of a map point with one new
    observation — the seqTriangulate role in poseUpdate3D
    (SL_SingleSLAM.cpp:600-753): fold the current frame's measurement into
    (X, cov) with a single Gauss-Newton/Kalman step.

    Returns (X_new, cov_new, maha2) where maha2 is the innovation's squared
    Mahalanobis distance (for the caller's outlier gate). If gate_maha2 is
    given, updates are suppressed (X, cov passed through) where
    maha2 > gate_maha2.
    """
    from coslam_tpu.geometry.camera import project_points, mahalanobis2_2d
    pred = project_points(K, R, t, X)
    r = px_undist - pred                               # innovation [..., 2]
    J = projection_jacobian(K, R, t, X)                # [..., 2, 3]
    S = J @ cov @ jnp.swapaxes(J, -1, -2) + pixel_var * jnp.eye(2, dtype=X.dtype)
    maha2 = mahalanobis2_2d(r, S)
    # Kalman gain: cov J^T S^{-1}
    a, b, c = S[..., 0, 0], S[..., 0, 1], S[..., 1, 1]
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    Sinv = jnp.stack([
        jnp.stack([c / det, -b / det], axis=-1),
        jnp.stack([-b / det, a / det], axis=-1),
    ], axis=-2)
    Kg = cov @ jnp.swapaxes(J, -1, -2) @ Sinv          # [..., 3, 2]
    X_new = X + jnp.einsum("...ij,...j->...i", Kg, r)
    cov_new = (jnp.eye(3, dtype=X.dtype) - Kg @ J) @ cov
    if gate_maha2 is not None:
        ok = (maha2 <= gate_maha2)[..., None]
        X_new = jnp.where(ok, X_new, X)
        cov_new = jnp.where(ok[..., None], cov_new, cov)
    return X_new, cov_new, maha2
