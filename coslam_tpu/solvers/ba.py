"""Windowed robust bundle adjustment: batched device-side LM with dense
Schur complement over landmark blocks.

Replaces the reference's sba-1.6 / LAPACK sparse BA (`BundleRTS`,
SL_CoSLAMBA.cpp:360 calling sba_motstr_levmar_x) and the robust variant
actually used in the pipeline (`RobustBundleRTS` -> LibVisualSLAM
``bundleAdjustRobust`` with Tukey-style reweighting and per-measurement
outlier out-flags; SL_CoSLAMRobustBA.cpp:174,296-309 — contract re-derived
per SURVEY.md §7 hard part #4).

TPU-first design (the reference has no analogue): the camera count in a
window is tiny (<= cameras x keyframes ~ tens), so the reduced camera
system is a small DENSE matrix. Per-observation 2x6 / 2x3 Jacobian blocks
are built for all observations at once, accumulated with segment-sums,
landmark blocks are inverted in closed form (3x3), and the Schur product
is one einsum on the MXU. For multi-host operation the observation axis is
sharded and (Hcc, W-products, rhs) are psum-reduced over ICI before the
replicated dense solve (see parallel/dist_ba.py).

Gauge/constraint handling mirrors the reference: the first ``n_cams_fixed``
cameras are frozen (nCamsCon, SL_CoSLAMRobustBA.h:30-46), and points may be
frozen via ``point_fixed`` (nPtsCon).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.se3 import se3_exp, so3_hat
from coslam_tpu.geometry.robust import tukey_weight, huber_weight


class BAProblem(NamedTuple):
    """Static-shaped BA problem.

    M cameras, P points, O observation slots (padded; ``obs_valid`` masks).
    """

    K: jnp.ndarray           # [M, 3, 3]
    R: jnp.ndarray           # [M, 3, 3] initial
    t: jnp.ndarray           # [M, 3]
    X: jnp.ndarray           # [P, 3] initial
    obs_cam: jnp.ndarray     # [O] int32 camera index
    obs_pt: jnp.ndarray      # [O] int32 point index
    obs_px: jnp.ndarray      # [O, 2] undistorted pixel measurements
    obs_valid: jnp.ndarray   # [O] bool
    cam_fixed: jnp.ndarray   # [M] bool (gauge anchors / constrained cams)
    point_fixed: jnp.ndarray  # [P] bool


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    obs_outlier: jnp.ndarray   # [O] bool — the Meas2D.outlier out-flags
    obs_err: jnp.ndarray       # [O] final reprojection error (px)
    cost: jnp.ndarray


def _project_res(K, R, t, X, obs_cam, obs_pt, obs_px):
    Rm = R[obs_cam]
    tm = t[obs_cam]
    Km = K[obs_cam]
    Xo = X[obs_pt]
    Xc = jnp.einsum("oij,oj->oi", Rm, Xo) + tm
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = Km[:, 0, 0], Km[:, 1, 1]
    cx, cy = Km[:, 0, 2], Km[:, 1, 2]
    pr = jnp.stack([fx * Xc[:, 0] / zs + cx, fy * Xc[:, 1] / zs + cy], axis=-1)
    return pr - obs_px, Xc, Rm, Km


def _obs_jacobians(Km, Rm, Xc):
    """Returns (Jc [O,2,6] wrt camera left-increment, Jp [O,2,3] wrt point)."""
    x, y, z = Xc[:, 0], Xc[:, 1], Xc[:, 2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx, fy = Km[:, 0, 0], Km[:, 1, 1]
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1)
    dv = jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1)
    Jpx = jnp.stack([du, dv], axis=-2)                     # [O, 2, 3] d/dXc
    eye = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    dXc_dxi = jnp.concatenate([-so3_hat(Xc), eye], axis=-1)  # [O, 3, 6]
    Jc = Jpx @ dXc_dxi
    Jp = Jpx @ Rm
    return Jc, Jp


def _inv3x3(A):
    """Closed-form batched symmetric 3x3 inverse with damping."""
    A = A + 1e-8 * jnp.eye(3, dtype=A.dtype)
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


def _ba_normal_terms(K, R, t, X, prob: BAProblem, w, axis_name=None):
    """Build (Hcc [M,6,6], W [P,M,6,3], Hpp [P,3,3], gc [M,6], gp [P,3],
    cost) for current state. ``w`` are per-observation robust weights.

    With ``axis_name`` set (inside shard_map with observations sharded
    across devices), the accumulated blocks are psum-reduced over the mesh
    — this is the distributed Schur-BA reduction: camera/landmark blocks
    summed over ICI, dense reduced solve replicated (SURVEY.md §7 stage 5).
    """
    M = prob.K.shape[0]
    P = prob.X.shape[0]
    r, Xc, Rm, Km = _project_res(K, R, t, X, prob.obs_cam, prob.obs_pt,
                                 prob.obs_px)
    behind = Xc[:, 2] <= 1e-6
    we = jnp.where(behind, 0.0, w)
    Jc, Jp = _obs_jacobians(Km, Rm, Xc)
    # zero dead observations' Jacobians before products (see _table_terms:
    # z ~ 0 rows overflow f32 in the products and 0 * inf = NaN)
    live = (we > 0)[:, None, None]
    Jc = jnp.where(live, Jc, 0.0)
    Jp = jnp.where(live, Jp, 0.0)
    A_cc = jnp.einsum("o,oki,okj->oij", we, Jc, Jc)      # [O,6,6]
    A_pp = jnp.einsum("o,oki,okj->oij", we, Jp, Jp)      # [O,3,3]
    A_cp = jnp.einsum("o,oki,okj->oij", we, Jc, Jp)      # [O,6,3]
    gc_o = jnp.einsum("o,oki,ok->oi", we, Jc, r)         # [O,6]
    gp_o = jnp.einsum("o,oki,ok->oi", we, Jp, r)         # [O,3]
    Hcc = jax.ops.segment_sum(A_cc, prob.obs_cam, num_segments=M)
    Hpp = jax.ops.segment_sum(A_pp, prob.obs_pt, num_segments=P)
    Wcp = jax.ops.segment_sum(A_cp, prob.obs_pt * M + prob.obs_cam,
                              num_segments=P * M).reshape(P, M, 6, 3)
    gc = jax.ops.segment_sum(gc_o, prob.obs_cam, num_segments=M)
    gp = jax.ops.segment_sum(gp_o, prob.obs_pt, num_segments=P)
    cost = jnp.sum(we * jnp.sum(r * r, axis=-1))
    if axis_name is not None:
        Hcc, Wcp, Hpp, gc, gp, cost = jax.lax.psum(
            (Hcc, Wcp, Hpp, gc, gp, cost), axis_name)
    return Hcc, Wcp, Hpp, gc, gp, cost


def _apply_updates(R, t, X, dxi, dX, cam_fixed, point_fixed):
    dxi = jnp.where(cam_fixed[:, None], 0.0, dxi)
    dX = jnp.where(point_fixed[:, None], 0.0, dX)
    dRs, dts = se3_exp(dxi)
    R_new = dRs @ R
    t_new = jnp.einsum("mij,mj->mi", dRs, t) + dts
    return R_new, t_new, X + dX


def _schur_solve(Hcc, Wcp, Hpp, gc, gp, lam, cam_fixed, point_fixed):
    """One damped GN step via Schur elimination of the landmark blocks."""
    M = Hcc.shape[0]
    P = Hpp.shape[0]
    dt = Hcc.dtype
    # LM damping: scaled-diagonal plus a small absolute floor
    Hcc_d = Hcc + lam * (jnp.eye(6, dtype=dt) * 1e-3
                         + Hcc * jnp.eye(6, dtype=dt))
    Hpp_d = Hpp + lam * (jnp.eye(3, dtype=dt) * 1e-3
                         + Hpp * jnp.eye(3, dtype=dt))
    # freeze fixed points: identity block, zero rhs/coupling
    eyeP = jnp.broadcast_to(jnp.eye(3, dtype=dt), Hpp_d.shape)
    Hpp_d = jnp.where(point_fixed[:, None, None], eyeP, Hpp_d)
    Wcp = jnp.where(point_fixed[:, None, None, None], 0.0, Wcp)
    gp = jnp.where(point_fixed[:, None], 0.0, gp)
    Hpp_inv = _inv3x3(Hpp_d)                               # [P,3,3]
    Y = jnp.einsum("pmis,pst->pmit", Wcp, Hpp_inv)         # [P,M,6,3]
    S = jnp.einsum("pmit,pnjt->minj", Y, Wcp)              # [M,6,M,6]
    S = -S
    S = S.at[jnp.arange(M), :, jnp.arange(M), :].add(Hcc_d)
    rhs = gc - jnp.einsum("pmit,pt->mi", Y, gp)            # [M,6]
    # freeze fixed cameras: identity rows/cols, zero rhs
    free = (~cam_fixed).astype(dt)
    S = S * free[:, None, None, None] * free[None, None, :, None]
    S = S.at[jnp.arange(M), :, jnp.arange(M), :].add(
        jnp.eye(6, dtype=dt)[None] * cam_fixed[:, None, None].astype(dt))
    rhs = rhs * free[:, None]
    Sd = S.reshape(M * 6, M * 6)
    dc = -jnp.linalg.solve(Sd, rhs.reshape(-1)).reshape(M, 6)
    # back-substitute points: dX = -Hpp^{-1} (gp + W^T dc)
    Wt_dc = jnp.einsum("pmis,mi->ps", Wcp, dc)             # [P,3]
    dX = -jnp.einsum("pst,pt->ps", Hpp_inv, gp + Wt_dc)
    return dc, dX


# ---------------------------------------------------------------------------
# dense-table formulation (windowed BA fast path)
# ---------------------------------------------------------------------------

class BATableProblem(NamedTuple):
    """Windowed BA with the observation structure the window actually has:
    each point is observed at most once per (keyframe, camera) slot, so
    observations form a dense [P, S] table (S = window x cameras; slot s
    IS camera s of the packed window). This removes every segment-sum
    scatter of the list formulation: camera blocks reduce over the point
    lane axis, point blocks accumulate over the (static) slot loop, and
    the Schur product is one [6S, 3P] x [3P, 6S] matmul on the MXU
    (measured ~5x more LM iterations/s at 15 slots x 2048 points)."""

    K: jnp.ndarray           # [S, 3, 3]
    R: jnp.ndarray           # [S, 3, 3] initial
    t: jnp.ndarray           # [S, 3]
    X: jnp.ndarray           # [P, 3] initial
    obs_px: jnp.ndarray      # [S, 2, P] undistorted pixels (lane-major)
    obs_valid: jnp.ndarray   # [S, P]
    cam_fixed: jnp.ndarray   # [S]
    point_fixed: jnp.ndarray  # [P]


class BATableResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    obs_outlier: jnp.ndarray   # [S, P]
    obs_err: jnp.ndarray       # [S, P]
    cost: jnp.ndarray
    obs_valid: jnp.ndarray     # [S, P] problem mask passthrough (the
                               # write-back kill rule needs per-point
                               # observation counts alongside outliers)


def _table_jacobians(K, R, t, Xl, obs_px):
    """Batched over the slot axis (no Python loop -> compact HLO).
    Xl: 3 x [P]. Returns (ru, rv, z [S,P], Ju6/Jv6 lists of 6 [S,P],
    Jup/Jvp lists of 3 [S,P])."""
    Xc = [R[:, i, 0, None] * Xl[0][None] + R[:, i, 1, None] * Xl[1][None]
          + R[:, i, 2, None] * Xl[2][None] + t[:, i, None]
          for i in range(3)]                                 # 3 x [S, P]
    z = Xc[2]
    zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    fx = K[:, 0, 0][:, None]
    fy = K[:, 1, 1][:, None]
    cx = K[:, 0, 2][:, None]
    cy = K[:, 1, 2][:, None]
    ru = fx * Xc[0] * zi + cx - obs_px[:, 0]
    rv = fy * Xc[1] * zi + cy - obs_px[:, 1]
    xz = Xc[0] * zi
    yz = Xc[1] * zi
    zero = jnp.zeros_like(z)
    # camera Jacobian rows (left-increment (w, v)), as in solvers/pose
    Ju6 = [-fx * xz * yz, fx * (1.0 + xz * xz), -fx * yz,
           fx * zi, zero, -fx * xz * zi]
    Jv6 = [-fy * (1.0 + yz * yz), fy * xz * yz, fy * xz,
           zero, fy * zi, -fy * yz * zi]
    # point Jacobian rows: d(px)/dX = Jpx @ R
    Jup = [fx * (R[:, 0, j, None] - xz * R[:, 2, j, None]) * zi
           for j in range(3)]
    Jvp = [fy * (R[:, 1, j, None] - yz * R[:, 2, j, None]) * zi
           for j in range(3)]
    return ru, rv, z, Ju6, Jv6, Jup, Jvp


def _table_terms(K, R, t, Xl, prob: BATableProblem, w, axis_name=None):
    """Lane-major normal-equation blocks, slot-batched. Xl: 3 x [P];
    w: [S, P]. Returns (Hcc [S,6,6], gc [S,6], Wcp nested [6][3] of [S,P],
    Hpp nested 3x3 lower of [P], gp 3 x [P], ru/rv [S,P], cost)."""
    P = Xl[0].shape[0]
    dt = Xl[0].dtype
    ru, rv, z, Ju6, Jv6, Jup, Jvp = _table_jacobians(K, R, t, Xl,
                                                     prob.obs_px)
    ws = jnp.where(z <= 1e-6, 0.0, w)
    # zero dead entries' Jacobians BEFORE any product: a z ~ 0 garbage
    # column (empty map slot) has Jacobian entries ~ fx/z^2 whose
    # products overflow f32 to inf, and 0-weight * inf = NaN would poison
    # the whole accumulated block
    live = ws > 0
    Ju6 = [jnp.where(live, a, 0.0) for a in Ju6]
    Jv6 = [jnp.where(live, a, 0.0) for a in Jv6]
    Jup = [jnp.where(live, a, 0.0) for a in Jup]
    Jvp = [jnp.where(live, a, 0.0) for a in Jvp]
    Hcc = jnp.stack([jnp.stack(
        [jnp.sum(ws * (Ju6[i] * Ju6[j] + Jv6[i] * Jv6[j]), axis=1)
         for j in range(6)], -1) for i in range(6)], -2)     # [S, 6, 6]
    gc = jnp.stack([jnp.sum(ws * (Ju6[i] * ru + Jv6[i] * rv), axis=1)
                    for i in range(6)], -1)                  # [S, 6]
    Wcp = [[ws * (Ju6[i] * Jup[k] + Jv6[i] * Jvp[k]) for k in range(3)]
           for i in range(6)]                                # 6x3 x [S, P]
    Hpp = [[jnp.sum(ws * (Jup[i] * Jup[j] + Jvp[i] * Jvp[j]), axis=0)
            + (1e-9 if i == j else 0.0)
            for j in range(i + 1)] for i in range(3)]        # lower, [P]
    gp = [jnp.sum(ws * (Jup[i] * ru + Jvp[i] * rv), axis=0)
          for i in range(3)]                                 # 3 x [P]
    cost = jnp.sum(ws * (ru * ru + rv * rv))
    if axis_name is not None:
        Hcc, gc, cost = jax.lax.psum((Hcc, gc, cost), axis_name)
    return Hcc, gc, Wcp, Hpp, gp, ru, rv, cost


def _table_schur(Hcc, gc, Wcp, Hpp, gp, lam, cam_fixed, point_fixed, dt,
                 axis_name=None):
    """Damped GN step: eliminate points (closed-form 3x3, lane-major),
    solve the reduced [6S, 6S] camera system, back-substitute.

    With ``axis_name`` (point axis sharded over a mesh), the reduced
    camera system's P-contractions are psum-reduced over ICI; the dense
    [6S, 6S] solve replicates, back-substitution stays local per shard —
    the distributed Schur-BA topology of SURVEY.md §7 stage 5."""
    from coslam_tpu.geometry.triangulate import inv3x3_sym_ln
    S = Hcc.shape[0]
    P = gp[0].shape[0]
    pf = point_fixed
    # freeze fixed points: identity point blocks, zero coupling/rhs
    Hpp_d = [[jnp.where(pf, 1.0 if i == j else 0.0,
                        Hpp[i][j] * (1.0 + lam * (1.0 if i == j else 0.0))
                        + (lam * 1e-3 if i == j else 0.0))
              for j in range(i + 1)] for i in range(3)]
    # rebuild full lower structure for the inverse helper
    Hfull = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for j in range(i + 1):
            Hfull[i][j] = Hpp_d[i][j]
            Hfull[j][i] = Hpp_d[i][j]
    Hinv = inv3x3_sym_ln(Hfull)
    gp_m = [jnp.where(pf, 0.0, gp[k]) for k in range(3)]
    Wm = [[jnp.where(pf[None], 0.0, Wcp[i][k]) for k in range(3)]
          for i in range(6)]                                # 6x3 x [S, P]
    # Y[i][k] = sum_l W[i][l] Hinv[l][k]
    Y = [[sum(Wm[i][l] * Hinv[l][k][None] for l in range(3))
          for k in range(3)] for i in range(6)]             # 6x3 x [S, P]
    # Schur product: one [6S, 3P] x [3P, 6S] matmul on the MXU
    Ymat = jnp.stack([jnp.stack(Y[i]) for i in range(6)])   # [6, 3, S, P]
    Ymat = Ymat.transpose(2, 0, 1, 3).reshape(S * 6, 3 * P)
    Wmat = jnp.stack([jnp.stack(Wm[i]) for i in range(6)])
    Wmat = Wmat.transpose(2, 0, 1, 3).reshape(S * 6, 3 * P)
    Sred = -(Ymat @ Wmat.T)                                 # [6S, 6S]
    gpv = jnp.stack(gp_m).reshape(3 * P)
    Ygp = (Ymat @ gpv).reshape(S, 6)
    if axis_name is not None:
        Sred, Ygp = jax.lax.psum((Sred, Ygp), axis_name)
    # damped camera blocks on the diagonal
    Hcc_d = Hcc + lam * (jnp.eye(6, dtype=dt)[None] * 1e-3
                         + Hcc * jnp.eye(6, dtype=dt)[None])
    Sred = Sred.reshape(S, 6, S, 6)
    Sred = Sred.at[jnp.arange(S), :, jnp.arange(S), :].add(Hcc_d)
    rhs = gc - Ygp
    free = (~cam_fixed).astype(dt)
    Sred = Sred * free[:, None, None, None] * free[None, None, :, None]
    Sred = Sred.at[jnp.arange(S), :, jnp.arange(S), :].add(
        jnp.eye(6, dtype=dt)[None] * cam_fixed[:, None, None].astype(dt))
    rhs = rhs * free[:, None]
    dc = -jnp.linalg.solve(Sred.reshape(S * 6, S * 6),
                           rhs.reshape(-1)).reshape(S, 6)
    # back-substitute: dX = -Hinv (gp + W^T dc)
    Wt_dc = [sum(jnp.sum(Wm[i][k] * dc[:, i, None], axis=0)
                 for i in range(6)) for k in range(3)]
    dXl = [-sum(Hinv[k][l] * (gp_m[l] + Wt_dc[l]) for l in range(3))
           for k in range(3)]
    return dc, dXl


@partial(jax.jit, static_argnames=("max_iter", "inner_iter", "axis_name"))
def bundle_adjust_table(prob: BATableProblem, max_err: float = 10.0,
                        max_iter: int = 2, inner_iter: int = 10,
                        axis_name: str | None = None) -> BATableResult:
    """Robust windowed BA over the dense [P, S] observation table. Same
    robust protocol as ``bundle_adjust`` (Huber outer passes, Tukey last,
    outlier out-flags), scatter-free and lane-major inside."""
    dt = prob.X.dtype
    base_w = prob.obs_valid.astype(dt)                     # [S, P]

    def residuals(R, t, Xl):
        Xc = [R[:, i, 0, None] * Xl[0][None]
              + R[:, i, 1, None] * Xl[1][None]
              + R[:, i, 2, None] * Xl[2][None] + t[:, i, None]
              for i in range(3)]
        z = Xc[2]
        zi = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        ru = prob.K[:, 0, 0][:, None] * Xc[0] * zi \
            + prob.K[:, 0, 2][:, None] - prob.obs_px[:, 0]
        rv = prob.K[:, 1, 1][:, None] * Xc[1] * zi \
            + prob.K[:, 1, 2][:, None] - prob.obs_px[:, 1]
        return ru, rv, z

    def inner(carry, _):
        R, t, Xl, lam, w = carry
        Hcc, gc, Wcp, Hpp, gp, ru, rv, cost = _table_terms(
            prob.K, R, t, Xl, prob, w, axis_name)
        dc, dXl = _table_schur(Hcc, gc, Wcp, Hpp, gp, lam,
                               prob.cam_fixed, prob.point_fixed, dt,
                               axis_name)
        finite = jnp.all(jnp.isfinite(dc)) & \
            jnp.all(jnp.isfinite(jnp.stack(dXl)))
        dc = jnp.where(finite, dc, 0.0)
        dc = jnp.where(prob.cam_fixed[:, None], 0.0, dc)
        dXm = [jnp.where(prob.point_fixed | ~finite, 0.0, d) for d in dXl]
        dRs, dts = se3_exp(dc)
        R_new = dRs @ R
        t_new = jnp.einsum("mij,mj->mi", dRs, t) + dts
        X_new = [Xl[k] + dXm[k] for k in range(3)]
        ru2, rv2, z2 = residuals(R_new, t_new, X_new)
        w2 = jnp.where(z2 <= 1e-6, 0.0, w)
        cost_new = jnp.sum(w2 * (ru2 * ru2 + rv2 * rv2))
        if axis_name is not None:
            cost_new = jax.lax.psum(cost_new, axis_name)
        ok = (cost_new < cost) & finite
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        Xl = [jnp.where(ok, X_new[k], Xl[k]) for k in range(3)]
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 8.0), 1e-8, 1e8)
        return (R, t, Xl, lam, w), None

    def outer(carry, k):
        R, t, Xl, w = carry
        ru, rv, z = residuals(R, t, Xl)
        en = jnp.hypot(ru, rv)
        w_rob = jnp.where(k < max_iter - 1, huber_weight(en, max_err),
                          tukey_weight(en, max_err))
        w = base_w * w_rob * (z > 1e-6)
        lam0 = jnp.asarray(1e-4, dt)
        (R, t, Xl, _, _), _ = jax.lax.scan(inner, (R, t, Xl, lam0, w), None,
                                           length=inner_iter)
        return (R, t, Xl, w), None

    Xl0 = [prob.X[:, k] for k in range(3)]
    (R, t, Xl, w), _ = jax.lax.scan(
        outer, (prob.R, prob.t, Xl0, base_w), jnp.arange(max_iter))
    from coslam_tpu.geometry.se3 import orthonormalize_fast
    R = orthonormalize_fast(R)
    ru, rv, z = residuals(R, t, Xl)
    err = jnp.hypot(ru, rv)
    outlier = prob.obs_valid & ((err > max_err) | (z <= 1e-6))
    w_fin = base_w * tukey_weight(err, max_err) * (z > 1e-6)
    cost = jnp.sum(w_fin * (ru * ru + rv * rv))
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return BATableResult(R=R, t=t, X=jnp.stack(Xl, axis=-1),
                         obs_outlier=outlier, obs_err=err, cost=cost,
                         obs_valid=prob.obs_valid)


@partial(jax.jit, static_argnames=("max_iter", "inner_iter", "axis_name"))
def bundle_adjust(prob: BAProblem, max_err: float = 10.0,
                  max_iter: int = 2, inner_iter: int = 10,
                  axis_name: str | None = None) -> BAResult:
    """Robust windowed BA.

    Outer loop (max_iter): recompute Tukey weights (tau = max_err) and flag
    outliers; inner loop (inner_iter): damped Schur-GN steps with
    accept/reject. Mirrors bundleAdjustRobust's (maxErr, maxIter,
    innerMaxIter) contract incl. outlier out-flags.
    """
    base_w = prob.obs_valid.astype(prob.X.dtype)

    def inner(carry, _):
        R, t, X, lam, w = carry
        Hcc, Wcp, Hpp, gc, gp, cost = _ba_normal_terms(
            prob.K, R, t, X, prob, w, axis_name)
        dc, dX = _schur_solve(Hcc, Wcp, Hpp, gc, gp, lam,
                              prob.cam_fixed, prob.point_fixed)
        finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dX))
        dc = jnp.where(finite, dc, 0.0)
        dX = jnp.where(finite, dX, 0.0)
        R_new, t_new, X_new = _apply_updates(R, t, X, dc, dX,
                                             prob.cam_fixed, prob.point_fixed)
        r_new, Xc_new, _, _ = _project_res(prob.K, R_new, t_new, X_new,
                                           prob.obs_cam, prob.obs_pt,
                                           prob.obs_px)
        w_new = jnp.where(Xc_new[:, 2] <= 1e-6, 0.0, w)
        cost_new = jnp.sum(w_new * jnp.sum(r_new * r_new, axis=-1))
        if axis_name is not None:
            cost_new = jax.lax.psum(cost_new, axis_name)
        ok = (cost_new < cost) & finite
        R = jnp.where(ok, R_new, R)
        t = jnp.where(ok, t_new, t)
        X = jnp.where(ok, X_new, X)
        lam = jnp.clip(jnp.where(ok, lam * 0.3, lam * 8.0), 1e-8, 1e8)
        return (R, t, X, lam, w), None

    def outer(carry, k):
        R, t, X, w = carry
        r, Xc, _, _ = _project_res(prob.K, R, t, X, prob.obs_cam,
                                   prob.obs_pt, prob.obs_px)
        en = jnp.linalg.norm(r, axis=-1)
        # Huber on all but the last pass (bounded but nonzero influence, so
        # a far-off init still produces gradients); Tukey on the last pass
        # for hard rejection at max_err.
        w_rob = jnp.where(k < max_iter - 1, huber_weight(en, max_err),
                          tukey_weight(en, max_err))
        w = base_w * w_rob * (Xc[:, 2] > 1e-6)
        lam0 = jnp.asarray(1e-4, prob.X.dtype)
        (R, t, X, _, _), _ = jax.lax.scan(inner, (R, t, X, lam0, w), None,
                                          length=inner_iter)
        return (R, t, X, w), None

    (R, t, X, w), _ = jax.lax.scan(
        outer, (prob.R, prob.t, prob.X, base_w), jnp.arange(max_iter))
    from coslam_tpu.geometry.se3 import orthonormalize_fast
    R = orthonormalize_fast(R)
    r, Xc, _, _ = _project_res(prob.K, R, t, X, prob.obs_cam, prob.obs_pt,
                               prob.obs_px)
    err = jnp.linalg.norm(r, axis=-1)
    outlier = prob.obs_valid & ((err > max_err) | (Xc[:, 2] <= 1e-6))
    w_fin = base_w * tukey_weight(err, max_err) * (Xc[:, 2] > 1e-6)
    cost = jnp.sum(w_fin * jnp.sum(r * r, axis=-1))
    if axis_name is not None:
        cost = jax.lax.psum(cost, axis_name)
    return BAResult(R=R, t=t, X=X, obs_outlier=outlier, obs_err=err,
                    cost=cost)
