"""Linear pose-graph solver: rotations then translations (optional unknown
per-edge scale), with fixed anchor nodes.

Replaces ``GlobalPoseGraph`` (reference: SL_GlobalPoseEstimation.h:13-115,
.cpp:52-359 — rotations solved as a sparse linear system over the 9 matrix
entries then re-orthonormalized via approxRotationMat; translations solved
linearly with optional per-edge unknown scale for E-matrix merge edges
(``uncertainScale``, :283-335) and the unified-scale-id variant
``computeNewCameraTranslations4`` :361+). Used for (a) propagating BA
key-pose corrections to non-key frames and (b) group-merge re-alignment.

TPU-first delta: the problems are small (<= a few hundred nodes), so
instead of sparse LSQR we assemble the normal equations densely with
segment-sums and run one batched Cholesky/LU solve — and the three
rotation columns share one factorization (the 9Nx9N system is
block-diagonal over columns).

Conventions: node poses are world->camera (R_i, t_i); an edge (i -> j)
carries the relative transform (R_ji, t_ji) with R_j = R_ji R_i and
t_j = R_ji t_i + s_e * t_ji.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.geometry.se3 import project_to_so3


class PoseGraph(NamedTuple):
    """Padded pose graph. N nodes, E edges, G scale groups.

    scale_group: [E] int32, -1 => rigid edge (scale 1), g >= 0 => unknown
    scale shared by all edges with the same g (merge edges).
    """

    edge_i: jnp.ndarray       # [E] int32
    edge_j: jnp.ndarray       # [E] int32
    edge_R: jnp.ndarray       # [E, 3, 3] R_ji
    edge_t: jnp.ndarray       # [E, 3] t_ji
    edge_valid: jnp.ndarray   # [E] bool
    edge_weight: jnp.ndarray  # [E]
    scale_group: jnp.ndarray  # [E] int32
    fixed: jnp.ndarray        # [N] bool
    fixed_R: jnp.ndarray      # [N, 3, 3]
    fixed_t: jnp.ndarray      # [N, 3]
    node_valid: jnp.ndarray   # [N] bool


_FIX_W = 1e4


def _assemble_rot(pg: PoseGraph, N: int):
    """H [N,3,N,3] and rhs [N,3,3] (3 rhs columns) for the rotation system."""
    dt = pg.edge_R.dtype
    w = (pg.edge_valid.astype(dt) * pg.edge_weight)[:, None, None]
    I3 = jnp.eye(3, dtype=dt)
    H = jnp.zeros((N, 3, N, 3), dtype=dt)
    # edge contributions: r = x_j - Rji x_i
    Hii = w * I3[None]
    Hjj = w * I3[None]
    Hij = -w * jnp.swapaxes(pg.edge_R, -1, -2)
    H = H.at[pg.edge_i, :, pg.edge_i, :].add(Hii, mode="drop")
    H = H.at[pg.edge_j, :, pg.edge_j, :].add(Hjj, mode="drop")
    H = H.at[pg.edge_i, :, pg.edge_j, :].add(Hij, mode="drop")
    H = H.at[pg.edge_j, :, pg.edge_i, :].add(
        jnp.swapaxes(Hij, -1, -2), mode="drop")
    # fixed-node priors + regularize invalid nodes
    diag_w = (pg.fixed.astype(dt) * _FIX_W
              + (~pg.node_valid).astype(dt) + 1e-6)
    H = H.at[jnp.arange(N), :, jnp.arange(N), :].add(
        diag_w[:, None, None] * I3[None])
    # rhs: columns of fixed rotations (prior pulls x_f -> fixed_R[:, :, b])
    rhs = (pg.fixed.astype(dt) * _FIX_W)[:, None, None] * pg.fixed_R
    return H.reshape(N * 3, N * 3), rhs.reshape(N * 3, 3)


@partial(jax.jit, static_argnames=())
def solve_rotations(pg: PoseGraph) -> jnp.ndarray:
    """Returns [N, 3, 3] rotations (fixed nodes ~= their fixed values)."""
    N = pg.fixed.shape[0]
    H, rhs = _assemble_rot(pg, N)
    sol = jnp.linalg.solve(H, rhs)          # [3N, 3] — 3 columns share the LU
    R = sol.reshape(N, 3, 3)
    return project_to_so3(R)


@partial(jax.jit, static_argnames=("num_scales",))
def solve_translations(pg: PoseGraph, R: jnp.ndarray,
                       num_scales: int = 1):
    """Solve translations given solved rotations.

    Returns (t [N, 3], scales [num_scales]). Edge residual:
    t_j - R_ji t_i - s_e t_ji with s_e unknown for scale_group >= 0
    (the merge-edge uncertain-scale mechanism).
    """
    N = pg.fixed.shape[0]
    G = num_scales
    dt = pg.edge_t.dtype
    dim = 3 * N + G
    w = pg.edge_valid.astype(dt) * pg.edge_weight
    has_scale = pg.scale_group >= 0
    g_idx = jnp.clip(pg.scale_group, 0, G - 1)
    # per-edge Jacobian blocks: J_ti = -R_ji, J_tj = I, J_s = -t_ji (if scaled)
    # residual constant term: -t_ji for rigid edges (s = 1 folded into rhs)
    I3 = jnp.eye(3, dtype=dt)
    Jti = -pg.edge_R                                     # [E,3,3]
    Js = jnp.where(has_scale[:, None], -pg.edge_t, 0.0)  # [E,3]
    c = jnp.where(has_scale[:, None], 0.0, -pg.edge_t)   # [E,3] constant
    H = jnp.zeros((dim, dim), dtype=dt)
    b = jnp.zeros((dim,), dtype=dt)
    wij = w[:, None, None]
    # H_titi += Jti^T Jti = I (rotation); H_tjtj += I; H_titj += Jti^T
    Ht = jnp.zeros((N, 3, N, 3), dtype=dt)
    Ht = Ht.at[pg.edge_i, :, pg.edge_i, :].add(wij * I3[None], mode="drop")
    Ht = Ht.at[pg.edge_j, :, pg.edge_j, :].add(wij * I3[None], mode="drop")
    Ht = Ht.at[pg.edge_i, :, pg.edge_j, :].add(
        wij * jnp.swapaxes(Jti, -1, -2), mode="drop")
    Ht = Ht.at[pg.edge_j, :, pg.edge_i, :].add(wij * Jti, mode="drop")
    diag_w = (pg.fixed.astype(dt) * _FIX_W + (~pg.node_valid).astype(dt) + 1e-6)
    Ht = Ht.at[jnp.arange(N), :, jnp.arange(N), :].add(
        diag_w[:, None, None] * I3[None])
    H = H.at[: 3 * N, : 3 * N].set(Ht.reshape(3 * N, 3 * N))
    # scale-scale and scale-translation coupling; the weak prior pulls
    # unobservable scales toward 1 (a 0-centered ridge would collapse a
    # scale group whose segment lacks a second anchor)
    s_prior = jnp.asarray(1e-4, dt)
    Hss = jax.ops.segment_sum(w * jnp.sum(Js * Js, -1), g_idx, num_segments=G)
    H = H.at[3 * N:, 3 * N:].add(jnp.diag(Hss + s_prior))
    Hts_i = w[:, None] * jnp.einsum("eji,ej->ei", Jti, Js)   # Jti^T Js [E,3]
    Hts_j = w[:, None] * Js                                  # I^T Js
    Hts = jnp.zeros((N, 3, G), dtype=dt)
    Hts = Hts.at[pg.edge_i, :, g_idx].add(Hts_i, mode="drop")
    Hts = Hts.at[pg.edge_j, :, g_idx].add(Hts_j, mode="drop")
    H = H.at[: 3 * N, 3 * N:].add(Hts.reshape(3 * N, G))
    H = H.at[3 * N:, : 3 * N].add(Hts.reshape(3 * N, G).T)
    # rhs from constant term: J^T (-c)
    bt = jnp.zeros((N, 3), dtype=dt)
    bt = bt.at[pg.edge_i].add(-w[:, None] * jnp.einsum("eji,ej->ei", Jti, c),
                              mode="drop")
    bt = bt.at[pg.edge_j].add(-w[:, None] * c, mode="drop")
    bt = bt + (pg.fixed.astype(dt) * _FIX_W)[:, None] * pg.fixed_t
    b = b.at[: 3 * N].set(bt.reshape(-1))
    bs = jax.ops.segment_sum(-w * jnp.sum(Js * c, -1), g_idx, num_segments=G)
    b = b.at[3 * N:].add(bs + s_prior)
    sol = jnp.linalg.solve(H, b)
    return sol[: 3 * N].reshape(N, 3), sol[3 * N:]


def chain_graph(R_rel: jnp.ndarray, t_rel: jnp.ndarray,
                fixed: jnp.ndarray, fixed_R: jnp.ndarray,
                fixed_t: jnp.ndarray, node_valid: jnp.ndarray) -> PoseGraph:
    """Build the per-camera chain graph used for non-key-frame propagation
    (constructCameraGraphs/updateNonKeyCameraPoses,
    SL_CoSLAMRobustBA.cpp:182-247): N nodes, N-1 consecutive edges with the
    pre-BA relative transforms, key nodes fixed to their BA-corrected poses.

    R_rel[k] / t_rel[k]: transform from node k to node k+1.
    """
    N = fixed.shape[0]
    E = N - 1
    ar = jnp.arange(E)
    return PoseGraph(
        edge_i=ar, edge_j=ar + 1, edge_R=R_rel, edge_t=t_rel,
        edge_valid=node_valid[:-1] & node_valid[1:],
        edge_weight=jnp.ones((E,), dtype=t_rel.dtype),
        scale_group=jnp.full((E,), -1, dtype=jnp.int32),
        fixed=fixed, fixed_R=fixed_R, fixed_t=fixed_t,
        node_valid=node_valid)


def solve_chain_segments(R_rel, t_rel, fixed, fixed_R, fixed_t,
                         chain_scales: bool = False):
    """Per-segment chain correction for LONG trajectories.

    The export-time chain graph is a pure chain with hard anchors
    (keyframes); consecutive anchors decouple it into independent
    segments, so the one dense 3Fx3F solve (cubic in run length) is
    replaced by per-segment solves padded to power-of-two buckets (a
    handful of compiled sizes, O(F * s^2) total). The trailing stretch
    after the last anchor has one pinned end only — pure rigid
    propagation, no solve. Matches the dense solution up to the soft
    anchor weight (anchors here are pinned exactly).

    Inputs are numpy ([F-1,3,3], [F-1,3] relative edges k->k+1; [F]
    anchor mask; [F,3,3]/[F,3] poses with anchor values at anchor rows).
    With ``chain_scales`` every segment carries one unknown translation
    scale (the uncertainScale mechanism over the export chain,
    SL_GlobalPoseEstimation.cpp:283-335). Returns (R [F,3,3], t [F,3]).
    """
    import numpy as np
    F = fixed.shape[0]
    R_out = np.array(fixed_R, np.float32, copy=True)
    t_out = np.array(fixed_t, np.float32, copy=True)
    anchors = np.nonzero(fixed)[0]
    if len(anchors) == 0 or F < 2:
        return R_out, t_out
    for k in range(len(anchors) - 1):
        i0, i1 = int(anchors[k]), int(anchors[k + 1])
        n = i1 - i0 + 1
        if n <= 2:
            continue                      # no interior nodes to correct
        m = max(8, 1 << (n - 1).bit_length())
        fx = np.zeros(m, bool)
        fx[0] = fx[n - 1] = True
        fR = np.tile(np.eye(3, dtype=np.float32), (m, 1, 1))
        fT = np.zeros((m, 3), np.float32)
        fR[0], fT[0] = fixed_R[i0], fixed_t[i0]
        fR[n - 1], fT[n - 1] = fixed_R[i1], fixed_t[i1]
        Rr = np.tile(np.eye(3, dtype=np.float32), (m - 1, 1, 1))
        tr = np.zeros((m - 1, 3), np.float32)
        Rr[: n - 1] = R_rel[i0:i1]
        tr[: n - 1] = t_rel[i0:i1]
        nv = np.arange(m) < n
        pg = chain_graph(jnp.asarray(Rr), jnp.asarray(tr),
                         jnp.asarray(fx), jnp.asarray(fR), jnp.asarray(fT),
                         jnp.asarray(nv))
        if chain_scales:
            sg = np.where(np.arange(m - 1) < n - 1, 0, -1).astype(np.int32)
            pg = pg._replace(scale_group=jnp.asarray(sg))
        R_sol = solve_rotations(pg)
        t_sol, _ = solve_translations(pg, R_sol, num_scales=1)
        R_out[i0:i1 + 1] = np.asarray(R_sol)[:n]
        t_out[i0:i1 + 1] = np.asarray(t_sol)[:n]
        R_out[i0], t_out[i0] = fixed_R[i0], fixed_t[i0]
        R_out[i1], t_out[i1] = fixed_R[i1], fixed_t[i1]
    # trailing stretch: rigid composition from the last anchor
    a = int(anchors[-1])
    R_out[a], t_out[a] = fixed_R[a], fixed_t[a]
    for f in range(a + 1, F):
        R_out[f] = R_rel[f - 1] @ R_out[f - 1]
        t_out[f] = t_rel[f - 1] + R_rel[f - 1] @ t_out[f - 1]
    return R_out, t_out
