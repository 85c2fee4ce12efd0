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
