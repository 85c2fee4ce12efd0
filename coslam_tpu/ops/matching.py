"""Guided feature matching: epipolar + NCC score matrices and device-side
greedy assignment.

Replaces the reference's pairwise matching stack: ``getEpiNccMat``
(SL_FeatureMatching.h:6-15), ``greedyGuidedNCCMatch/greedyNCCMatch`` and
disparity priors (SL_GuidedNCCMatcher.h, used by inter-camera mapping
SL_NewMapPointsInterCam.cpp:273-318 and map-init SL_InitMap.cpp:291-316).

TPU-first: the score matrix is a single [A, B] matmul of pre-normalized
NCC blocks masked by epipolar distance; the reference's sequential greedy
peeling becomes a fixed number of mutual-best rounds entirely on device
(SURVEY.md §7 hard part #3) — each round zeroes matched rows/columns, so
k rounds extract the top-k non-conflicting matches in parallel.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.ops.ncc import ncc_score_matrix, NCC_INVALID
from coslam_tpu.geometry.epipolar import epipolar_dists


def epipolar_distance_matrix(F: jnp.ndarray, pts_a: jnp.ndarray,
                             pts_b: jnp.ndarray) -> jnp.ndarray:
    """Symmetric epipolar distance for every (a, b) pair: [A, B] px.

    F maps image-a points to epilines in image b (x_b^T F x_a = 0).
    """
    A = pts_a.shape[0]
    B = pts_b.shape[0]
    ah = jnp.concatenate([pts_a, jnp.ones_like(pts_a[:, :1])], axis=-1)
    bh = jnp.concatenate([pts_b, jnp.ones_like(pts_b[:, :1])], axis=-1)
    lb = ah @ F.T                      # [A, 3] lines in image b
    la = bh @ F                        # [B, 3] lines in image a
    num_b = jnp.abs(lb @ bh.T)         # [A, B]
    den_b = jnp.maximum(jnp.linalg.norm(lb[:, :2], axis=-1, keepdims=True),
                        1e-9)
    num_a = jnp.abs(la @ ah.T).T       # [A, B]
    den_a = jnp.maximum(jnp.linalg.norm(la[:, :2], axis=-1, keepdims=True),
                        1e-9).T
    return 0.5 * (num_b / den_b + num_a / den_a)


class MatchResult(NamedTuple):
    a_to_b: jnp.ndarray   # [A] index into b, -1 = unmatched
    score: jnp.ndarray    # [A] NCC score of the match


@partial(jax.jit, static_argnames=("rounds",))
def greedy_mutual_match(score: jnp.ndarray, min_score: float = 0.6,
                        rounds: int = 8) -> MatchResult:
    """Greedy conflict-free assignment from a score matrix (higher =
    better; invalid entries <= NCC_INVALID). ``rounds`` parallel
    mutual-best sweeps approximate the reference's sequential greedy."""
    A, B = score.shape
    s = score
    a_to_b = jnp.full((A,), -1, jnp.int32)
    best_s = jnp.full((A,), NCC_INVALID, score.dtype)

    def body(_, carry):
        s, a_to_b, best_s = carry
        bb = jnp.argmax(s, axis=1)                       # [A] best b per a
        sv = jnp.take_along_axis(s, bb[:, None], axis=1)[:, 0]
        ba = jnp.argmax(s, axis=0)                       # [B] best a per b
        mutual = (ba[bb] == jnp.arange(A)) & (sv > min_score)
        a_to_b = jnp.where(mutual & (a_to_b < 0), bb, a_to_b)
        best_s = jnp.where(mutual & (best_s <= NCC_INVALID), sv, best_s)
        # zero out matched rows/cols (max-scatter: unmatched rows target
        # index B and get dropped — a .set() here could race a True at
        # index 0 with the False written by unmatched rows)
        row_dead = a_to_b >= 0
        col_dead = jnp.zeros((B,), bool).at[jnp.where(row_dead, a_to_b, B)
                                            ].max(row_dead, mode="drop")
        s = jnp.where(row_dead[:, None] | col_dead[None, :],
                      NCC_INVALID, s)
        return s, a_to_b, best_s

    s, a_to_b, best_s = jax.lax.fori_loop(0, rounds, body, (s, a_to_b, best_s))
    return MatchResult(a_to_b=a_to_b, score=best_s)


def guided_match(blocks_a, blocks_b, valid_a, valid_b, pts_a, pts_b,
                 F: jnp.ndarray | None = None, max_epi: float = 6.0,
                 min_ncc: float = 0.6, max_disparity: float | None = None,
                 rounds: int = 8) -> MatchResult:
    """Epipolar+NCC guided matching (getEpiNccMat + greedyGuidedNCCMatch).

    blocks_*: [N, P] pre-normalized NCC blocks; pts_*: [N, 2] pixels.
    With F given, pairs beyond ``max_epi`` px epipolar distance are
    excluded; ``max_disparity`` optionally bounds |pa - pb| (the
    disparity prior used when poses are unreliable).
    """
    s = ncc_score_matrix(blocks_a, blocks_b, valid_a, valid_b)
    if F is not None:
        d = epipolar_distance_matrix(F, pts_a, pts_b)
        s = jnp.where(d <= max_epi, s, NCC_INVALID)
    if max_disparity is not None:
        disp = jnp.linalg.norm(pts_a[:, None, :] - pts_b[None, :, :], axis=-1)
        s = jnp.where(disp <= max_disparity, s, NCC_INVALID)
    return greedy_mutual_match(s, min_score=min_ncc, rounds=rounds)
