"""Structure-tensor corner detection: cornerness, NMS, masked top-k.

TPU-native re-design of ``KLT_Detector`` (v3d_gpuklt.cpp:423-588 + shaders
klt_detector_pass1/pass2/nonmax/discriminator/build_histpyr/traverse_histpyr):
the reference computes cornerness in two separable shader passes, suppresses
non-maxima along 1-D stripes, masks pixels near live tracks by point
rendering, and compacts surviving corners with a histogram-pyramid traversal.

Here: cornerness = Shi-Tomasi min eigenvalue of the box-filtered structure
tensor (XLA convs); NMS = equality with a (2r+1)^2 max-pool; live-track
suppression = scatter of track positions into an occupancy image dilated by
the same pool; compaction = ``jax.lax.top_k`` over the flattened masked
map — the idiomatic replacement for the histogram pyramid (SURVEY.md §7
stage 1). Everything is batched over cameras.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import KLTConfig
from coslam_tpu.ops.image import box_filter, max_pool_same


def cornerness_map(dx: jnp.ndarray, dy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Min-eigenvalue cornerness. dx, dy: [C, H, W] image derivatives."""
    gxx = box_filter(dx * dx, radius)
    gyy = box_filter(dy * dy, radius)
    gxy = box_filter(dx * dy, radius)
    half_tr = 0.5 * (gxx + gyy)
    half_df = 0.5 * (gxx - gyy)
    return half_tr - jnp.sqrt(half_df * half_df + gxy * gxy + 1e-12)


class CornerResult(NamedTuple):
    pos: jnp.ndarray     # [C, K, 2] (x, y)
    score: jnp.ndarray   # [C, K]
    valid: jnp.ndarray   # [C, K]


def _occupancy(shape_hw, pos: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Rasterize feature positions into a [H, W] 0/1 image (one camera)."""
    h, w = shape_hw
    xi = jnp.clip(jnp.round(pos[:, 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pos[:, 1]).astype(jnp.int32), 0, h - 1)
    flat = jnp.zeros((h * w,), dtype=jnp.float32)
    idx = yi * w + xi
    vals = valid.astype(jnp.float32)
    flat = flat.at[idx].max(vals, mode="drop")
    return flat.reshape(h, w)


@partial(jax.jit, static_argnames=("cfg", "k"))
def detect_corners(img: jnp.ndarray, dx: jnp.ndarray, dy: jnp.ndarray,
                   cfg: KLTConfig, k: int,
                   exclude_pos: jnp.ndarray | None = None,
                   exclude_valid: jnp.ndarray | None = None) -> CornerResult:
    """Detect up to k corners per camera.

    img/dx/dy: [C, H, W] (level-0 pyramid entries). exclude_pos/[C, M, 2]
    suppresses detections within ``cfg.min_distance`` of live tracks
    (the redetect protocol of KLT_SequenceTracker, v3d_gpuklt.cpp:761-855).
    """
    c, h, w = img.shape
    corner = cornerness_map(dx, dy, cfg.window_radius)
    # border suppression
    bx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    by = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    b = cfg.border
    border_ok = (bx >= b) & (bx < w - b) & (by >= b) & (by < h - b)
    corner = jnp.where(border_ok[None], corner, 0.0)
    # non-max suppression over the min-distance window
    pooled = max_pool_same(corner, cfg.min_distance)
    is_max = (corner >= pooled) & (corner > cfg.min_cornerness)
    # suppress near live tracks
    if exclude_pos is not None:
        occ = jax.vmap(lambda p, v: _occupancy((h, w), p, v))(
            exclude_pos, exclude_valid)
        occ = max_pool_same(occ, cfg.min_distance) > 0.5
        is_max = is_max & ~occ
    masked = jnp.where(is_max, corner, 0.0)
    # Pre-reduce before the top-k sort: NMS keeps survivors > min_distance
    # apart (Chebyshev), so a BxB block with B <= min_distance + 1 holds at
    # most one survivor (up to exact-tie duplicates) — reduce each block to
    # (max score, flat index of the max) and sort only the ~H*W/B^2 block
    # maxima instead of all H*W pixels (the sort dominated detect cost).
    B = cfg.min_distance + 1
    nb = -(-h // B) * -(-w // B)
    if nb >= k:
        # hi-only padding: "SAME" pads symmetrically, which shifts block
        # origins when the image size is not a multiple of B and
        # misaligns blockmax with the repeat-upsample below
        pads = ((0, 0), (0, -h % B), (0, -w % B))
        blockmax = jax.lax.reduce_window(
            masked, 0.0, jax.lax.max, window_dimensions=(1, B, B),
            window_strides=(1, B, B), padding=pads)
        up = jnp.repeat(jnp.repeat(blockmax, B, axis=1), B, axis=2)
        up = up[:, :h, :w]
        flat_idx = (by * w + bx).astype(jnp.float32)   # < 2^24, f32-exact
        cand = jnp.where((masked == up) & (masked > 0.0), flat_idx, -1.0)
        blockidx = jax.lax.reduce_window(
            cand, -1.0, jax.lax.max, window_dimensions=(1, B, B),
            window_strides=(1, B, B), padding=pads)
        score, bsel = jax.lax.top_k(blockmax.reshape(c, -1), k)
        idx = jnp.take_along_axis(blockidx.reshape(c, -1), bsel,
                                  axis=-1).astype(jnp.int32)
        idx = jnp.maximum(idx, 0)
    else:
        score, idx = jax.lax.top_k(masked.reshape(c, h * w), k)
    pos = jnp.stack([(idx % w).astype(img.dtype), (idx // w).astype(img.dtype)],
                    axis=-1)
    return CornerResult(pos=pos, score=score, valid=score > 0.0)
