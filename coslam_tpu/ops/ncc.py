"""NCC appearance blocks and dense score matrices.

Replaces ``NCCBlock`` (11x11 patch with precomputed sums for O(1) NCC,
SL_NCCBlock.h:15-61) and the pairwise NCC matrices built for guided
matching (SL_FeatureMatching.h getEpiNccMat, greedyGuidedNCCMatch).

TPU-first: blocks are stored pre-normalized (zero mean, unit norm), so a
whole A x B score matrix is one matmul on the MXU — the reference's
O(|A||B|) CPU double loop becomes the cheapest op in the pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from coslam_tpu.ops.patches import (extract_windows, extract_windows_onehot,
                                    frac_shift)

NCC_INVALID = -2.0


def _normalize_blocks(raw, pos, h, w, radius):
    """raw: [..., S*S]; pos: [..., 2]. Zero-mean unit-norm blocks + valid."""
    ok = ((pos[..., 0] >= radius) & (pos[..., 1] >= radius)
          & (pos[..., 0] <= w - 1.001 - radius)
          & (pos[..., 1] <= h - 1.001 - radius))
    mean = jnp.mean(raw, axis=-1, keepdims=True)
    cen = raw - mean
    norm = jnp.linalg.norm(cen, axis=-1, keepdims=True)
    blocks = cen / jnp.maximum(norm, 1e-6)
    ok = ok & (norm[..., 0] > 1e-3)   # reject textureless patches
    blocks = jnp.where(ok[..., None], blocks, 0.0)
    return blocks, ok


def extract_ncc_blocks_batched(imgs: jnp.ndarray, pos: jnp.ndarray,
                               radius: int = 5):
    """All cameras at once: imgs [C, H, W], pos [C, N, 2]. Returns
    (blocks [C, N, (2r+1)^2] normalized, valid [C, N]).

    Uses the Pallas window kernel on TPU (ops/patches.py) — one call for
    the whole camera batch instead of per-camera one-hot matmuls."""
    C, h, w = imgs.shape
    S = 2 * radius + 1
    base = jnp.floor(pos - radius).astype(jnp.int32)
    basec = jnp.clip(base, 0, jnp.array([w - S - 1, h - S - 1], jnp.int32))
    Wnd = extract_windows(imgs, basec, S + 1)            # [S+1, S+1, C, N]
    f = pos - radius - basec.astype(pos.dtype)
    fx = jnp.clip(f[..., 0], 0.0, 1.0)[None, None]
    fy = jnp.clip(f[..., 1], 0.0, 1.0)[None, None]
    raw = frac_shift(Wnd, fx, fy)                        # [S, S, C, N]
    raw = raw.reshape(S * S, C, -1).transpose(1, 2, 0)   # [C, N, S*S]
    return _normalize_blocks(raw, pos, h, w, radius)


def extract_ncc_blocks(img: jnp.ndarray, pos: jnp.ndarray, radius: int = 5):
    """img: [H, W]; pos: [N, 2]. Returns (blocks [N, (2r+1)^2] normalized,
    valid [N]). Invalid blocks are zeroed (contribute NCC 0).

    Uses the one-hot-matmul window extraction (gather-free, MXU) — the
    gather-based version dominated the mapping stage at ~13 ms/frame."""
    h, w = img.shape
    S = 2 * radius + 1
    base = jnp.floor(pos - radius).astype(jnp.int32)
    basec = jnp.clip(base, 0, jnp.array([w - S - 1, h - S - 1], jnp.int32))
    Wnd = extract_windows_onehot(img, basec, S + 1)      # [S+1, S+1, N]
    f = pos - radius - basec.astype(pos.dtype)
    fx = jnp.clip(f[:, 0], 0.0, 1.0)[None, None, :]
    fy = jnp.clip(f[:, 1], 0.0, 1.0)[None, None, :]
    raw = frac_shift(Wnd, fx, fy)                        # [S, S, N]
    raw = raw.reshape(S * S, -1).T                       # [N, S*S]
    ok = ((pos[:, 0] >= radius) & (pos[:, 1] >= radius)
          & (pos[:, 0] <= w - 1.001 - radius)
          & (pos[:, 1] <= h - 1.001 - radius))
    mean = jnp.mean(raw, axis=-1, keepdims=True)
    cen = raw - mean
    norm = jnp.linalg.norm(cen, axis=-1, keepdims=True)
    blocks = cen / jnp.maximum(norm, 1e-6)
    ok = ok & (norm[..., 0] > 1e-3)   # reject textureless patches
    blocks = jnp.where(ok[..., None], blocks, 0.0)
    return blocks, ok


def ncc_search(img: jnp.ndarray, centers: jnp.ndarray,
               templates: jnp.ndarray, search_radius: int = 6,
               patch_radius: int = 5):
    """Dense NCC template search around projected positions.

    img: [H, W]; centers: [N, 2] (x, y) search centers; templates:
    [N, (2r+1)^2] pre-normalized stored blocks. Scans every integer offset
    within ``search_radius`` and returns (best_px [N, 2], best_score [N]).

    This is the re-acquisition primitive for dormant points (loop
    closure): matching against *detected* corners fails when redetection
    lands a few px off the original corner, while the true patch is still
    in the image — a direct correlation around the projection finds it.
    Runs as three depthwise convolutions (XLA) over per-point windows.
    """
    h, w = img.shape
    N = centers.shape[0]
    S = 2 * patch_radius + 1
    sr = search_radius
    G = S + 2 * sr
    base = jnp.round(centers).astype(jnp.int32) - (patch_radius + sr)
    basec = jnp.clip(base, 0, jnp.array([w - G - 1, h - G - 1], jnp.int32))
    Wnd = extract_windows(img[None], basec[None], G)[:, :, 0]   # [G, G, N]
    Wn = Wnd.transpose(2, 0, 1)                                 # [N, G, G]
    # dot[n, dy, dx] = sum_patch templates[n] * window patch at (dy, dx)
    dot = jax.lax.conv_general_dilated(
        Wn[None], templates.reshape(N, 1, S, S),
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=N)[0]                               # [N, K, K]
    sum_p = jax.lax.reduce_window(Wn, 0.0, jax.lax.add,
                                  (1, S, S), (1, 1, 1), "VALID")
    sum_p2 = jax.lax.reduce_window(Wn * Wn, 0.0, jax.lax.add,
                                   (1, S, S), (1, 1, 1), "VALID")
    var = jnp.maximum(sum_p2 - sum_p * sum_p / (S * S), 1e-6)
    ncc = dot / jnp.sqrt(var)                                   # [N, K, K]
    K2 = 2 * sr + 1
    flat = ncc.reshape(N, K2 * K2)
    best = jnp.argmax(flat, axis=1)
    best_score = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
    dy = best // K2
    dx = best % K2
    best_px = (basec.astype(jnp.float32)
               + jnp.stack([dx, dy], -1).astype(jnp.float32)
               + patch_radius)
    # reject centers whose full search window was clamped out of bounds
    ok = jnp.all(base == basec, axis=1)
    return best_px, jnp.where(ok, best_score, NCC_INVALID)


def ncc_score_matrix(blocks_a: jnp.ndarray, blocks_b: jnp.ndarray,
                     valid_a: jnp.ndarray, valid_b: jnp.ndarray) -> jnp.ndarray:
    """[A, P] x [B, P] -> [A, B] NCC scores; invalid rows/cols = NCC_INVALID."""
    s = jnp.dot(blocks_a, blocks_b.T, preferred_element_type=jnp.float32)
    bad = ~(valid_a[:, None] & valid_b[None, :])
    return jnp.where(bad, NCC_INVALID, s)


def ncc_pairwise(blocks_a: jnp.ndarray, blocks_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise NCC between aligned block sets [N, P] -> [N]
    (matchNCCBlock equivalent for tracking a known point)."""
    return jnp.sum(blocks_a * blocks_b, axis=-1)
