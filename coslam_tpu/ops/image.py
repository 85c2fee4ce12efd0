"""Shared image filtering helpers (separable convs, box filters, pooling).

All functions operate on batched images [C, H, W] (C = cameras) in f32 and
lower to XLA convolutions / reduce_window, which tile well on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv1d(img: jnp.ndarray, kernel: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Depthwise 1-D convolution along H (axis=1) or W (axis=2) with SAME
    edge-replicate padding. img: [C, H, W].

    Implemented as shift-and-accumulate slicing (pure VPU elementwise);
    XLA's conv op pads the single channel to full vector registers and
    wastes ~99% of the MXU on these 1-channel filters (measured 42 ms for
    a VGA 3-camera pyramid vs <1 ms for this form)."""
    k = kernel.shape[0]
    pad = k // 2
    if axis == 1:
        pw = ((0, 0), (pad, pad), (0, 0))
    else:
        pw = ((0, 0), (0, 0), (pad, pad))
    x = jnp.pad(img, pw, mode="edge")
    h, w = img.shape[1], img.shape[2]
    out = None
    for i in range(k):
        if axis == 1:
            sl = x[:, i:i + h, :]
        else:
            sl = x[:, :, i:i + w]
        term = sl * kernel[i]
        out = term if out is None else out + term
    return out


def separable_filter(img: jnp.ndarray, kh: jnp.ndarray, kw: jnp.ndarray) -> jnp.ndarray:
    return _conv1d(_conv1d(img, kh, axis=1), kw, axis=2)


def gaussian_blur(img: jnp.ndarray) -> jnp.ndarray:
    """5-tap binomial blur (the classic pyramid smoother)."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=img.dtype) / 16.0
    return separable_filter(img, k, k)


def sobel_derivatives(img: jnp.ndarray):
    """Central-difference x/y derivatives with binomial cross-smoothing
    (matches the derivative-of-Gaussian flavor of the reference's
    pyramid_with_derivative shaders)."""
    d = jnp.array([-0.5, 0.0, 0.5], dtype=img.dtype)
    s = jnp.array([0.25, 0.5, 0.25], dtype=img.dtype)
    dx = _conv1d(_conv1d(img, d, axis=2), s, axis=1)
    dy = _conv1d(_conv1d(img, d, axis=1), s, axis=2)
    return dx, dy


def downsample2(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 average downsample (scaleDownAvg equivalent, SL_ImageOp.h).

    Strided reduce_window, not reshape-to-5d + reduce: the reshape forces
    a full relayout of the image (measured 0.68 ms/frame at 480x640x3;
    the strided window is ~10x cheaper)."""
    c, h, w = img.shape
    h2, w2 = h // 2, w // 2
    s = jax.lax.reduce_window(
        img[:, : h2 * 2, : w2 * 2], 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2), window_strides=(1, 2, 2),
        padding="VALID")
    return s * 0.25


def box_filter(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Sum over a (2r+1)^2 window (structure-tensor accumulation)."""
    k = jnp.ones((2 * radius + 1,), dtype=img.dtype)
    return separable_filter(img, k, k)


def max_pool_same(img: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Max over a (2r+1)^2 window, SAME size (for NMS / dilation).
    Separable: two 1-D passes instead of one 2-D reduce_window."""
    k = 2 * radius + 1
    x = jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, window_dimensions=(1, k, 1),
        window_strides=(1, 1, 1), padding="SAME")
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, window_dimensions=(1, 1, k),
        window_strides=(1, 1, 1), padding="SAME")
