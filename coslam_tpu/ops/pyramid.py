"""Gaussian image pyramid with per-level x/y derivatives.

TPU-native equivalent of ``PyramidWithDerivativesCreator``
(reference: v3d_gpupyramid.h:38-75 + pyramid_with_derivative_pass*.cg):
the reference builds, per level, a smoothed grayscale image plus its x/y
derivatives packed as an RGB mipmap texture. Here each level is three
[C, H_l, W_l] arrays produced by separable XLA convolutions over the
batched camera axis — the whole pyramid build is a handful of fused
conv ops per level.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.ops.image import gaussian_blur, sobel_derivatives, downsample2


class Pyramid(NamedTuple):
    """imgs: tuple (len = n_levels) of [C, H/2^l, W/2^l] blurred levels.
    dxs/dys: length-1 tuples — derivatives at LEVEL 0 ONLY. The corner
    detector is their only consumer; the KLT tracker differentiates its
    own template windows (ops/klt.py:102-105), so the reference's
    all-level derivative mipmaps (pyramid_with_derivative_pass*.cg) would
    be pure wasted HBM writes here."""

    imgs: tuple
    dxs: tuple
    dys: tuple

    @property
    def n_levels(self) -> int:
        return len(self.imgs)


def build_pyramid(img: jnp.ndarray, n_levels: int,
                  impl: str | None = None) -> Pyramid:
    """img: [C, H, W] f32 grayscale (0..255 scale). Returns n_levels levels;
    level 0 is the blurred full-res image.

    impl: "pallas" | "xla" | None (auto: the fused single-pass Pallas level
    kernel on TPU backends, XLA shift-add elsewhere). The two paths agree
    exactly in the interior; the outermost 1-px frame of dx/dy differs in
    boundary convention (derivative of the edge-replicated image vs
    edge-replicated derivative) — immaterial, since corners are
    border-suppressed and KLT windows need full in-bounds support."""
    if impl is None:
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        from coslam_tpu.ops.pyramid_pallas import pyramid_level_pallas

        def level(cur, derivs):
            return pyramid_level_pallas(cur, derivs=derivs)
    else:
        def level(cur, derivs):
            sm = gaussian_blur(cur)
            if not derivs:
                return sm
            dx, dy = sobel_derivatives(sm)
            return sm, dx, dy
    imgs = []
    cur = img
    for lvl in range(n_levels):
        if lvl == 0:
            sm, dx0, dy0 = level(cur, True)
        else:
            sm = level(cur, False)
        imgs.append(sm)
        if lvl + 1 < n_levels:
            cur = downsample2(sm)
    return Pyramid(imgs=tuple(imgs), dxs=(dx0,), dys=(dy0,))
