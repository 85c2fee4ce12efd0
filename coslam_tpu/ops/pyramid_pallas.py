"""Fused Pallas pyramid level: blur + x/y derivatives in one VMEM pass.

The XLA shift-add formulation of the pyramid (ops/image.py) is correct but
materializes ~8 full-image intermediates per level across several fusions
(~1.8 ms/frame at 3x480x640x4 levels — 27% of the fused step). This kernel
computes the 5-tap binomial blur and both derivative-of-Gaussian filters
for a whole level in ONE pass over VMEM: the image is read once, the three
outputs are written once, everything in between lives in vector registers
/ VMEM bands.

Layout (same Mosaic constraints as ops/patches.py's window kernel):
  - the image is placed at row offset 8 / lane offset 128 inside an
    edge-replicate padded canvas, so every filter tap reads real or
    edge-correct pixels and the output crop is tile-aligned;
  - vertical taps = static sublane slices of a band loaded with 8-row
    halos (all slice starts stay in range by construction);
  - horizontal taps = static lane rolls (wrap only touches pad columns).
Grid = cameras; each program streams the level in 64-row bands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _level_kernel(img_ref, sm_ref, dx_ref=None, dy_ref=None, *, H, W, Wp,
                  TB, n_bands, derivs=True):
    from jax.experimental.pallas import tpu as pltpu

    def hroll(a, k):  # roll by k (possibly negative): out[.., i] = a[.., i-k]
        return pltpu.roll(a, k % Wp, 1)

    def hblur(a):
        return (hroll(a, 2) + 4.0 * hroll(a, 1) + 6.0 * a
                + 4.0 * hroll(a, -1) + hroll(a, -2)) * (1 / 16)

    def hsmooth(a):   # [1 2 1]/4 horizontal
        return (hroll(a, 1) + 2.0 * a + hroll(a, -1)) * 0.25

    def hderiv(a):    # [-1 0 1]/2 horizontal
        return (hroll(a, -1) - hroll(a, 1)) * 0.5

    def crop(a):      # image columns (lane offset 128 = one full tile)
        return jax.lax.slice_in_dim(a, 128, 128 + W, axis=1)

    for b in range(n_bands):
        r0 = 8 + b * TB                   # bands cover canvas rows [8, ...)
        TBo = min(TB, H - b * TB)         # output rows in this band
        xL = img_ref[0, r0 - 8:r0 + TB + 8, :]    # [TB+16, Wp]
        o = 8                             # local index of output row 0

        def vrows(off, length):
            """xL rows [o+off, o+off+length) — in range by construction."""
            return jax.lax.slice_in_dim(xL, o + off, o + off + length,
                                        axis=0)

        # smoothed rows [r0-2, r0+TB+2): vertical 5-tap then horizontal
        L = TB + 4
        v = (vrows(-4, L) + 4.0 * vrows(-3, L) + 6.0 * vrows(-2, L)
             + 4.0 * vrows(-1, L) + vrows(0, L)) * (1 / 16)
        smb = hblur(v)                    # [TB+4, Wp], rows r0-2..r0+TB+2
        out_rows = slice(b * TB, b * TB + TBo)
        sm_ref[0, out_rows, :] = crop(
            jax.lax.slice_in_dim(smb, 2, 2 + TBo, axis=0))
        if not derivs:
            continue
        # dx: horizontal derivative, vertical [1 2 1]/4 smoothing
        dxh = hderiv(smb)
        dx = (jax.lax.slice_in_dim(dxh, 2, 2 + TBo, axis=0) * 2.0
              + jax.lax.slice_in_dim(dxh, 1, 1 + TBo, axis=0)
              + jax.lax.slice_in_dim(dxh, 3, 3 + TBo, axis=0)) * 0.25
        dx_ref[0, out_rows, :] = crop(dx)
        # dy: vertical central difference, horizontal smoothing
        dyv = (jax.lax.slice_in_dim(smb, 3, 3 + TBo, axis=0)
               - jax.lax.slice_in_dim(smb, 1, 1 + TBo, axis=0)) * 0.5
        dy_ref[0, out_rows, :] = crop(hsmooth(dyv))


def pyramid_level_pallas(img: jnp.ndarray, interpret: bool = False,
                         derivs: bool = True):
    """img: [C, H, W] f32. With ``derivs`` returns (sm, dx, dy), each
    [C, H, W] — the blurred level and its derivative-of-Gaussian x/y
    gradients, matching ops/image.py's gaussian_blur + sobel_derivatives
    semantics (interior exactly; borders via edge replication). With
    ``derivs=False`` returns just sm (levels >= 1: only the corner
    detector consumes derivatives, and only at level 0)."""
    from jax.experimental import pallas as pl

    C, H, W = img.shape
    TB = 64
    n_bands = -(-H // TB)
    Hp = 8 + n_bands * TB + 8
    Wp = 128 + _round_up(W + 2, 128)
    canvas = jnp.pad(img, ((0, 0), (8, Hp - H - 8), (128, Wp - W - 128)),
                     mode="edge")
    kern = functools.partial(_level_kernel, H=H, W=W, Wp=Wp, TB=TB,
                             n_bands=n_bands, derivs=derivs)
    shape = jax.ShapeDtypeStruct((C, H, W), img.dtype)
    spec = pl.BlockSpec((1, H, W), lambda c: (c, 0, 0))
    out = pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape) if derivs else (shape,),
        grid=(C,),
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda c: (c, 0, 0))],
        out_specs=(spec, spec, spec) if derivs else (spec,),
        interpret=interpret,
    )(canvas)
    return out if derivs else out[0]
