"""Bilinear sampling and patch extraction at sub-pixel feature positions.

This is the memory-access core of the KLT tracker and the NCC descriptor
extractor (reference: the texture fetches inside klt_tracker.cg:53-127 and
NCCBlock extraction, SL_NCCBlock.h:19-61). The GPU reference gets bilinear
interpolation for free from texture units; on TPU we express it as four
flat gathers (jnp.take) that XLA vectorizes, with positions batched over
all features of all cameras at once. An alternative one-hot-matmul
formulation (MXU-friendly) is provided for benchmarking on wide batches.

Convention: positions are (x, y) with (0, 0) at the center of the top-left
pixel; a position is "in bounds" if the full bilinear support lies inside
the image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def sample_bilinear(img: jnp.ndarray, pts: jnp.ndarray):
    """img: [H, W]; pts: [..., 2] (x, y). Returns (vals [...], valid [...]).

    Out-of-bounds samples are clamped; validity marks full in-bounds support.
    """
    h, w = img.shape
    x = pts[..., 0]
    y = pts[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 2)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 2)
    flat = img.reshape(-1)
    base = y0i * w + x0i
    v00 = jnp.take(flat, base, axis=0)
    v01 = jnp.take(flat, base + 1, axis=0)
    v10 = jnp.take(flat, base + w, axis=0)
    v11 = jnp.take(flat, base + w + 1, axis=0)
    vals = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)
    valid = (x >= 0) & (y >= 0) & (x <= w - 1.001) & (y <= h - 1.001)
    return vals, valid


def patch_offsets(radius: int, dtype=jnp.float32) -> jnp.ndarray:
    """[(2r+1)^2, 2] (dx, dy) offsets, row-major."""
    r = radius
    g = np.mgrid[-r:r + 1, -r:r + 1]  # [2, k, k] (dy, dx)
    off = np.stack([g[1].ravel(), g[0].ravel()], axis=-1)
    return jnp.asarray(off, dtype=dtype)


def extract_patches(img: jnp.ndarray, centers: jnp.ndarray, radius: int):
    """img: [H, W]; centers: [N, 2]. Returns (patches [N, (2r+1)^2],
    valid [N]) — valid requires the whole patch support in bounds."""
    off = patch_offsets(radius, centers.dtype)
    pts = centers[:, None, :] + off[None, :, :]      # [N, P, 2]
    vals, ok = sample_bilinear(img, pts)
    return vals, jnp.all(ok, axis=-1)


def extract_patches_with_grad(img, dx, dy, centers, radius: int):
    """Patch values and gradients in one call (KLT inner loop)."""
    off = patch_offsets(radius, centers.dtype)
    pts = centers[:, None, :] + off[None, :, :]
    vals, ok = sample_bilinear(img, pts)
    gx, _ = sample_bilinear(dx, pts)
    gy, _ = sample_bilinear(dy, pts)
    return vals, gx, gy, jnp.all(ok, axis=-1)


def _split_bf16_dot(a32: jnp.ndarray, sel: jnp.ndarray, dims) -> jnp.ndarray:
    """dot_general(a32, sel) where ``sel`` is exact one-hot bf16 and a32 is
    f32: split a32 into hi + lo bf16 parts so the selected values come back
    f32-accurate (~2^-16 relative) at 2x bf16 matmul cost — far cheaper
    than a 6-pass 'highest' f32 matmul."""
    hi = a32.astype(jnp.bfloat16)
    lo = (a32 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    kw = dict(dimension_numbers=dims, preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jax.lax.dot_general(hi, sel, **kw)
            + jax.lax.dot_general(lo, sel, **kw))


def extract_windows_onehot(img: jnp.ndarray, base: jnp.ndarray,
                           G: int) -> jnp.ndarray:
    """img: [H, W]; base: [N, 2] int32 (x0, y0) window origins (clamped by
    caller). Returns [G, G, N] windows, out[g1, g2, n] = img[y0+g1, x0+g2].

    Two one-hot contractions on the MXU; hi/lo-split bf16 keeps the
    selected pixel values f32-accurate (bf16-rounded images cost ~0.05 px
    of KLT subpixel accuracy, measured as a 1.4x worse ATE).
    """
    h, w = img.shape
    N = base.shape[0]
    bx, by = base[:, 0], base[:, 1]
    rows = (jnp.arange(h, dtype=jnp.int32)[None, None, :]
            == (by[None, :, None] + jnp.arange(G, dtype=jnp.int32)[:, None, None]))
    rowsel = rows.astype(jnp.bfloat16)                # [G, N, H]
    A = _split_bf16_dot(
        img, rowsel.reshape(G * N, h),
        (((0,), (1,)), ((), ())))                     # [W, G*N]
    A = A.T.reshape(G, N, w)
    cols = (jnp.arange(w, dtype=jnp.int32)[None, None, :]
            == (bx[None, :, None] + jnp.arange(G, dtype=jnp.int32)[:, None, None]))
    colsel = cols.astype(jnp.bfloat16)                # [G2, N, W]
    # out[g1, g2, n] = sum_w A[g1, n, w] * colsel[g2, n, w]  (batch over n)
    out = _split_bf16_dot(
        A.transpose(1, 0, 2), colsel.transpose(1, 0, 2),
        (((2,), (2,)), ((0,), (0,))))                 # [N, G, G2]
    return out.transpose(1, 2, 0)                     # [G, G2, N]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _extract_windows_pallas(imgs: jnp.ndarray, base: jnp.ndarray,
                            G: int) -> jnp.ndarray:
    """Pallas window extraction: the whole (padded) image sits in VMEM and
    each feature's [G, G] window is cut out with two aligned dynamic slices
    plus two vector rolls — no gathers, no one-hot matmuls. 7x faster than
    the one-hot formulation at the bench shape (234 us vs 1595 us for
    3 cams x 1024 windows of 24x24 from 640x480).

    Mosaic constraints shape the design (all verified on this toolchain):
    - vector loads need sublane offsets that are multiples of 8 and lane
      offsets that are multiples of 128 -> slice at aligned origins, then
      roll the remainder;
    - `pltpu.roll` with a dynamic shift miscompiles when the rolled axis
      is not a power-of-two number of 128-lane tiles -> roll inside an
      aligned [GB, 256] band (GB, 256 both powers-of-two-friendly);
    - reshapes that flatten sublanes into lanes are unsupported, and
      narrow output rows (G floats) make the output DMA descriptor-bound
      -> emit [G, 128]-wide rows (window = first G columns) so each
      feature's output block is contiguous in HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, H, W = imgs.shape
    N = base.shape[1]
    CHUNK = 32
    NP = _round_up(N, CHUNK)
    # aligned band height (dy < 8). Must be a power-of-two number of
    # 8-sublane tiles: this Mosaic's dynamic roll miscompiles on axes
    # whose tile count is not a power of two (measured: 3- and 5-tile
    # axes return windows shifted by whole tiles).
    GB = 16
    while GB < G + 8:
        GB *= 2
    # pad the image so every aligned band/roll window stays in bounds:
    # y0a <= round_up(H,8)-8, +GB  =>  Hp >= round_up(H,8)-8+GB;
    # xa  <= round_up(W,128)-128, +256  =>  Wp >= round_up(W,128)+128
    Hp = _round_up(H, 8) + GB - 8
    Wp = _round_up(W, 128) + 128
    imgs_p = jnp.pad(imgs, ((0, 0), (0, Hp - H), (0, Wp - W)))
    # clamp defensively: any in-bounds origin is returned exactly; an
    # out-of-bounds origin (callers clip, but belt-and-braces) clamps to
    # the nearest valid window instead of faulting
    bx = jnp.clip(base[..., 0], 0, W - G)
    by = jnp.clip(base[..., 1], 0, H - G)
    pad = ((0, 0), (0, NP - N))
    bx = jnp.pad(bx, pad).reshape(-1)
    by = jnp.pad(by, pad).reshape(-1)

    def kernel(bx_ref, by_ref, img_ref, out_ref):
        c = pl.program_id(0)
        f = pl.program_id(1)
        base_i = c * NP + f * CHUNK

        def body(n, _):
            x0 = bx_ref[base_i + n]
            y0 = by_ref[base_i + n]
            y0a = pl.multiple_of((y0 // 8) * 8, 8)
            xa = pl.multiple_of((x0 // 128) * 128, 128)
            band = img_ref[0, pl.ds(y0a, GB), pl.ds(xa, 256)]
            band = pltpu.roll(band, shift=-(y0 - y0a), axis=0)
            band = pltpu.roll(band, shift=-(x0 - xa), axis=1)
            out_ref[0, n, :, :] = band[:G, :128]
            return 0

        jax.lax.fori_loop(0, CHUNK, body, 0, unroll=True)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, NP // CHUNK),
        # whole padded image as one VMEM block per camera; the block index
        # map is constant in f, so the pipeline fetches it once per camera
        in_specs=[pl.BlockSpec((1, Hp, Wp), lambda c, f, bx, by: (c, 0, 0))],
        out_specs=pl.BlockSpec((1, CHUNK, G, 128),
                               lambda c, f, bx, by: (c, f, 0, 0)),
    )
    wide = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, NP, G, 128), imgs.dtype),
        grid_spec=grid_spec,
    )(bx, by, imgs_p)
    return wide[:, :N, :, :G].transpose(2, 3, 0, 1)


def _extract_windows_gather(imgs: jnp.ndarray, base: jnp.ndarray,
                            G: int) -> jnp.ndarray:
    """Exact-select fallback (CPU tests / non-TPU backends): flat gather.
    Bit-identical to the pallas path (both copy pixels verbatim)."""
    C, H, W = imgs.shape
    N = base.shape[1]
    bx = jnp.clip(base[..., 0], 0, W - G)
    by = jnp.clip(base[..., 1], 0, H - G)
    g = jnp.arange(G, dtype=jnp.int32)
    gy = by[..., None] + g                            # [C, N, G]
    gx = bx[..., None] + g
    idx = gy[..., :, None] * W + gx[..., None, :]     # [C, N, G, G]
    flat = imgs.reshape(C, -1)
    out = jax.vmap(lambda fl, ix: jnp.take(fl, ix.reshape(-1), axis=0)
                   )(flat, idx)
    return out.reshape(C, N, G, G).transpose(2, 3, 0, 1)


def extract_windows(imgs: jnp.ndarray, base: jnp.ndarray, G: int,
                    *, impl: str | None = None) -> jnp.ndarray:
    """Batched integer window extraction for all cameras.

    imgs: [C, H, W] f32; base: [C, N, 2] int32 (x0, y0) window origins
    (clamped into bounds). Returns [G, G, C, N] with
    out[g1, g2, c, n] = imgs[c, y0+g1, x0+g2].

    Replaces the per-feature texture fetches of the reference's KLT
    shaders (klt_tracker.cg:53-127). impl: "pallas" | "gather" | None
    (auto: pallas on TPU backends, gather elsewhere).
    """
    if impl is None:
        impl = "gather" if jax.default_backend() == "cpu" else "pallas"
    if impl == "pallas":
        return _extract_windows_pallas(imgs, base, G)
    return _extract_windows_gather(imgs, base, G)


def frac_shift(Wnd: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray):
    """Bilinear shift of [A, B, N] by per-feature fraction (fx, fy) in
    [0, 1): returns [A-1, B-1, N]."""
    w00 = (1 - fx) * (1 - fy)
    w01 = fx * (1 - fy)
    w10 = (1 - fx) * fy
    w11 = fx * fy
    return (Wnd[:-1, :-1] * w00 + Wnd[:-1, 1:] * w01
            + Wnd[1:, :-1] * w10 + Wnd[1:, 1:] * w11)


