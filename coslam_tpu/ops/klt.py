"""Batched coarse-to-fine KLT feature tracker with per-feature gain.

TPU-native re-design of the reference's in-shader KLT (v3d_gpuklt.cpp:99-305
driving klt_tracker.cg / klt_tracker_with_gain.cg): the Cg version runs the
whole level/iteration loop inside one fragment shader with features packed
in a 32x32 RGB-float texture. Here the same math is expressed over a dense
[C, N] feature batch: every Gauss-Newton iteration samples all features'
patches at once (four flat gathers), reduces per-patch normal equations on
the VPU, and solves the per-feature 2x2 (or 3x3 with gain) system in
closed form. Levels are a static Python loop (shapes differ per level);
iterations are a lax.fori_loop.

Gain model (klt_tracker_with_gain.cg:42-148): template T ~ g * I with the
smoothness prior lambda * (g - 1)^2, unknowns (du, dv, dg) per feature.

Invalidation mirrors klt_tracker.cg:113-129: out-of-bounds support,
non-finite updates, or final SSD above threshold (8-bit intensity scale).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from coslam_tpu.config import KLTConfig
from coslam_tpu.ops.patches import extract_patches, extract_patches_with_grad
from coslam_tpu.ops.pyramid import Pyramid


class KLTResult(NamedTuple):
    pos: jnp.ndarray     # [C, N, 2] tracked positions (full-res px)
    valid: jnp.ndarray   # [C, N] bool
    ssd: jnp.ndarray     # [C, N] final sum of squared differences
    gain: jnp.ndarray    # [C, N] illumination gain estimate


def _levels_schedule(n_levels: int, level_skip: int) -> list[int]:
    levels = list(range(n_levels - 1, -1, -max(level_skip, 1)))
    if levels[-1] != 0:
        levels.append(0)
    return levels


def _track_one_level(img_t, img_c, dx_c, dy_c, pos_t, q, g, cfg: KLTConfig):
    """One pyramid level for one camera. pos_t: template positions [N, 2]
    (level coords); q: current target estimates [N, 2]. Returns (q, g, ok)."""
    r = cfg.window_radius
    T, ok_t = extract_patches(img_t, pos_t, r)          # [N, P]
    lam = jnp.asarray(cfg.gain_lambda, T.dtype)

    def body(_, carry):
        q, g, done = carry
        I, gx, gy, ok = extract_patches_with_grad(img_c, dx_c, dy_c, q, r)
        e = T - g[:, None] * I                           # residual [N, P]
        gw = g[:, None]
        ju, jv = gw * gx, gw * gy
        if cfg.track_with_gain:
            jg = I
            a11 = jnp.sum(ju * ju, -1)
            a12 = jnp.sum(ju * jv, -1)
            a13 = jnp.sum(ju * jg, -1)
            a22 = jnp.sum(jv * jv, -1)
            a23 = jnp.sum(jv * jg, -1)
            a33 = jnp.sum(jg * jg, -1) + lam
            b1 = jnp.sum(ju * e, -1)
            b2 = jnp.sum(jv * e, -1)
            b3 = jnp.sum(jg * e, -1) + lam * (1.0 - g)
            # closed-form symmetric 3x3 solve (cofactors)
            c11 = a22 * a33 - a23 * a23
            c12 = a13 * a23 - a12 * a33
            c13 = a12 * a23 - a13 * a22
            c22 = a11 * a33 - a13 * a13
            c23 = a12 * a13 - a11 * a23
            c33 = a11 * a22 - a12 * a12
            det = a11 * c11 + a12 * c12 + a13 * c13
            det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
            du = (c11 * b1 + c12 * b2 + c13 * b3) / det
            dv = (c12 * b1 + c22 * b2 + c23 * b3) / det
            dg = (c13 * b1 + c23 * b2 + c33 * b3) / det
        else:
            a11 = jnp.sum(ju * ju, -1)
            a12 = jnp.sum(ju * jv, -1)
            a22 = jnp.sum(jv * jv, -1)
            b1 = jnp.sum(ju * e, -1)
            b2 = jnp.sum(jv * e, -1)
            det = a11 * a22 - a12 * a12
            det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
            du = (a22 * b1 - a12 * b2) / det
            dv = (a11 * b2 - a12 * b1) / det
            dg = jnp.zeros_like(du)
        step = jnp.stack([du, dv], axis=-1)
        finite = jnp.all(jnp.isfinite(step), -1) & jnp.isfinite(dg) & ok
        upd = (finite & ~done)[:, None]
        q = q + jnp.where(upd, step, 0.0)
        g = g + jnp.where(upd[:, 0], dg, 0.0)
        done = done | (jnp.linalg.norm(step, axis=-1) < cfg.convergence_threshold)
        return q, g, done

    done0 = jnp.zeros(q.shape[0], dtype=bool)
    q, g, _ = jax.lax.fori_loop(0, cfg.n_iterations, body, (q, g, done0))
    return q, g


def _klt_track_single(pyr_prev: Pyramid, pyr_cur: Pyramid, pos: jnp.ndarray,
                      valid: jnp.ndarray, cfg: KLTConfig) -> KLTResult:
    """One camera. pos: [N, 2] full-res positions in the previous frame."""
    levels = _levels_schedule(len(pyr_prev.imgs), cfg.level_skip)
    top = levels[0]
    q = pos * (0.5 ** top)
    g = jnp.ones(pos.shape[0], dtype=pos.dtype)
    prev_l = top
    # Coarse levels sample with clamping and never invalidate (small coarse
    # images can't hold a full patch support); only the finest level gates.
    for li, l in enumerate(levels):
        if li > 0:
            q = q * (2.0 ** (prev_l - l))
        pos_t = pos * (0.5 ** l)
        q, g = _track_one_level(
            pyr_prev.imgs[l], pyr_cur.imgs[l], pyr_cur.dxs[l], pyr_cur.dys[l],
            pos_t, q, g, cfg)
        prev_l = l
    # final SSD at level 0 (8-bit scale, sum over the window)
    r = cfg.window_radius
    T, ok_t = extract_patches(pyr_prev.imgs[0], pos, r)
    I, ok_c = extract_patches(pyr_cur.imgs[0], q, r)
    ok = valid & ok_t & ok_c
    e = T - g[:, None] * I
    ssd = jnp.sum(e * e, axis=-1)
    h, w = pyr_cur.imgs[0].shape
    b = float(cfg.border)
    in_border = ((q[:, 0] >= b) & (q[:, 0] <= w - 1 - b)
                 & (q[:, 1] >= b) & (q[:, 1] <= h - 1 - b))
    ok = ok & in_border & (ssd < cfg.ssd_threshold) & jnp.all(jnp.isfinite(q), -1)
    return KLTResult(pos=q, valid=ok, ssd=ssd, gain=g)


@partial(jax.jit, static_argnames=("cfg",))
def klt_track(pyr_prev: Pyramid, pyr_cur: Pyramid, pos: jnp.ndarray,
              valid: jnp.ndarray, cfg: KLTConfig) -> KLTResult:
    """Track features from the previous to the current frame, all cameras.

    pyr_*: camera-batched pyramids ([C, H_l, W_l] per level);
    pos: [C, N, 2]; valid: [C, N].
    """
    return jax.vmap(lambda pp, pc, p, v: _klt_track_single(pp, pc, p, v, cfg)
                    )(pyr_prev, pyr_cur, pos, valid)
