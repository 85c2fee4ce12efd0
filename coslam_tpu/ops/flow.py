"""TV-L1 optical flow (coarse-to-fine, fixed-point primal-dual).

Parity component for the reference's GPU flow module (v3d_gpuflow.{h,cpp}
+ OpticalFlow/*.cg shaders, SURVEY.md §2.1) — vendored with the CGKLT
runtime but NOT used by the SLAM pipeline (the reference tracks with KLT
only). Provided for API completeness: the classic Zach/Pock/Bischof
TV-L1 scheme with warping, batched over cameras.

Note: dense per-pixel warping is a gather; XLA's TPU gather lowering is
slow (see ops/klt.py), so this op is functional-parity grade, not a
speed-of-light kernel. The SLAM hot path never calls it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from coslam_tpu.ops.image import gaussian_blur, downsample2
from coslam_tpu.ops.patches import sample_bilinear


def _warp(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray):
    """img: [H, W]; u, v: [H, W] flow. Returns (warped, in_bounds)."""
    h, w = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    pts = jnp.stack([xs + u, ys + v], axis=-1)
    vals, ok = sample_bilinear(img, pts)
    return vals, ok


def _grad(img):
    """Forward differences (the TV operator; adjoint of _div)."""
    gx = jnp.zeros_like(img).at[:, :-1].set(img[:, 1:] - img[:, :-1])
    gy = jnp.zeros_like(img).at[:-1, :].set(img[1:, :] - img[:-1, :])
    return gx, gy


def _grad_central(img):
    """Central differences for the IMAGE gradient (forward differences
    carry a half-pixel phase shift that biases the flow magnitude)."""
    gx = jnp.zeros_like(img).at[:, 1:-1].set(0.5 * (img[:, 2:] - img[:, :-2]))
    gy = jnp.zeros_like(img).at[1:-1, :].set(0.5 * (img[2:, :] - img[:-2, :]))
    return gx, gy


def _div(px, py):
    dx = px - jnp.roll(px, 1, axis=1)
    dx = dx.at[:, 0].set(px[:, 0])
    dy = py - jnp.roll(py, 1, axis=0)
    dy = dy.at[0, :].set(py[0, :])
    return dx + dy


def _tvl1_level(I0, I1, u, v, lam: float, theta: float, n_warps: int,
                n_iters: int, tau: float = 0.25):
    h, w = I0.shape

    def warp_step(carry, _):
        u, v, p11, p12, p21, p22 = carry
        I1w, ok = _warp(I1, u, v)
        gx, gy = _grad_central(I1)
        I1wx, _ = _warp(gx, u, v)
        I1wy, _ = _warp(gy, u, v)
        rho_c = I1w - I0 - I1wx * u - I1wy * v
        grad2 = I1wx ** 2 + I1wy ** 2 + 1e-9

        def inner(carry2, _):
            u, v, p11, p12, p21, p22 = carry2
            rho = rho_c + I1wx * u + I1wy * v
            th = lam * theta * grad2
            d1 = jnp.where(rho < -th, lam * theta * I1wx,
                           jnp.where(rho > th, -lam * theta * I1wx,
                                     -rho * I1wx / grad2))
            d2 = jnp.where(rho < -th, lam * theta * I1wy,
                           jnp.where(rho > th, -lam * theta * I1wy,
                                     -rho * I1wy / grad2))
            v1 = u + d1
            v2 = v + d2
            u_n = v1 + theta * _div(p11, p12)
            v_n = v2 + theta * _div(p21, p22)
            ux, uy = _grad(u_n)
            vx, vy = _grad(v_n)
            taut = tau / theta
            p11 = (p11 + taut * ux)
            p12 = (p12 + taut * uy)
            n1 = jnp.maximum(1.0, jnp.sqrt(p11 ** 2 + p12 ** 2))
            p11, p12 = p11 / n1, p12 / n1
            p21 = (p21 + taut * vx)
            p22 = (p22 + taut * vy)
            n2 = jnp.maximum(1.0, jnp.sqrt(p21 ** 2 + p22 ** 2))
            p21, p22 = p21 / n2, p22 / n2
            return (u_n, v_n, p11, p12, p21, p22), None

        (u, v, p11, p12, p21, p22), _ = jax.lax.scan(
            inner, (u, v, p11, p12, p21, p22), None, length=n_iters)
        u = jnp.clip(u, -w / 2, w / 2)
        v = jnp.clip(v, -h / 2, h / 2)
        return (u, v, p11, p12, p21, p22), None

    z = jnp.zeros_like(u)
    (u, v, *_), _ = jax.lax.scan(warp_step, (u, v, z, z, z, z), None,
                                 length=n_warps)
    return u, v


@partial(jax.jit, static_argnames=("n_levels", "n_warps", "n_iters"))
def tvl1_flow(img0: jnp.ndarray, img1: jnp.ndarray, n_levels: int = 3,
              lam: float = 0.15, theta: float = 0.3, n_warps: int = 3,
              n_iters: int = 20):
    """img0, img1: [C, H, W] in [0, 255]. Returns flow [C, H, W, 2]."""
    s0 = [img0 / 255.0]
    s1 = [img1 / 255.0]
    for _ in range(n_levels - 1):
        s0.append(downsample2(gaussian_blur(s0[-1])))
        s1.append(downsample2(gaussian_blur(s1[-1])))

    def per_cam(levels0, levels1):
        u = jnp.zeros_like(levels0[-1])
        v = jnp.zeros_like(levels0[-1])
        for l in range(n_levels - 1, -1, -1):
            if l < n_levels - 1:
                h, w = levels0[l].shape
                hs, ws = u.shape
                ys = (jnp.arange(h) * hs // h).astype(jnp.int32)
                xs = (jnp.arange(w) * ws // w).astype(jnp.int32)
                u = 2.0 * u[ys][:, xs]
                v = 2.0 * v[ys][:, xs]
            u, v = _tvl1_level(levels0[l], levels1[l], u, v, lam, theta,
                               n_warps, n_iters)
        return jnp.stack([u, v], axis=-1)

    return jax.vmap(per_cam)(tuple(s0), tuple(s1))
