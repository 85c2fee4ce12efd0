"""Synthetic textured-world renderer with ground-truth trajectories.

Test substrate for the SLAM pipeline (the reference validated only against
downloadable sample videos, README.md:177-180; SURVEY.md §4 calls for
synthetic-scene integration tests with known trajectories -> ATE bounds).

World = a set of static textured planes (a room: floor + walls) plus
optional moving textured quads (dynamic objects for the static/dynamic
classification tests). Rendering is a vectorized ray-cast over all pixels:
nearest plane intersection, bilinear texture lookup — exact, anti-aliased
enough for KLT, and fast in XLA on [C, H, W] batches.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.ops.image import gaussian_blur


class Plane(NamedTuple):
    p0: np.ndarray      # [3] origin corner
    eu: np.ndarray      # [3] u edge (full extent)
    ev: np.ndarray      # [3] v edge
    tex: np.ndarray     # [Ht, Wt] f32 texture (0..255)


def make_texture(rng, ht=256, wt=256, blur=1, contrast=255.0):
    t = jnp.asarray(rng.uniform(0, 1, (1, ht, wt)).astype(np.float32))
    for _ in range(blur):
        t = gaussian_blur(t)
    t = t - t.min()
    t = t / (t.max() + 1e-9) * contrast
    return np.asarray(t[0])


def make_room(rng, size=10.0, tex_kw=None) -> list[Plane]:
    """A box room: floor, back wall, left/right walls, ceiling. The camera
    flies inside looking mostly at the back wall (non-planar scene, so
    two-view bootstrap is well-conditioned)."""
    s = size
    tex_kw = tex_kw or {}
    def T():
        return make_texture(rng, **tex_kw)
    return [
        # floor y = +s/2 (y down)
        Plane(np.array([-s, s / 2, 0.0]), np.array([2 * s, 0, 0]),
              np.array([0, 0, 2 * s]), T()),
        # ceiling y = -s/2
        Plane(np.array([-s, -s / 2, 0.0]), np.array([2 * s, 0, 0]),
              np.array([0, 0, 2 * s]), T()),
        # back wall z = 2s
        Plane(np.array([-s, -s / 2, 2 * s]), np.array([2 * s, 0, 0]),
              np.array([0, s, 0]), T()),
        # left wall x = -s
        Plane(np.array([-s, -s / 2, 0.0]), np.array([0, 0, 2 * s]),
              np.array([0, s, 0]), T()),
        # right wall x = +s
        Plane(np.array([s, -s / 2, 0.0]), np.array([0, 0, 2 * s]),
              np.array([0, s, 0]), T()),
    ]


class MovingQuad(NamedTuple):
    """A dynamic textured quad: position is a function of frame index."""
    center0: np.ndarray   # [3] at frame 0
    velocity: np.ndarray  # [3] per frame
    eu: np.ndarray        # [3]
    ev: np.ndarray        # [3]
    tex: np.ndarray


def _plane_arrays(planes: list[Plane]):
    p0 = jnp.asarray(np.stack([p.p0 for p in planes]).astype(np.float32))
    eu = jnp.asarray(np.stack([p.eu for p in planes]).astype(np.float32))
    ev = jnp.asarray(np.stack([p.ev for p in planes]).astype(np.float32))
    tex = jnp.asarray(np.stack([p.tex for p in planes]).astype(np.float32))
    return p0, eu, ev, tex


def render(planes: list[Plane], K: np.ndarray, R: np.ndarray, t: np.ndarray,
           h: int, w: int, quads: list[MovingQuad] | None = None,
           frame: int = 0) -> jnp.ndarray:
    """Render one camera view. Returns [H, W] f32 (0..255).

    K: [3,3]; (R, t): world->camera. Quads (dynamic objects) occlude the
    static planes when closer.
    """
    all_p0, all_eu, all_ev, all_tex = _plane_arrays(planes)
    if quads:
        qp = []
        for q in quads:
            c = q.center0 + frame * q.velocity
            qp.append(Plane(c - 0.5 * q.eu - 0.5 * q.ev, q.eu, q.ev, q.tex))
        qp0, qeu, qev, qtex = _plane_arrays(qp)
        # textures may differ in size; require same shape for stacking
        all_p0 = jnp.concatenate([all_p0, qp0])
        all_eu = jnp.concatenate([all_eu, qeu])
        all_ev = jnp.concatenate([all_ev, qev])
        all_tex = jnp.concatenate([all_tex, qtex])
    return _render_jit(all_p0, all_eu, all_ev, all_tex, jnp.asarray(K),
                       jnp.asarray(R), jnp.asarray(t), h, w)


from functools import partial


@partial(jax.jit, static_argnames=("h", "w"))
def _render_jit(p0, eu, ev, tex, K, R, t, h, w):
    npl = p0.shape[0]
    ht, wt = tex.shape[1], tex.shape[2]
    # rays in world frame
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    d_cam = jnp.stack([(xs - cx) / fx, (ys - cy) / fy, jnp.ones_like(xs)], -1)
    d_world = jnp.einsum("ji,hwj->hwi", R, d_cam)        # R^T d
    c = -jnp.einsum("ji,j->i", R, t)                      # camera center
    # normals and inverse basis per plane
    n = jnp.cross(eu, ev)                                 # [P,3]
    denom = jnp.einsum("pi,hwi->phw", n, d_world)
    num = jnp.einsum("pi,pi->p", n, p0 - c[None, :])
    tt = num[:, None, None] / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    hit = c[None, None, None, :] + tt[..., None] * d_world[None]  # [P,H,W,3]
    rel = hit - p0[:, None, None, :]
    # solve rel = a*eu + b*ev via 2x2 gram
    g11 = jnp.einsum("pi,pi->p", eu, eu)
    g12 = jnp.einsum("pi,pi->p", eu, ev)
    g22 = jnp.einsum("pi,pi->p", ev, ev)
    r1 = jnp.einsum("phwi,pi->phw", rel, eu)
    r2 = jnp.einsum("phwi,pi->phw", rel, ev)
    det = (g11 * g22 - g12 * g12)[:, None, None]
    a = (g22[:, None, None] * r1 - g12[:, None, None] * r2) / det
    b = (g11[:, None, None] * r2 - g12[:, None, None] * r1) / det
    inside = (a >= 0) & (a <= 1) & (b >= 0) & (b <= 1) & (tt > 1e-3)
    dist = jnp.where(inside, tt, jnp.inf)
    best = jnp.argmin(dist, axis=0)                       # [H,W]
    any_hit = jnp.isfinite(jnp.min(dist, axis=0))
    ab = jnp.stack([a, b], axis=-1)                       # [P,H,W,2]
    ab_best = jnp.take_along_axis(ab, best[None, :, :, None], axis=0)[0]
    # bilinear texture fetch from the winning plane's texture
    u = jnp.clip(ab_best[..., 0] * (wt - 1), 0.0, wt - 1.001)
    v = jnp.clip(ab_best[..., 1] * (ht - 1), 0.0, ht - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    tex_flat = tex.reshape(npl, ht * wt)
    base = v0 * wt + u0
    def fetch(off):
        idx = best * (ht * wt) + base + off
        return jnp.take(tex_flat.reshape(-1), idx)
    v00 = fetch(0)
    v01 = fetch(1)
    v10 = fetch(wt)
    v11 = fetch(wt + 1)
    val = (v00 * (1 - fu) * (1 - fv) + v01 * fu * (1 - fv)
           + v10 * (1 - fu) * fv + v11 * fu * fv)
    return jnp.where(any_hit, val, 0.0)


def orbit_trajectory(n_frames: int, radius: float = 1.5,
                     forward: float = 0.04, yaw_rate: float = 0.003,
                     bob: float = 0.02):
    """Smooth single-camera trajectory inside the room looking at the back
    wall: gentle forward motion + yaw + vertical bob. Returns (Rs [F,3,3],
    ts [F,3]) world->camera."""
    from coslam_tpu.geometry.se3 import so3_exp_np
    Rs, ts = [], []
    for f in range(n_frames):
        yaw = yaw_rate * f
        R = so3_exp_np(np.array([0.0, yaw, 0.0]))
        c = np.array([radius * np.sin(0.02 * f),
                      bob * np.sin(0.1 * f),
                      forward * f], dtype=np.float32)
        t = -R @ c
        Rs.append(R)
        ts.append(t.astype(np.float32))
    return np.stack(Rs), np.stack(ts)


def multi_cam_rig(n_cams: int, baseline: float = 0.8):
    """Static offsets of each camera from the rig center (world units),
    cameras side by side with slight toe-in."""
    from coslam_tpu.geometry.se3 import so3_exp_np
    offs, rots = [], []
    for ci in range(n_cams):
        x = (ci - (n_cams - 1) / 2.0) * baseline
        offs.append(np.array([x, 0.0, 0.0], dtype=np.float32))
        toe = -0.04 * (ci - (n_cams - 1) / 2.0)
        rots.append(so3_exp_np(np.array([0.0, toe, 0.0])))
    return np.stack(rots), np.stack(offs)


@partial(jax.jit, static_argnames=("h", "w"))
def _render_jit_batch(p0b, eu, ev, tex, K, Rb, tb, h, w):
    return jax.vmap(
        lambda p0, R, t: _render_jit(p0, eu, ev, tex, K, R, t, h, w)
    )(p0b, Rb, tb)


def render_batch(planes, K, Rs, ts, h, w, quads=None, frames=None,
                 chunk=8):
    """Render B views in chunked batched jit calls: Rs [B,3,3], ts [B,3],
    frames [B] (frame index per view, for moving quads; default arange).
    Returns [B, H, W] numpy. One dispatch per ``chunk`` views instead of
    one per view — over a tunneled device that is the difference between
    seconds and minutes for a long sequence (the per-view [P,H,W,3]
    intermediates bound the chunk size)."""
    B = Rs.shape[0]
    if frames is None:
        frames = np.arange(B)
    p0s, eus, evs, texs = _plane_arrays(planes)
    nq = len(quads) if quads else 0
    if nq:
        qp = [Plane(q.center0 - 0.5 * q.eu - 0.5 * q.ev, q.eu, q.ev, q.tex)
              for q in quads]
        qp0, qeu, qev, qtex = _plane_arrays(qp)
        eus = jnp.concatenate([eus, qeu])
        evs = jnp.concatenate([evs, qev])
        texs = jnp.concatenate([texs, qtex])
        vel = jnp.asarray(np.stack([q.velocity for q in quads])
                          .astype(np.float32))                  # [Q,3]
    out = np.zeros((B, h, w), np.float32)
    Kj = jnp.asarray(K)
    for s in range(0, B, chunk):
        e = min(s + chunk, B)
        Rb = jnp.asarray(Rs[s:e].astype(np.float32))
        tb = jnp.asarray(ts[s:e].astype(np.float32))
        fb = jnp.asarray(frames[s:e].astype(np.float32))
        if nq:
            q0 = qp0[None] + fb[:, None, None] * vel[None]      # [b,Q,3]
            p0b = jnp.concatenate(
                [jnp.broadcast_to(p0s[None], (e - s,) + p0s.shape), q0], 1)
        else:
            p0b = jnp.broadcast_to(p0s[None], (e - s,) + p0s.shape)
        out[s:e] = np.asarray(_render_jit_batch(p0b, eus, evs, texs, Kj,
                                                Rb, tb, h, w))
    return out


def render_sequence(planes, K, Rs, ts, h, w, quads=None):
    """Render a whole trajectory: returns [F, H, W] numpy array."""
    return render_batch(planes, K, Rs, ts, h, w, quads=quads)


def apply_distortion_warp(img: jnp.ndarray, K: np.ndarray,
                          kc: np.ndarray) -> jnp.ndarray:
    """Turn an ideal-pinhole rendering [H, W] into what a distorted camera
    with coefficients kc would capture: I_d(p) = I_ideal(K D^-1(K^-1 p)).
    Lets every synthetic test exercise the full undistortion path.
    Accepts [B, H, W] batches (one jit dispatch for the whole batch)."""
    from coslam_tpu.geometry.camera import (pixel_to_normalized,
                                            undistort_normalized,
                                            normalized_to_pixel)
    from coslam_tpu.ops.patches import sample_bilinear
    if img.ndim == 3:
        return _distort_batch(img, jnp.asarray(K), jnp.asarray(kc))
    h, w = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    p = jnp.stack([xs, ys], axis=-1)
    xn = undistort_normalized(pixel_to_normalized(p, jnp.asarray(K)),
                              jnp.asarray(kc))
    src = normalized_to_pixel(xn, jnp.asarray(K))
    vals, _ = sample_bilinear(img, src)
    return vals


@jax.jit
def _distort_batch(imgs, K, kc):
    return jax.vmap(lambda im: apply_distortion_warp(im, K, kc))(imgs)
