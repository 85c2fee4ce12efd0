"""2D convex hulls: exact host-side monotone chain + a device-friendly
direction-sweep hull for batched masked point sets.

Replaces the reference's LibVisualSLAM ``SL_ConvexHull2D.h`` surface
(``get2DConvexHull`` + polygon area; used by CoSLAM's view-overlap costs,
SL_CoSLAM.cpp:1543-1630, and merge overlap masks,
SL_MergeCameraGroup.cpp:56-177).

TPU design: the per-frame overlap statistic needs C^2 hull areas over
masked [P] point sets every frame — a sequential hull stack does not
vectorize, but the *extreme point in direction theta* does: as theta
sweeps the circle, the argmax point visits the hull vertices in order, so
K direction probes yield up to K true hull vertices already in polygon
order, and the shoelace formula gives an exact inner approximation of the
hull area (exact whenever the hull has <= K captured vertices; error
O(1/K^2) otherwise). Everything is masked max/argmax + gather — no sort,
no data-dependent shapes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# host-side exact hull (merge checks, export/visualization)
# ---------------------------------------------------------------------------

def convex_hull(points: np.ndarray) -> np.ndarray:
    """Exact convex hull by Andrew's monotone chain.

    points: [N, 2]. Returns hull vertices [H, 2] in counter-clockwise
    order (no repeated endpoint). Degenerate inputs (N < 3, collinear)
    return the extreme points found.
    """
    pts = np.unique(np.asarray(points, np.float64), axis=0)
    n = len(pts)
    if n <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list[np.ndarray] = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[np.ndarray] = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return np.asarray(lower[:-1] + upper[:-1])


def polygon_area(verts: np.ndarray) -> float:
    """Shoelace area of a simple polygon [H, 2] (positive for CCW)."""
    v = np.asarray(verts, np.float64)
    if len(v) < 3:
        return 0.0
    x, y = v[:, 0], v[:, 1]
    return float(0.5 * abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)))


def points_in_hull(pts: np.ndarray, hull: np.ndarray,
                   eps: float = 1e-9) -> np.ndarray:
    """[N] bool: inside-or-on test against a CCW hull [H, 2] by half-plane
    checks (the reference's mask test projects candidate points against the
    feature hull, SL_MergeCameraGroup.cpp:103-141)."""
    pts = np.asarray(pts, np.float64)
    hull = np.asarray(hull, np.float64)
    if len(hull) < 3:
        return np.zeros(len(pts), bool)
    a = hull
    b = np.roll(hull, -1, axis=0)
    # cross((b-a), (p-a)) >= 0 for all edges (CCW)
    d = (b[:, 0] - a[:, 0])[None, :] * (pts[:, 1:2] - a[:, 1][None, :]) \
        - (b[:, 1] - a[:, 1])[None, :] * (pts[:, 0:1] - a[:, 0][None, :])
    return np.all(d >= -eps, axis=1)


# ---------------------------------------------------------------------------
# device-side batched hull area
# ---------------------------------------------------------------------------

def hull_area_masked(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray,
                     n_dirs: int = 32) -> jnp.ndarray:
    """Convex-hull area of masked point sets, batched over trailing dims.

    x, y: [P, *B] coordinates; mask: [P, *B] bool. Returns [*B] areas.
    Inner approximation from ``n_dirs`` direction-extreme vertices (see
    module docstring); empty/degenerate sets give 0.
    """
    theta = jnp.arange(n_dirs, dtype=x.dtype) * (2.0 * jnp.pi / n_dirs)
    neg = jnp.asarray(-1e30, x.dtype)

    def probe(_, th):
        proj = jnp.where(mask, jnp.cos(th) * x + jnp.sin(th) * y, neg)
        idx = jnp.argmax(proj, axis=0)                       # [*B]
        vx = jnp.take_along_axis(x, idx[None], axis=0)[0]
        vy = jnp.take_along_axis(y, idx[None], axis=0)[0]
        return None, (vx, vy)

    _, (vx, vy) = jax.lax.scan(probe, None, theta)           # [K, *B]
    area = 0.5 * jnp.abs(jnp.sum(
        vx * jnp.roll(vy, -1, axis=0) - jnp.roll(vx, -1, axis=0) * vy,
        axis=0))
    any_pt = jnp.any(mask, axis=0)
    return jnp.where(any_pt, area, 0.0)
