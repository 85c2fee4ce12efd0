"""Camera grouping: view-overlap costs + connected components.

Replaces ``CoSLAM::cameraGrouping`` (SL_CoSLAM.cpp:1632-1697) with
``getViewOverlapCosts`` (:1543-1630, shared-point convex hulls) and
LibVisualSLAM ``findConnectedComponents``. The overlap statistic is the
shared-map-point count weighted by the shared points' convex-hull image
coverage, like the reference — the hull area comes from the batched
direction-sweep hull (geometry/hull.py) so all C^2 hulls are one device
reduction. Group membership is tiny host data.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.slam.classify import point_obs_table
from coslam_tpu.slam.state import SlamState, ST_ALIVE


@jax.jit
def view_overlap_counts(state: SlamState):
    """[C, C] shared alive-map-point counts + [C, C] coverage fraction of
    the shared points in each camera's image."""
    tracks, mappts = state.tracks, state.mappts
    C, N = tracks.valid.shape
    P = mappts.xyz.shape[0]
    slot, obs_px, obs_ok = point_obs_table(tracks, P)
    alive = mappts.status == ST_ALIVE
    ok = obs_ok & alive[:, None]                     # [P, C]
    shared = jnp.einsum("pi,pj->ij", ok.astype(jnp.float32),
                        ok.astype(jnp.float32))
    # convex-hull coverage of shared points, per pair, in camera i's image
    # (getViewOverlapCosts builds the shared-point hull per camera pair)
    from coslam_tpu.geometry.hull import hull_area_masked
    pair_ok = ok[:, :, None] & ok[:, None, :]        # [P, C, C]
    x = jnp.broadcast_to(obs_px[..., 0][:, :, None], pair_ok.shape)
    y = jnp.broadcast_to(obs_px[..., 1][:, :, None], pair_ok.shape)
    area = hull_area_masked(x, y, pair_ok)
    return shared, area


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("h", "w", "dormant_age"))
def host_scan_device(state: SlamState, K: jnp.ndarray,
                     h: int, w: int, dormant_age: int) -> jnp.ndarray:
    """ALL periodic host-decision reductions in one device call + one
    packed [C, 3C+2] transfer: grouping overlap (shared counts + hull
    coverage), merge-candidate counts, per-owner alive counts, and
    dormant-in-view counts (loop prefilter). Over the tunneled TPU each
    separate device_get costs a full round trip — packing them is worth
    more than any compute saving."""
    from coslam_tpu.slam.merge import scan_candidates_device
    shared, area = view_overlap_counts(state)
    mc, alive_own, dorm = scan_candidates_device(state, K, h, w,
                                                 dormant_age)
    return jnp.concatenate(
        [shared, area, mc, alive_own[:, None],
         dorm[:, None].astype(jnp.float32)], axis=1)


def camera_grouping(state: SlamState, cfg: SlamConfig,
                    min_shared: int = 20,
                    min_cover: float = 0.2,
                    shared: np.ndarray | None = None,
                    area: np.ndarray | None = None) -> np.ndarray:
    """Returns [C] group ids (connected components of the overlap graph)."""
    C = cfg.num_cameras
    if shared is None or area is None:
        shared, area = jax.tree_util.tree_map(np.asarray,
                                              view_overlap_counts(state))
    img_area = float(cfg.image_height * cfg.image_width)
    # union-find over edges
    parent = list(range(C))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(C):
        for j in range(i + 1, C):
            cover = min(area[i, j], area[j, i]) / img_area
            if shared[i, j] >= min_shared and cover >= min_cover:
                parent[find(i)] = find(j)
    roots = {}
    gid = np.zeros(C, np.int32)
    for c in range(C):
        r = find(c)
        if r not in roots:
            roots[r] = len(roots)
        gid[c] = roots[r]
    return gid


def group_camera_tuples(group_id: np.ndarray) -> list[tuple[int, ...]]:
    """Ordered camera tuples per group with >= 2 cameras (the unit of
    multi-view inter-camera mapping)."""
    out = []
    for g in np.unique(group_id):
        cams = tuple(int(c) for c in np.nonzero(group_id == g)[0])
        if len(cams) >= 2:
            out.append(cams)
    return out


def group_adjacent_pairs(group_id: np.ndarray) -> list[tuple[int, int]]:
    """Adjacent camera pairs within each group (inter-camera mapping runs
    pairwise along the group order, SL_NewMapPointsInterCam.cpp:98-148)."""
    pairs = []
    for g in np.unique(group_id):
        cams = np.nonzero(group_id == g)[0]
        for k in range(len(cams) - 1):
            pairs.append((int(cams[k]), int(cams[k + 1])))
    return pairs
