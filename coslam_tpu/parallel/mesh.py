"""Mesh construction and state sharding for camera-parallel SLAM.

Sharding layout (BASELINE.json north star: "cameras and keyframe/map
blocks sharded across hosts"):

  tracks.*        [C, ...]      -> P('cam')   per-camera, local to a device
  R, t            [C, ...]      -> P('cam')
  pose_hist_*     [C, T, ...]   -> P('cam')
  kfs.R/t/obs_*   [KF, C, ...]  -> P(None, 'cam')
  mappts.*        [P, ...]      -> replicated (shared map, all cameras
                                   query it during matching/registration)
  images          [C, H, W]     -> P('cam')

Per-camera stages then run with zero communication; cross-camera stages
(map queries, BA reductions, grouping counts) communicate via XLA
collectives inserted by GSPMD or explicit psum in shard_map.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from coslam_tpu.slam.state import SlamState


def make_cam_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), ("cam",))


def state_pspecs(state: SlamState) -> SlamState:
    """PartitionSpec pytree matching SlamState: fully REPLICATED.

    The multi-chip layout is "shard pixels, replicate points"
    (fused.frame_step's mesh mode): the HBM-heavy per-camera work
    (pyramids, KLT windows, corner maps — data that never lives in
    SlamState) is sharded one-camera-per-device, while the track/point
    tables — a few MB — replicate so every cross-camera stage
    (classification, registration, BA collection) is local on every
    device. Camera-sharding the state instead costs ~2000 GSPMD-inserted
    collectives per step (every scalar camera index into a sharded axis
    becomes a permute/gather; measured on the 8-device virtual mesh)."""
    rep = P()
    return jax.tree_util.tree_map(lambda _: rep, state)


def shard_state(state: SlamState, mesh: Mesh) -> SlamState:
    """Place a SlamState onto the mesh (replicated — see state_pspecs)."""
    specs = state_pspecs(state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
