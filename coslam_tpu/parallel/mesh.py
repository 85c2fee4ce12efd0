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
    """PartitionSpec pytree matching SlamState."""
    cam = P("cam")
    rep = P()
    kf_cam = P(None, "cam")
    return SlamState(
        frame=rep,
        R=cam, t=cam,
        tracks=type(state.tracks)(*([cam] * len(state.tracks))),
        mappts=type(state.mappts)(*([rep] * len(state.mappts))),
        kfs=type(state.kfs)(
            frame=rep, R=kf_cam, t=kf_cam, obs_pos=kf_cam, obs_mpt=kf_cam,
            obs_gen=kf_cam, dyn_xyz=rep, dyn_obs_px=kf_cam,
            dyn_obs_ok=kf_cam, n=rep),
        pose_hist_R=cam, pose_hist_t=cam,
        pose_hist_long_R=cam, pose_hist_long_t=cam,
        group_id=cam)


def shard_state(state: SlamState, mesh: Mesh) -> SlamState:
    """Place a SlamState onto the mesh with the camera-parallel layout.
    mappts.ncc has a camera axis at position 1 but is kept replicated
    (every camera matches against every point's appearance)."""
    specs = state_pspecs(state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs)
