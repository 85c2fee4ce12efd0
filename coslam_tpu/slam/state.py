"""Fixed-capacity SoA SLAM state.

Design delta from the reference (SURVEY.md §7): the pointer-linked lists
(FeaturePoint chains SL_FeaturePoint.h:24-64, MapPoint with per-camera
feature pointers SL_MapPoint.h:34-128, CamPoseList, KeyPose ring) become
statically-shaped arrays with validity masks:

  - feature/track slots [C, N]   (N = 32x32 = 1024 like the KLT grid)
  - map-point slots     [P]      with per-camera obs binding [P] <-> [C, N]
  - rolling history     [C, T, N] ring (replaces preFrame/nextFrame chains)
  - keyframe ring       [KF]     (replaces KeyPoseList)

so every stage is a jitted, vmapped device function and state never
reallocates (no recompilation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from coslam_tpu.config import SlamConfig

# map-point lifecycle status
ST_FREE = 0
ST_ALIVE = 1
ST_FALSE = 2      # classified false -> slot reclaimable

# map-point type (MapPoint type machine, SL_MapPoint.h:87-119)
PT_STATIC = 0
PT_DYNAMIC = 1
PT_UNCERTAIN = 2


class TrackTable(NamedTuple):
    """KLT slot table + rolling 2D history (Track2D equivalent).

    Two history rings: a dense per-frame ring [C, T, N] (T ~ the track
    maturity span) feeding triangulation/epipolar voting, and a coarse
    long-horizon ring [C, TL, N] sampled every ``LONG_STRIDE`` frames so
    the static-consistency test can span the reference's 60-frame
    ``isStaticPoint`` window (SL_CoSLAM.cpp:423-425) without tripling
    every per-frame [C, T, N] stage."""

    pos: jnp.ndarray        # [C, N, 2] undistorted px (SLAM space)
    raw: jnp.ndarray        # [C, N, 2] distorted px (tracker space)
    valid: jnp.ndarray      # [C, N]
    age: jnp.ndarray        # [C, N] i32 frames tracked
    gain: jnp.ndarray       # [C, N]
    mpt: jnp.ndarray        # [C, N] i32 bound map slot, -1 = unmapped
    dyn_votes: jnp.ndarray  # [C, N] i32 epipolar-violation votes (dynamic det.)
    hist: jnp.ndarray       # [C, T, N, 2] undistorted history ring
    hist_valid: jnp.ndarray  # [C, T, N]
    hist_long: jnp.ndarray   # [C, TL, N, 2] every-LONG_STRIDE-frames ring
    hist_long_valid: jnp.ndarray  # [C, TL, N]


class MapPoints(NamedTuple):
    xyz: jnp.ndarray         # [P, 3]
    cov: jnp.ndarray         # [P, 3, 3]
    gen: jnp.ndarray         # [P] i32 slot generation (bumped on realloc, so
                             #  stale keyframe observations can be rejected)
    status: jnp.ndarray      # [P] i32 (ST_*)
    ptype: jnp.ndarray       # [P] i32 (PT_*)
    first_frame: jnp.ndarray  # [P] i32
    last_obs: jnp.ndarray    # [P] i32 last frame with any observation
    bad_votes: jnp.ndarray   # [P] i32 consecutive classification failures
    moved_votes: jnp.ndarray  # [P] i32 consecutive moved-detection frames
                              #  (debounce before a static point flips
                              #   dynamic; a 1-frame pose glitch can fake
                              #   stored-reprojection drift)
    owner: jnp.ndarray       # [P] i32 camera id of most recent observation
                             #  (owner group = group_id[owner]; merge uses it
                             #   to know which points move with which group)
    ncc: jnp.ndarray         # [P, C, B] per-camera appearance blocks
    ncc_valid: jnp.ndarray   # [P, C]


class KeyframeStore(NamedTuple):
    """Ring of keyframes with per-slot observation snapshots
    (KeyPose/KeyFrame equivalent; feeds BA windows).

    ``dyn_*``: per-keyframe deep-copied dynamic-point snapshots
    (KeyFrame::storeDynamicMapPoints, SL_KeyPoseList.h:140-148) — a
    dynamic point's position is only meaningful at its snapshot instant,
    so each keyframe carries its own copy + observations; the BA window
    treats each (keyframe, dynamic point) as an independent landmark
    (SL_CoSLAMRobustBA.cpp:66-77)."""

    frame: jnp.ndarray    # [KF] i32, -1 = empty
    R: jnp.ndarray        # [KF, C, 3, 3]
    t: jnp.ndarray        # [KF, C, 3]
    obs_pos: jnp.ndarray  # [KF, C, N, 2] undistorted px at the keyframe
    obs_mpt: jnp.ndarray  # [KF, C, N] i32 map binding at the keyframe
    obs_gen: jnp.ndarray  # [KF, C, N] i32 map-slot generation at snapshot
    dyn_xyz: jnp.ndarray     # [KF, D, 3] dynamic-point snapshot positions
    dyn_obs_px: jnp.ndarray  # [KF, C, D, 2] their per-camera observations
    dyn_obs_ok: jnp.ndarray  # [KF, C, D]
    n: jnp.ndarray        # scalar i32: total keyframes ever written


class SlamState(NamedTuple):
    frame: jnp.ndarray        # scalar i32
    R: jnp.ndarray            # [C, 3, 3] current world->camera
    t: jnp.ndarray            # [C, 3]
    tracks: TrackTable
    mappts: MapPoints
    kfs: KeyframeStore
    pose_hist_R: jnp.ndarray  # [C, T, 3, 3] ring aligned with tracks.hist
    pose_hist_t: jnp.ndarray  # [C, T, 3]
    pose_hist_long_R: jnp.ndarray  # [C, TL, 3, 3] aligned with hist_long
    pose_hist_long_t: jnp.ndarray  # [C, TL, 3]
    group_id: jnp.ndarray     # [C] i32 camera-group assignment


# sampling stride (frames) of the long-horizon history ring
LONG_STRIDE = 3


def history_len(cfg: SlamConfig) -> int:
    return max(cfg.p.min_feat_track_len + 1, 8)


def long_history_len(cfg: SlamConfig) -> int:
    """Slots in the long-horizon ring: LONG_STRIDE * TL spans the
    classify window (the reference's numFrame=60 isStaticPoint span)."""
    return max(-(-cfg.p.classify_frame_window // LONG_STRIDE), 1)


def init_state(cfg: SlamConfig) -> SlamState:
    C = cfg.num_cameras
    N = cfg.cap.max_features
    P = cfg.cap.max_map_points
    KF = cfg.cap.max_keyframes
    T = history_len(cfg)
    TL = long_history_len(cfg)
    B = (2 * cfg.p.ncc_patch_radius + 1) ** 2
    f32 = jnp.float32
    i32 = jnp.int32
    tracks = TrackTable(
        pos=jnp.zeros((C, N, 2), f32), raw=jnp.zeros((C, N, 2), f32),
        valid=jnp.zeros((C, N), bool), age=jnp.zeros((C, N), i32),
        gain=jnp.ones((C, N), f32),
        mpt=jnp.full((C, N), -1, i32),
        dyn_votes=jnp.zeros((C, N), i32),
        hist=jnp.zeros((C, T, N, 2), f32),
        hist_valid=jnp.zeros((C, T, N), bool),
        hist_long=jnp.zeros((C, TL, N, 2), f32),
        hist_long_valid=jnp.zeros((C, TL, N), bool))
    mappts = MapPoints(
        xyz=jnp.zeros((P, 3), f32),
        cov=jnp.zeros((P, 3, 3), f32),
        gen=jnp.zeros((P,), i32),
        status=jnp.zeros((P,), i32),
        ptype=jnp.zeros((P,), i32),
        first_frame=jnp.zeros((P,), i32),
        last_obs=jnp.zeros((P,), i32),
        bad_votes=jnp.zeros((P,), i32),
        moved_votes=jnp.zeros((P,), i32),
        owner=jnp.zeros((P,), i32),
        ncc=jnp.zeros((P, C, B), f32),
        ncc_valid=jnp.zeros((P, C), bool))
    D = cfg.p.dyn_max_points
    kfs = KeyframeStore(
        frame=jnp.full((KF,), -1, i32),
        R=jnp.tile(jnp.eye(3, dtype=f32), (KF, C, 1, 1)),
        t=jnp.zeros((KF, C, 3), f32),
        obs_pos=jnp.zeros((KF, C, N, 2), f32),
        obs_mpt=jnp.full((KF, C, N), -1, i32),
        obs_gen=jnp.zeros((KF, C, N), i32),
        dyn_xyz=jnp.zeros((KF, D, 3), f32),
        dyn_obs_px=jnp.zeros((KF, C, D, 2), f32),
        dyn_obs_ok=jnp.zeros((KF, C, D), bool),
        n=jnp.zeros((), i32))
    return SlamState(
        frame=jnp.zeros((), i32),
        R=jnp.tile(jnp.eye(3, dtype=f32), (C, 1, 1)),
        t=jnp.zeros((C, 3), f32),
        tracks=tracks, mappts=mappts, kfs=kfs,
        pose_hist_R=jnp.tile(jnp.eye(3, dtype=f32), (C, T, 1, 1)),
        pose_hist_t=jnp.zeros((C, T, 3), f32),
        pose_hist_long_R=jnp.tile(jnp.eye(3, dtype=f32), (C, TL, 1, 1)),
        pose_hist_long_t=jnp.zeros((C, TL, 3), f32),
        group_id=jnp.zeros((C,), i32))
