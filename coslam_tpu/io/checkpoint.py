"""Checkpoint / resume for a running SLAM engine.

The reference has NO mid-run checkpointing (SURVEY.md §5 — end-of-run
export only, debug-only snapshot loads); this is a deliberate capability
addition. The full device state (a pytree of fixed-shape arrays) plus the
host-side logs round-trip through one compressed npz.
"""

from __future__ import annotations

import json

import numpy as np
import jax.numpy as jnp

from coslam_tpu.slam.state import (SlamState, TrackTable, MapPoints,
                                   KeyframeStore)

_FORMAT_VERSION = 4   # v4: pyramid derivatives stored for level 0 only
# v3: long-horizon history/pose rings (60-frame classify window)


def _flatten_state(state: SlamState) -> dict:
    out = {}

    def add(prefix, nt):
        for name, val in nt._asdict().items():
            if hasattr(val, "_asdict"):
                add(f"{prefix}{name}.", val)
            else:
                out[f"{prefix}{name}"] = np.asarray(val)

    add("state.", state)
    return out


def _unflatten_state(d: dict) -> SlamState:
    def build(cls, prefix):
        kw = {}
        for name, ann in cls.__annotations__.items():
            key = f"{prefix}{name}"
            if key in d:
                kw[name] = jnp.asarray(d[key])
            else:
                sub = {TrackTable: "tracks", MapPoints: "mappts",
                       KeyframeStore: "kfs"}
                for sub_cls, sub_name in sub.items():
                    if name == sub_name:
                        kw[name] = build(sub_cls, f"{prefix}{name}.")
                        break
        return cls(**kw)

    return build(SlamState, "state.")


def save_checkpoint(path: str, engine):
    """Write the engine's full state (device + host logs) to ``path``."""
    # drain pending stats + buffered frames AND any overlap-deferred
    # single-frame stats (the chunk flush's tail frames go through the
    # single-frame path, which with overlap=True re-defers each frame's
    # stats into _pending_fs; a chunk=1 overlap engine only ever uses
    # that path) — otherwise the last frame's pose is missing from traj
    # while meta['frame'] counts it, and the resumed trajectory comes
    # out one entry short against ground truth
    engine._flush_chunk()
    engine._flush_overlap()
    if getattr(engine, "_pending_ba", None) is not None:
        engine._apply_pending_ba()   # checkpoint BA-consistent state
    arrays = _flatten_state(engine.state)
    meta = {
        "version": _FORMAT_VERSION,
        "frame": engine.frame,
        "bootstrapped": engine.bootstrapped,
        "kf_frames": engine.kf_frames,
        "group_id": engine.group_id.tolist(),
        "last_merge": engine._last_merge,
        "merge_log": engine.merge_log,
        "group_hist": [list(g) for g in engine.group_hist],
        "split_pending": list(engine._split_pending)
        if engine._split_pending is not None else None,
    }
    arrays["meta"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    arrays["kf_inliers"] = engine._kf_inliers
    # the tracker's reference pyramid: storing it makes resume exact and
    # self-contained (rebuilding it from images goes through a different
    # XLA executable whose f32 rounding differs at the ulp level — enough
    # to butterfly over a few frames)
    if engine.pyr_prev is not None:
        for li in range(len(engine.pyr_prev.imgs)):
            arrays[f"pyr.imgs.{li}"] = np.asarray(engine.pyr_prev.imgs[li])
        for li in range(len(engine.pyr_prev.dxs)):   # level 0 only
            arrays[f"pyr.dxs.{li}"] = np.asarray(engine.pyr_prev.dxs[li])
            arrays[f"pyr.dys.{li}"] = np.asarray(engine.pyr_prev.dys[li])
    C = engine.cfg.num_cameras
    for c in range(C):
        if engine.traj[c]:
            arrays[f"traj_R.{c}"] = np.stack([p[0] for p in engine.traj[c]])
            arrays[f"traj_t.{c}"] = np.stack([p[1] for p in engine.traj[c]])
        if engine.rel[c]:
            arrays[f"rel_R.{c}"] = np.stack([r[0] for r in engine.rel[c]])
            arrays[f"rel_t.{c}"] = np.stack([r[1] for r in engine.rel[c]])
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str, engine):
    """Restore a checkpoint into an engine built with the same config.
    The engine continues exactly where it left off — feed the next
    frame. (The reference pyramid is stored in the checkpoint; the
    legacy ``resume_reference_frame`` path remains for checkpoints
    without it.)"""
    d = dict(np.load(path, allow_pickle=False))
    meta = json.loads(bytes(d.pop("meta")).decode())
    if meta["version"] == 2:
        # v2 -> v3 migration: v2 predates the long-horizon history/pose
        # rings (60-frame classify window); they start empty, so fill
        # them from a fresh init_state. The window test simply has no
        # long-horizon evidence for the first frames after resume.
        from coslam_tpu.slam.state import init_state
        fresh = _flatten_state(init_state(engine.cfg))
        for k in ("state.tracks.hist_long", "state.tracks.hist_long_valid",
                  "state.pose_hist_long_R", "state.pose_hist_long_t"):
            if k not in d:
                d[k] = fresh[k]
    elif meta["version"] == 3:
        # v3 -> v4: v3 stored pyramid derivatives for every level; the
        # loader below reads level 0 only and ignores the extras.
        pass
    elif meta["version"] != _FORMAT_VERSION:
        raise ValueError(
            f"checkpoint format v{meta['version']} != supported "
            f"v{_FORMAT_VERSION} (v1 checkpoints predate the KeyframeStore "
            "dynamic-snapshot fields; re-create the checkpoint with this "
            "version)")
    engine.state = _unflatten_state(d)
    engine.frame = int(meta["frame"])
    engine.bootstrapped = bool(meta["bootstrapped"])
    engine.kf_frames = list(meta["kf_frames"])
    engine.group_id = np.array(meta["group_id"], np.int32)
    engine._last_merge = int(meta["last_merge"])
    engine.merge_log = list(meta["merge_log"])
    engine.group_hist = [tuple(g) for g in meta.get("group_hist", [])]
    sp = meta.get("split_pending")
    engine._split_pending = tuple(sp) if sp is not None else None
    engine._pose_host_cache = None
    engine._kf_pose_host = None
    engine._kf_inliers = d.pop("kf_inliers")
    pyr_keys = sorted(k for k in d if k.startswith("pyr.imgs."))
    if pyr_keys:
        from coslam_tpu.ops.pyramid import Pyramid
        n_lvl = len(pyr_keys)
        # derivatives: level 0 only (older checkpoints stored all levels;
        # the extras are dropped so the pytree structure matches what
        # build_pyramid now produces — a mismatch would break the scan
        # carry of the chunked engine)
        engine.pyr_prev = Pyramid(
            imgs=tuple(jnp.asarray(d.pop(f"pyr.imgs.{li}"))
                       for li in range(n_lvl)),
            dxs=(jnp.asarray(d.pop("pyr.dxs.0")),),
            dys=(jnp.asarray(d.pop("pyr.dys.0")),))
    C = engine.cfg.num_cameras
    engine.traj = [[] for _ in range(C)]
    engine.rel = [[] for _ in range(C)]
    for c in range(C):
        if f"traj_R.{c}" in d:
            Rs = d[f"traj_R.{c}"]
            ts = d[f"traj_t.{c}"]
            engine.traj[c] = [(Rs[i], ts[i]) for i in range(Rs.shape[0])]
        if f"rel_R.{c}" in d:
            Rs = d[f"rel_R.{c}"]
            ts = d[f"rel_t.{c}"]
            engine.rel[c] = [(Rs[i], ts[i]) for i in range(Rs.shape[0])]
    return engine
