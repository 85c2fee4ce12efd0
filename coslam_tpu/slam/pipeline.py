"""Host-side pipeline orchestrator.

Replaces the reference's CoSLAMThread master loop + CoSLAM orchestrator
(CoSLAMThread.cpp:44-147, SL_CoSLAM.cpp — SURVEY.md §3.3): the per-frame
hot path is a short sequence of jitted device calls over statically-shaped
state; only tiny scalar decisions (keyframe triggers, BA cadence, group
bookkeeping) run on host. The reference's async-BA thread + mutex
machinery (SURVEY.md §2.7) becomes a deterministic BA-at-keyframe call —
functionally pure, so the mutex/cancel machinery dissolves.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig
from coslam_tpu.geometry import camera as cam
from coslam_tpu.geometry import epipolar
from coslam_tpu.geometry.se3 import relative_pose
from coslam_tpu.ops import build_pyramid, detect_corners
from coslam_tpu.slam import steps
from coslam_tpu.slam.state import (
    SlamState, init_state, history_len, ST_ALIVE, ST_FREE, PT_STATIC)
from coslam_tpu.solvers.ba import bundle_adjust_table
from coslam_tpu.solvers.pose_graph import chain_graph, solve_rotations, \
    solve_translations


@jax.jit
def _pack_rt(R, t):
    """[..., 3, 3] + [..., 3] -> [..., 3, 4] (single-transfer pose pack)."""
    return jnp.concatenate([R, t[..., None]], axis=-1)


# cadence (frames) shared by camera grouping and merge checks: merges must
# run on the same frames that refresh group_id, or they act on stale groups
GROUPING_INTERVAL = 5


class CoSlamEngine:
    """One engine = N synchronized cameras (the CoSLAM object equivalent).

    Usage:
        eng = CoSlamEngine(cfg, K, kc)
        for f in range(F):
            stats = eng.process_frame(images[f])   # [C, H, W] f32
        Rs, ts = eng.trajectory(0)                 # corrected, per camera
    """

    def __init__(self, cfg: SlamConfig, K: np.ndarray, kc: np.ndarray,
                 profile: bool = False, log_features: bool = False,
                 use_fused: bool = True, async_ba: bool = False,
                 ba_device=None, overlap: bool = False, chunk: int = 1,
                 mesh=None):
        self.cfg = cfg
        self.profile = profile
        # mesh: a 1-axis ("cam") jax.sharding.Mesh for multi-chip runs —
        # the fused step runs its pixel-heavy stages one-camera-per-device
        # via shard_map (frame_step's explicit-SPMD path); small tables
        # stay replicated, so every host-side cadence function (keyframe
        # snapshots, BA, merge, intercam mapping) compiles unchanged under
        # GSPMD. The mesh axis size must equal num_cameras.
        self.mesh = mesh
        if mesh is not None:
            assert mesh.shape.get("cam") == cfg.num_cameras, \
                f"mesh 'cam' axis {mesh.shape} != num_cameras " \
                f"{cfg.num_cameras}"
        # async_ba: the reference runs windowed BA in a worker thread
        # concurrently with tracking (SURVEY.md §3.4). TPU equivalent:
        # dispatch the BA solve without blocking (jax async dispatch —
        # onto ``ba_device`` when a spare mesh device is given), keep
        # tracking, and apply the result a few frames later with
        # generation-guarded write-back; a group merge cancels the
        # in-flight result (the bCancelBA flag, SL_CoSLAM.cpp:1402,1719).
        # MEASURED default False: the synchronous path never blocks the
        # host either (solve + write-back are dispatches, no readback), so
        # on a single chip async only delays the correction (~1 keyframe
        # of extra drift) for zero wall-clock win; it pays off only with a
        # spare ``ba_device`` to run the solve off the tracking chip.
        self.async_ba = async_ba
        self.ba_device = ba_device
        self._pending_ba: Optional[dict] = None
        # overlap: pipeline the per-frame stats readback — frame f's stats
        # start copying to host asynchronously while frame f+1's fused
        # step computes, so the host cadence never waits a full tunnel
        # round trip. Cadence decisions then act on one-frame-old stats
        # (the reference's async threads have the same property).
        self.overlap = overlap
        self._pending_fs = None
        self._flushing = False   # inside _flush_overlap (kf frame stamps)
        # chunk > 1: steady-state tracking runs through frame_steps_chunk —
        # ``chunk`` frames per device call (lax.scan inside), host cadence
        # once per chunk on the packed per-frame stats rows, ONE
        # device->host round trip per chunk (the grouping/merge/loop
        # prefilter scan rides the same transfer). This is the reference's
        # single-loop pipeline (CoSLAMThread.cpp:95-129) restructured for a
        # high-latency host<->device link: cadence decisions lag the frame
        # stream by up to chunk-1 frames, within the async slack the
        # reference's BA/merge threads already tolerate. Bootstrap and
        # keyframe/BA/merge work still run frame-synchronous at chunk
        # boundaries.
        self.chunk = max(1, int(chunk))
        self._chunk_buf: list = []
        # chunk overlap (chunk > 1 AND overlap=True): chunk k's packed
        # stats are consumed while chunk k+1 computes on device, hiding
        # the stats round trip entirely. Cadence decisions then lag the
        # frame stream by up to 2*chunk-1 frames and are applied to the
        # NEWER state (the same stale-stats/fresh-state pattern as
        # per-frame overlap mode; the reference's async BA/merge threads
        # tolerate the same slack).
        self._chunk_pending = None   # (f0, n, flat device array)
        # one fused device call for the per-frame core (tracking, pose,
        # classification, mapping) instead of ~6 dispatches — significant
        # when host<->device round trips are expensive
        self.use_fused = use_fused
        self.log_features = log_features   # per-frame mapped-feature log
        self.feat_log: list[tuple] = []    # (frame, cam, ids, xy)
        self.timing: dict[str, float] = {}
        C = cfg.num_cameras
        assert C <= cfg.cap.max_cameras, \
            f"{C} cameras > cap.max_cameras={cfg.cap.max_cameras} " \
            "(SLAM_MAX_NUM, SL_Define.h:11)"
        assert K.shape == (C, 3, 3)
        self.K = jnp.asarray(K, jnp.float32)
        self.kc = jnp.asarray(kc, jnp.float32)
        self.state = init_state(cfg)
        self.pyr_prev = None
        self.frame = 0
        self.bootstrapped = False
        # host logs
        self.traj: list[list] = [[] for _ in range(C)]   # (R, t) per frame
        self.rel: list[list] = [[] for _ in range(C)]    # frame-to-frame rels
        self.kf_frames: list[int] = []
        self._kf_inliers = np.zeros(C)
        self.stats_log: list[dict] = []
        self.group_id = np.zeros(C, np.int32)
        self.dyn_log: list[tuple] = []   # (frame, ids, xyz) dynamic snapshots
        self._last_merge = 0
        self._last_merge_try = -(10 ** 9)
        self._merge_backoff = 0   # grows on failed bridge attempts
        self._merge_was_possible = False
        self._last_intercam = -10**9
        self._last_grouping = -10**9   # interval-based cadences: these
        self._last_register = -10**9   # advance in chunk mode too, where
        self._last_fuse = 0            # frame-modulo checks would skip
        # post-merge/loop settle window with widened pose gates (the
        # reference's largeErr frames, SL_CoSLAM.cpp:371-374,407)
        self._large_err_until = 0
        self._split_pending = None   # grouping-split hysteresis (see below)
        self.group_hist: list[tuple] = []   # per-frame group ids (for f_sep)
        self.merge_log: list[dict] = []
        self._kf_pose_host = None   # (R, t) of the last keyframe, np
        self._pose_host_cache = None
        self.loop_log: list[dict] = []   # committed loop closures
        self._last_closure = 0
        self._last_loop_attempt = -10**9
        self._loop_backoff = GROUPING_INTERVAL
        self._scan_frame = -1            # device candidate-scan cache
        self._scan_cache = None
        self._pose_prefetch = None       # async-copied packed poses (set
        self._kf_prefetch = None         # after BA; consumed by _pose_host)

    # ------------------------------------------------------------------
    @property
    def img_hw(self):
        return (self.cfg.image_height, self.cfg.image_width)

    def _tick(self, name: str, t0: float) -> float:
        """Per-stage wall-clock accumulation (the reference's m_tm* fields,
        SL_CoSLAM.h:98-108). With profile=True the device is synced first
        so the numbers are honest execution times, not dispatch times."""
        import time
        if self.profile:
            _ = np.asarray(self.state.frame)
        t1 = time.perf_counter()
        self.timing[name] = self.timing.get(name, 0.0) + (t1 - t0)
        return t1

    def resume_reference_frame(self, images: np.ndarray):
        """After load_checkpoint: rebuild the tracker's reference pyramid
        from the last processed frame's images."""
        self.pyr_prev = build_pyramid(jnp.asarray(images, jnp.float32),
                                      self.cfg.klt.n_levels)

    def process_frame(self, images: np.ndarray) -> dict:
        import time
        cfg = self.cfg
        if self.chunk > 1 and self.bootstrapped and self.use_fused \
                and self.frame > 0:
            # keep device-resident inputs on device (a host pull here
            # would defeat resident-frame feeding); host arrays stack on
            # host and upload once per chunk
            self._chunk_buf.append(images)
            if len(self._chunk_buf) < self.chunk:
                return {"frame": self.frame + len(self._chunk_buf) - 1,
                        "buffered": True}
            return self._process_chunk()
        t0 = time.perf_counter()
        self._pose_host_cache = None   # state.R/t will change this frame
        self._pose_prefetch = None
        self._kf_prefetch = None
        # keep uint8 input as uint8 for the transfer (4x less tunnel
        # bandwidth); the fused step casts on device
        imgs = jnp.asarray(images)
        if imgs.dtype not in (jnp.float32, jnp.uint8, jnp.float16):
            imgs = jnp.asarray(images, jnp.float32)
        t0 = self._tick("upload", t0)
        if self.bootstrapped and self.use_fused and self.frame > 0:
            from coslam_tpu.slam.fused import frame_step_packed
            self.state, pyr, fsv = frame_step_packed(
                self.state, self.pyr_prev, imgs, self.K, self.kc, cfg,
                mesh=self.mesh,
                large_err=self.frame < self._large_err_until)
            t0 = self._tick("core_fused", t0)
            stats = {"frame": self.frame}
            log_entry = True
            if self.overlap:
                # the packed stats vector (one fresh buffer — safe across
                # donations) starts copying to host now and is consumed
                # NEXT frame, so the cadence never waits a round trip
                fsv.copy_to_host_async()
                t0 = self._tick("copy_async", t0)
                prev = self._pending_fs
                self._pending_fs = (self.frame, fsv)
                if prev is not None:
                    pframe, pv = prev
                    # the consumed stats originate one frame back — stamp
                    # them with THEIR frame (cadence decisions still act
                    # on the current state, one-frame-stale like the
                    # reference's async threads)
                    stats["frame"] = pframe
                    stats.update(self._host_cadence(pyr, pv, frame=pframe))
                    t0 = self._tick("cadence_total", t0)
                    self._record_pose()
                    t0 = self._tick("record_pose", t0)
                else:
                    # transition frame: the real stats for this frame are
                    # consumed (and logged) next iteration — logging the
                    # placeholder too would duplicate the frame key
                    log_entry = False
            else:
                stats.update(self._host_cadence(pyr, fsv))
                self._record_pose()
            if self.log_features:
                self._log_features()
            self.pyr_prev = pyr
            self.group_hist.append(tuple(self.group_id.tolist()))
            self.frame += 1
            stats.setdefault("n_inliers", np.zeros(cfg.num_cameras))
            if log_entry:
                self.stats_log.append(stats)
            return stats
        if imgs.dtype != jnp.float32:
            imgs = imgs.astype(jnp.float32)
        pyr = build_pyramid(imgs, cfg.klt.n_levels)
        t0 = self._tick("pyramid", t0)
        stats = {"frame": self.frame}
        if self.frame == 0:
            self._first_frame(pyr)
            if cfg.num_cameras > 1:
                stats["bootstrap"] = self._bootstrap_multicam(pyr)
        else:
            import time as _time
            _tt = _time.perf_counter()
            self.state = self.state._replace(
                tracks=steps.advance_tracks(
                    self.pyr_prev, pyr, self.state.tracks, self.K, self.kc,
                    self.state.frame + 1, cfg),
                frame=self.state.frame + 1)
            self._tick("tracking", _tt)
            if not self.bootstrapped:
                _tt = _time.perf_counter()
                if cfg.num_cameras > 1:
                    stats["bootstrap"] = self._bootstrap_multicam(pyr)
                elif self.frame >= cfg.p.init_frames:
                    stats["bootstrap"] = self._bootstrap(pyr)
                self._tick("bootstrap", _tt)
            else:
                stats.update(self._tracked_frame(pyr))
        self._record_pose()
        if self.log_features and self.bootstrapped:
            self._log_features()
        self.pyr_prev = pyr
        self.group_hist.append(tuple(self.group_id.tolist()))
        self.frame += 1
        stats.setdefault("n_inliers", np.zeros(cfg.num_cameras))
        self.stats_log.append(stats)
        return stats

    # ------------------------------------------------------------------
    def _process_chunk(self) -> dict:
        """Drain the frame buffer through ONE frame_steps_chunk call and
        run the host cadence once at the boundary. Per-frame poses and
        dynamic snapshots come from the packed stats rows, so the whole
        chunk costs a single device round trip."""
        import time
        from coslam_tpu.slam.fused import frame_steps_chunk, unpack_stats
        cfg = self.cfg
        C = cfg.num_cameras
        t0 = time.perf_counter()
        buf = self._chunk_buf
        self._chunk_buf = []
        n = len(buf)
        self._pose_host_cache = None
        self._pose_prefetch = None
        self._kf_prefetch = None
        if any(isinstance(f, jnp.ndarray) for f in buf):
            imgs = jnp.stack([jnp.asarray(f) for f in buf])
        else:
            imgs = jnp.asarray(np.stack(buf))
        if imgs.dtype not in (jnp.float32, jnp.uint8, jnp.float16):
            imgs = imgs.astype(jnp.float32)
        t0 = self._tick("upload", t0)
        self.state, pyr, flat = frame_steps_chunk(
            self.state, self.pyr_prev, imgs, self.K, self.kc, cfg,
            mesh=self.mesh,
            large_err=self.frame < self._large_err_until)
        self.pyr_prev = pyr
        t0 = self._tick("core_chunk", t0)
        if self.overlap:
            # overlap: start this chunk's stats copying to host and
            # consume the PREVIOUS chunk's (whose copy has been riding
            # behind this chunk's compute). The first chunk has nothing
            # pending yet.
            flat.copy_to_host_async()
            pending = self._chunk_pending
            self._chunk_pending = (self.frame, n, flat)
            self.frame += n
            t0 = self._tick("copy_async", t0)
            if pending is None:
                return {"frame": self.frame - 1, "buffered": True}
            out = self._consume_chunk_stats(*pending)
            t0 = self._tick("cadence_total", t0)
            return out
        flat = np.asarray(flat)                    # the ONE round trip
        t0 = self._tick("stats_wait", t0)
        return self._ingest_chunk_rows(self.frame, n, flat, t0=t0)

    def _consume_chunk_stats(self, f0, n, flat) -> dict:
        """Overlap-mode deferred ingestion: logs + cadence for an already
        device-advanced chunk. self.frame stays at the stream head; the
        cadence bookkeeping runs with the pending chunk's numbering (the
        cadence ACTIONS — keyframe snapshot, BA, merge — apply to the
        current, newer device state)."""
        saved = self.frame
        self.frame = f0
        try:
            return self._ingest_chunk_rows(f0, n, np.asarray(flat))
        finally:
            self.frame = saved

    def _ingest_chunk_rows(self, f0, n, flat, t0=None) -> dict:
        import time
        from coslam_tpu.slam.fused import unpack_stats
        cfg = self.cfg
        C = cfg.num_cameras
        pyr = self.pyr_prev
        if t0 is None:
            t0 = time.perf_counter()
        scan_len = C * (3 * C + 2)
        rows = flat[:len(flat) - scan_len].reshape(n, -1)
        scan = flat[len(flat) - scan_len:].reshape(C, 3 * C + 2)
        D = self.state.kfs.dyn_xyz.shape[1]
        fs_last = None
        for i in range(n):
            fs = unpack_stats(rows[i], C, D)
            fs_last = fs
            self._pose_host_cache = (fs.R.copy(), fs.t.copy())
            self._record_pose()
            # last row's snapshot is appended by _shared_cadence below
            if C > 1 and i < n - 1 and int(fs.n_dynamic) > 0:
                ids = np.asarray(fs.dyn_ids)
                sel = ids >= 0
                if sel.any():
                    self.dyn_log.append((f0 + i, ids[sel],
                                         np.asarray(fs.dyn_xyz)[sel]))
            entry = {"frame": f0 + i,
                     "n_inliers": fs.n_inliers,
                     "coverage": fs.coverage,
                     "med_err": fs.med_err,
                     "med_depth": fs.med_depth,
                     "n_new_points": int(fs.n_new_points)}
            if C > 1:
                entry["n_static"] = int(fs.n_static)
                entry["n_dynamic"] = int(fs.n_dynamic)
            self.stats_log.append(entry)
            self.group_hist.append(tuple(self.group_id.tolist()))
        # cadence at the boundary, on the LAST frame's stats; the packed
        # scan block pre-populates the _host_scan cache so grouping/merge/
        # loop checks need no extra transfer
        self.frame = f0 + n - 1
        self._poll_ba()
        self._scan_cache = (scan[:, :C], scan[:, C:2 * C],
                            scan[:, 2 * C:3 * C], scan[:, 3 * C],
                            scan[:, 3 * C + 1])
        self._scan_frame = self.frame
        dyn = None
        if C > 1 and int(fs_last.n_dynamic) > 0:
            dyn = (np.asarray(fs_last.dyn_ids), np.asarray(fs_last.dyn_xyz))
        cstats = self._shared_cadence(
            pyr, fs_last, n_mapped=np.asarray(fs_last.n_mapped),
            n_new=int(fs_last.n_new_points), dyn=dyn,
            n_static=int(fs_last.n_static),
            n_dynamic=int(fs_last.n_dynamic), frame=self.frame)
        self.stats_log[-1].update(cstats)
        if self.log_features:
            self._log_features()
        self.frame = f0 + n
        t0 = self._tick("cadence_total", t0)
        return self.stats_log[-1]

    def _flush_chunk(self):
        """Drain the overlap-pending chunk stats, then process any
        buffered-but-unprocessed frames through the single-frame path (a
        partial chunk would recompile the scan)."""
        if self._chunk_pending is not None:
            pending, self._chunk_pending = self._chunk_pending, None
            self._consume_chunk_stats(*pending)
        if not self._chunk_buf:
            return
        buf, self._chunk_buf = self._chunk_buf, []
        saved = self.chunk
        self.chunk = 1
        try:
            for f in buf:
                self.process_frame(f)
        finally:
            self.chunk = saved

    # ------------------------------------------------------------------
    def _first_frame(self, pyr):
        cfg = self.cfg
        N = cfg.cap.max_features
        det = detect_corners(pyr.imgs[0], pyr.dxs[0], pyr.dys[0], cfg.klt, N)
        # seed_tracks expects undistorted px; detector output is raw px
        pos_ud = cam.undistort_points(det.pos, self.K[:, None],
                                      self.kc[:, None])
        tracks = steps.seed_tracks(
            self.state.tracks, pos_ud, det.valid,
            jnp.full(det.valid.shape, -1, jnp.int32), self.K, self.kc,
            jnp.zeros((), jnp.int32))
        self.state = self.state._replace(tracks=tracks)

    # ------------------------------------------------------------------
    def _bootstrap_multicam(self, pyr) -> bool:
        """Wide-baseline bootstrap between cameras at (or near) frame 0
        (initMapMultiCam, SL_CoSLAM.cpp:221-298)."""
        from coslam_tpu.slam.initmap import init_map_multicam
        cfg = self.cfg
        st = self.state
        res = init_map_multicam(cfg, np.asarray(self.K), np.asarray(self.kc),
                                pyr, st.tracks.pos, np.asarray(st.tracks.valid))
        if not res.ok:
            return False
        C, N = st.tracks.valid.shape
        P = st.mappts.xyz.shape[0]
        M = res.X.shape[0]
        mappts = st.mappts._replace(
            xyz=st.mappts.xyz.at[:M].set(jnp.asarray(res.X)),
            cov=st.mappts.cov.at[:M].set(jnp.asarray(res.cov)),
            status=st.mappts.status.at[:M].set(ST_ALIVE),
            ptype=st.mappts.ptype.at[:M].set(PT_STATIC),
            first_frame=st.mappts.first_frame.at[:M].set(st.frame),
            last_obs=st.mappts.last_obs.at[:M].set(st.frame))
        mpt = np.full((C, N), -1, np.int32)
        for c in range(C):
            has = res.obs_slot[:, c] >= 0
            mpt[c, res.obs_slot[has, c]] = np.nonzero(has)[0]
        # reset the track history: when bootstrap succeeds after retries,
        # pre-bootstrap ring entries pair with uninitialized pose-ring
        # slots and would poison history-based triangulation/voting
        tracks = steps.seed_tracks(st.tracks, st.tracks.pos,
                                   st.tracks.valid, jnp.asarray(mpt),
                                   self.K, self.kc, st.frame)
        state = st._replace(
            tracks=tracks, mappts=mappts,
            R=jnp.asarray(res.Rs), t=jnp.asarray(res.ts))
        state = steps.push_pose_history(state)
        state = state._replace(kfs=steps.add_keyframe(state))
        self.state = state
        self.bootstrapped = True
        self.kf_frames = [self.frame]
        self._kf_inliers = np.full(C, float(M))
        return True

    # ------------------------------------------------------------------
    def _bootstrap(self, pyr) -> bool:
        """Monocular two-frame bootstrap (initMapSingleCam equivalent,
        SL_CoSLAM.cpp:140-219): E-matrix between frame 0 and now,
        triangulate, anchor scale at cfg.p.bootstrap_depth median depth.
        Multi-camera bootstrap lives in slam/initmap.py."""
        cfg = self.cfg
        st = self.state
        T = history_len(cfg)
        ring0 = 0  # frame 0 ring slot
        x0 = st.tracks.hist[:, ring0]            # [C, N, 2] undistorted px
        ok0 = st.tracks.hist_valid[:, ring0] & st.tracks.valid
        c = 0  # monocular: camera 0 (multi-cam handled elsewhere)
        xn0 = cam.pixel_to_normalized(x0[c], self.K[c])
        xn1 = cam.pixel_to_normalized(st.tracks.pos[c], self.K[c])
        thresh = (1.5 / float(self.K[c, 0, 0])) ** 2
        res = epipolar.ransac_essential(
            jax.random.PRNGKey(self.frame), xn0, xn1, ok0[c],
            num_hypotheses=512, thresh=thresh)
        if int(res.num_inliers) < 30:
            return False
        R1, t1, X, good = epipolar.recover_pose_from_essential(
            res.F, xn0, xn1, res.inliers)
        if int(jnp.sum(good)) < 30:
            return False
        # scale anchor
        med_z = float(jnp.nanmedian(jnp.where(good, X[:, 2], jnp.nan)))
        if not np.isfinite(med_z) or med_z <= 0:
            return False
        s = cfg.p.bootstrap_depth / med_z
        X = X * s
        t1 = t1 * s
        # proper first-order covariance of the bootstrap triangulation
        from coslam_tpu.geometry.triangulate import triangulation_cov
        n = X.shape[0]
        Ks2 = jnp.broadcast_to(self.K[c][None, None], (n, 2, 3, 3))
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32)[None], (n, 3, 3))
        Rs2 = jnp.stack([eye, jnp.broadcast_to(R1[None], (n, 3, 3))], axis=1)
        ts2 = jnp.stack([jnp.zeros((n, 3), jnp.float32),
                         jnp.broadcast_to(t1[None], (n, 3))], axis=1)
        covX = triangulation_cov(Ks2, Rs2, ts2, X, jnp.ones((n, 2), bool),
                                 pixel_var=cfg.p.pixel_err_var)
        self.state = self._bootstrap_commit(st, jnp.asarray(R1),
                                            jnp.asarray(t1), X, good, x0, covX)
        self.bootstrapped = True
        self.kf_frames = [0, self.frame]
        return True

    def _bootstrap_commit(self, st: SlamState, R1, t1, X, good, x0, covX):
        """Write bootstrap results into state (device). Camera 0 only."""
        cfg = self.cfg
        C, N = st.tracks.valid.shape
        P = st.mappts.xyz.shape[0]
        # allocate the first sum(good) map slots to the good tracks of cam 0
        rank = jnp.cumsum(good) - 1
        slot = jnp.where(good, rank, P)
        mpt_c0 = jnp.where(good, slot, -1).astype(jnp.int32)
        mappts = st.mappts
        mappts = mappts._replace(
            xyz=mappts.xyz.at[slot].set(X, mode="drop"),
            cov=mappts.cov.at[slot].set(covX, mode="drop"),
            status=mappts.status.at[slot].set(ST_ALIVE, mode="drop"),
            ptype=mappts.ptype.at[slot].set(PT_STATIC, mode="drop"),
            first_frame=mappts.first_frame.at[slot].set(0, mode="drop"),
            last_obs=mappts.last_obs.at[slot].set(st.frame, mode="drop"))
        mpt = jnp.full((C, N), -1, jnp.int32).at[0].set(mpt_c0)
        tracks = steps.seed_tracks(st.tracks, st.tracks.pos, st.tracks.valid,
                                   mpt, self.K, self.kc, st.frame)
        R = st.R.at[0].set(R1)
        t = st.t.at[0].set(t1)
        state = st._replace(tracks=tracks, mappts=mappts, R=R, t=t)
        state = steps.push_pose_history(state)
        # keyframe 0 (identity pose, frame-0 observations) + current keyframe
        kfs = state.kfs
        kfs = kfs._replace(
            frame=kfs.frame.at[0].set(0),
            obs_pos=kfs.obs_pos.at[0, 0].set(x0[0]),
            obs_mpt=kfs.obs_mpt.at[0, 0].set(mpt_c0),
            n=kfs.n + 1)
        state = state._replace(kfs=kfs)
        kfs = steps.add_keyframe(state)
        state = state._replace(kfs=kfs)
        self._kf_inliers = np.full(C, float(jnp.sum(good)))
        return state

    def _log_features(self):
        tr = self.state.tracks
        pos = np.asarray(tr.pos)
        mpt = np.asarray(tr.mpt)
        ok = np.asarray(tr.valid) & (mpt >= 0)
        for c in range(self.cfg.num_cameras):
            sel = np.nonzero(ok[c])[0]
            self.feat_log.append((self.frame, c, mpt[c, sel], pos[c, sel]))

    # ------------------------------------------------------------------
    def _host_cadence(self, pyr, fs, frame: Optional[int] = None) -> dict:
        """Fused-path cadence: ONE host transfer for all per-frame scalars
        (each readback is a separate device round trip over the TPU
        tunnel) — the post-step poses and dynamic snapshot ride along in
        the packed vector — then the shared cadence. ``frame`` stamps the
        log entries (one frame back in overlap mode)."""
        import time as _time
        _t0 = _time.perf_counter()
        self._poll_ba()
        _t0 = self._tick("poll_ba", _t0)
        from coslam_tpu.slam.fused import unpack_stats
        fs = unpack_stats(np.asarray(fs), self.cfg.num_cameras,
                          self.state.kfs.dyn_xyz.shape[1])
        _t0 = self._tick("stats_wait", _t0)
        self._pose_host_cache = (fs.R.copy(), fs.t.copy())
        dyn = None
        if int(fs.n_dynamic) > 0:
            # snapshot rides the stats transfer (no extra pulls)
            dyn = (np.asarray(fs.dyn_ids), np.asarray(fs.dyn_xyz))
        return self._shared_cadence(
            pyr, fs, n_mapped=np.asarray(fs.n_mapped),
            n_new=int(fs.n_new_points), dyn=dyn,
            n_static=int(fs.n_static), n_dynamic=int(fs.n_dynamic),
            frame=self.frame if frame is None else frame)

    # ------------------------------------------------------------------
    def _tracked_frame(self, pyr) -> dict:
        """Non-fused path (use_fused=False fallback / debugging): the same
        stages as the fused step as individual dispatches, then the shared
        cadence."""
        import time
        cfg = self.cfg
        C = cfg.num_cameras
        t0 = time.perf_counter()
        self._poll_ba()
        out = steps.pose_update(self.state, self.K, self.kc, self.img_hw,
                                cfg,
                                large_err=self.frame < self._large_err_until)
        self.state = self.state._replace(
            R=out.R, t=out.t, tracks=out.tracks, mappts=out.mappts)
        self.state = steps.push_pose_history(self.state)
        t0 = self._tick("pose_update", t0)
        n_static = n_dynamic = 0
        if C > 1:
            from coslam_tpu.slam.classify import (detect_dynamic_features,
                                                  classify_map_points)
            self.state = detect_dynamic_features(self.state, self.K, cfg)
            cls = classify_map_points(self.state, self.K, cfg)
            self.state = self.state._replace(mappts=cls.mappts,
                                             tracks=cls.tracks)
            n_static, n_dynamic = int(cls.n_static), int(cls.n_dynamic)
        t0 = self._tick("classify", t0)
        mappts, tracks, n_new = steps.new_map_points(
            self.state, pyr, self.K, self.kc, cfg)
        self.state = self.state._replace(mappts=mappts, tracks=tracks)
        t0 = self._tick("new_map_points", t0)
        n_mapped = np.asarray(jnp.sum(
            self.state.tracks.valid & (self.state.tracks.mpt >= 0), axis=1))
        stats = self._shared_cadence(pyr, out, n_mapped=n_mapped,
                                     n_new=int(n_new), dyn=None,
                                     n_static=n_static,
                                     n_dynamic=n_dynamic, frame=self.frame)
        self.state = self.state._replace(
            mappts=steps.lifecycle_update(self.state.mappts,
                                          self.state.frame, cfg))
        return stats

    # ------------------------------------------------------------------
    def _shared_cadence(self, pyr, out, n_mapped: np.ndarray, n_new: int,
                        dyn, n_static: int, n_dynamic: int,
                        frame: int) -> dict:
        """Host-decided per-frame work shared by the fused and non-fused
        paths: joint-pose fallback, dynamic snapshots, grouping/merge,
        loop closure, inter-camera mapping and registration, keyframes +
        BA, duplicate unification.

        ``out`` provides n_inliers/coverage/med_err/med_depth (a
        FrameStats or a pose_update output). ``dyn`` is an optional
        (ids, xyz) snapshot that rode the stats transfer; None pulls it
        from the device when n_dynamic > 0. ``frame`` stamps log entries
        (it lags self.frame by one in overlap mode)."""
        import time
        cfg = self.cfg
        C = cfg.num_cameras
        p = cfg.p
        t0 = time.perf_counter()
        n_inl = np.asarray(out.n_inliers)
        cover = np.asarray(out.coverage)
        joint = False
        if C > 1:
            # tracking-failure detection -> joint multi-camera robust pose
            # (interCamPoseUpdate, SL_CoSLAM.cpp:308-365). A camera with
            # ZERO static inliers (e.g. a mover filling its view) is the
            # headline case: it rides the joint solve through same-frame
            # dynamic points shared with the other cameras — the paper's
            # collaboration mechanism. Only the group's TOTAL static
            # support must hold the frame; an entirely unconstrained
            # camera just keeps its prior pose under the damped solve.
            weak = (n_inl < p.min_static_for_ok) | (cover < p.min_static_cover)
            if weak.any() and n_inl.sum() >= p.min_static_for_ok:
                from coslam_tpu.slam.intercam import joint_pose_update
                R, t = joint_pose_update(self.state, self.K, cfg)
                self.state = steps.push_pose_history(
                    self.state._replace(R=R, t=t))
                self._pose_host_cache = None
                self._pose_prefetch = None
                joint = True
            if n_dynamic > 0:
                if dyn is not None:
                    ids, xyz = dyn
                    sel = ids >= 0
                    if sel.any():
                        self.dyn_log.append((frame, ids[sel], xyz[sel]))
                else:
                    self._store_dynamic_snapshot(frame)
            # post-merge settle window: suppress re-grouping while shared
            # observations re-form (the reference's post-merge suppression,
            # SL_CoSLAM.cpp:1317-1320). Interval-based (not frame-modulo)
            # so chunked processing — where cadence runs once per chunk —
            # keeps the same rhythm.
            settled = not self.merge_log or \
                self.frame - self.merge_log[-1]["frame"] > 12
            grouping_due = self.frame - self._last_grouping >= \
                GROUPING_INTERVAL
            if grouping_due:
                self._last_grouping = self.frame
            if grouping_due and settled:
                self._update_grouping()
            t0 = self._tick("cad_grouping", t0)
            # group merge (SL_CoSLAM::mergeCamGroups, SURVEY.md §3.5) —
            # tied to the grouping refresh so merges never act on stale
            # group ids
            if (len(np.unique(self.group_id)) > 1 and grouping_due
                    and self.frame - self._last_merge
                    >= p.merge_min_interval):
                # cheap prefilter every tick (reads the packed device scan
                # already cached for grouping — no extra transfer): no
                # predicted overlap -> no bridge attempt, and the moment
                # overlap RE-forms the failed-attempt backoff resets so
                # the re-merge fires on the first possible tick
                possible = self._merge_possible()
                if possible and not self._merge_was_possible:
                    self._merge_backoff = 0
                self._merge_was_possible = possible
                if possible and (self.frame - self._last_merge_try
                                 >= self._merge_backoff):
                    n_groups = len(np.unique(self.group_id))
                    self._last_merge_try = self.frame
                    self._try_merge(pyr)
                    # failed-attempt backoff: a bridge attempt costs real
                    # time (NCC search + PnP + several device round trips
                    # — measured ~48% of a 500-frame production run when
                    # retried every grouping tick through a long split).
                    # The cap stays TIGHT (one skipped grouping tick): a
                    # camera group drifting alone diverges fast, and an
                    # aggressive 8x backoff measurably let a split rig
                    # fragment before the bridge got its retry (the cost
                    # being RTT-bound on a tunneled device, halving the
                    # attempt rate is the whole win on co-located hosts).
                    if len(np.unique(self.group_id)) < n_groups:
                        self._merge_backoff = 0   # unified (merge or noop)
                    else:
                        self._merge_backoff = 2 * GROUPING_INTERVAL
            t0 = self._tick("cad_merge", t0)
        else:
            grouping_due = self.frame - self._last_grouping >= \
                GROUPING_INTERVAL
            if grouping_due:
                self._last_grouping = self.frame
        if grouping_due:
            self._try_loop_closure(pyr)
        t0 = self._tick("cad_loop", t0)
        n_inter = self._intercam_cadence(pyr, n_mapped, n_inl)
        t0 = self._tick("cad_intercam", t0)
        stats = {
            "n_inliers": n_inl,
            "coverage": cover,
            "med_err": np.asarray(out.med_err),
            "med_depth": np.asarray(out.med_depth),
            "n_new_points": n_new,
            "n_intercam_points": n_inter,
            "joint_pose": joint,
        }
        if C > 1:
            stats["n_static"] = n_static
            stats["n_dynamic"] = n_dynamic
        kf_ready = self._keyframe_ready(out)
        t0 = self._tick("cad_kfready", t0)
        if kf_ready:
            # a new keyframe must snapshot BA-consistent poses: flush any
            # in-flight BA first (the reference skips requestForBA while
            # the worker is busy, SL_CoSLAM.cpp:1737-1757)
            self._apply_pending_ba()
            self.state = self.state._replace(kfs=steps.add_keyframe(self.state))
            # stamp with the device-side frame: during _flush_overlap
            # self.frame is already one past the last processed frame
            self.kf_frames.append(self.frame - 1 if self._flushing
                                  else self.frame)
            self._kf_inliers = n_inl.copy()
            self._kf_pose_host = self._pose_host()
            t0 = self._tick("cad_addkf", t0)
            if (len(self.kf_frames) % cfg.p.ba_cadence) == 0:
                self._run_ba()
                # if the solve already finished (small problems, fast
                # chip), apply it this frame — async costs nothing in
                # accuracy when the result beats the next frame anyway
                self._poll_ba()
                t0 = self._tick("ba", t0)
            stats["keyframe"] = True
        # periodic duplicate unification (currentMapPointsRegister merges
        # every 50th frame, SL_CoSLAM.cpp:834-852)
        if self.frame - self._last_fuse >= 50:
            self._last_fuse = self.frame
            from coslam_tpu.slam.merge import fuse_close_points
            self.state, n_fused = fuse_close_points(self.state, cfg)
            if n_fused:
                stats["n_fused"] = n_fused
        return stats

    def _intercam_cadence(self, pyr, n_mapped: np.ndarray,
                          n_inl: np.ndarray) -> int:
        """Multi-view inter-camera mapping + registration.

        Mapping is budget-triggered, not blind-cadence: it runs when the
        in-view mapped-feature budget drops under ``n_max_map_pts`` (at
        most every ``intercam_map_interval`` frames) or on an
        inlier-count decrease — the reference's genNewMapPointsInterCam
        trigger (SL_CoSLAM.cpp:1507-1539). Registration (re-acquiring
        dormant points) keeps its own fixed cadence."""
        cfg = self.cfg
        p = cfg.p
        C = cfg.num_cameras
        if C <= 1:
            return 0
        from coslam_tpu.slam.grouping import group_camera_tuples
        from coslam_tpu.slam.intercam import (intercam_map_group,
                                              register_map_points)
        n_inter = 0
        since = self.frame - self._last_intercam
        budget_low = int(n_mapped.sum()) < p.n_max_map_pts
        decrease = bool(np.any(n_inl < 0.8 * np.maximum(self._kf_inliers,
                                                        1)))
        # the decrease trigger gets its own minimum spacing: a camera with
        # persistently low inliers (long occlusion, textureless view) must
        # not fire the group-wide mapping pass every frame
        decrease = decrease and since >= max(1, p.intercam_map_interval // 2)
        import time as _time
        _t0 = _time.perf_counter()
        if (since >= p.intercam_map_interval and budget_low) or decrease:
            for cams in group_camera_tuples(self.group_id):
                mp, tr, nn = intercam_map_group(self.state, pyr, self.K,
                                                self.kc, cams, cfg)
                self.state = self.state._replace(mappts=mp, tracks=tr)
                n_inter += int(nn)
            self._last_intercam = self.frame
        _t0 = self._tick("cad_icmap", _t0)
        if self.frame - self._last_register >= p.intercam_map_interval:
            self._last_register = self.frame
            self.state, _ = register_map_points(
                self.state, pyr, self.K, cfg, max_age=p.num_act_frames)
        self._tick("cad_register", _t0)
        return n_inter

    def _keyframe_ready(self, out) -> bool:
        cfg = self.cfg
        p = cfg.p
        if not self.kf_frames:
            return False
        if self.frame - self.kf_frames[-1] < p.keyframe_min_interval:
            return False
        n_inl = np.asarray(out.n_inliers)
        decrease = np.any(n_inl < 0.8 * np.maximum(self._kf_inliers, 1))
        # translation / view-angle change since last keyframe; the last
        # keyframe pose is cached on host at add time (pulling it from the
        # device ring costs two tunnel round trips per frame)
        if self._kf_pose_host is None:
            pf = self._kf_prefetch
            if pf is not None:
                Rt = np.asarray(pf)
                self._kf_prefetch = None
            else:
                kf_idx = (len(self.kf_frames) - 1) % \
                    self.state.kfs.frame.shape[0]
                Rt = np.asarray(jax.device_get(_pack_rt(
                    self.state.kfs.R[kf_idx], self.state.kfs.t[kf_idx])))
            self._kf_pose_host = (Rt[..., :3].copy(), Rt[..., 3].copy())
        R_kf, t_kf = self._kf_pose_host
        R_kf = np.asarray(R_kf)
        t_kf = np.asarray(t_kf)
        R_cur, t_cur = self._pose_host()
        c_kf = -np.einsum("cji,cj->ci", R_kf, t_kf)
        c_cur = -np.einsum("cji,cj->ci", R_cur, t_cur)
        depth = np.asarray(out.med_depth)
        depth = np.where(np.isfinite(depth) & (depth > 0), depth, 10.0)
        trans = np.linalg.norm(c_cur - c_kf, axis=-1) / depth
        tr = np.einsum("cij,cij->c", R_cur, R_kf)
        ang = np.degrees(np.arccos(np.clip((tr - 1) / 2, -1, 1)))
        return bool(decrease or np.any(trans > p.keyframe_trans_ratio)
                    or np.any(ang > p.keyframe_angle_deg))

    def _run_ba(self, sync: bool = False, window: Optional[int] = None):
        """``sync=True`` forces immediate write-back even in async mode —
        used by merge/loop-closure polish BAs, where the realigned state
        must not run unpolished while a deferred result is in flight (the
        reference cancels+reruns BA around merges for the same reason).
        ``window`` widens the keyframe window (merge-time joint BA)."""
        cfg = self.cfg
        if self._pending_ba is not None:     # never two BAs in flight
            self._apply_pending_ba()
        # dense-table fast path (scatter-free, lane-major; ~17x the list
        # solver's LM iterations/s at the production window shape)
        prob, ring, kf_ok = steps.build_ba_table(self.state, self.K, cfg,
                                                 window=window)
        if self.async_ba and not sync:
            solve_prob = prob
            if self.ba_device is not None:
                solve_prob = jax.device_put(prob, self.ba_device)
            res = bundle_adjust_table(solve_prob, max_err=cfg.p.max_err,
                                      max_iter=cfg.p.ba_max_iter,
                                      inner_iter=cfg.p.ba_inner_iter)
            self._pending_ba = {
                "res": res, "ring": ring, "kf_ok": kf_ok,
                # COPY: frame_step donates the state, so holding the live
                # gen array across frames would reference a deleted buffer
                "gen0": jnp.copy(self.state.mappts.gen),
                "frame": self.frame}
            return
        res = bundle_adjust_table(prob, max_err=cfg.p.max_err,
                                  max_iter=cfg.p.ba_max_iter,
                                  inner_iter=cfg.p.ba_inner_iter)
        self.state = steps.apply_ba_table_results(self.state, res, ring,
                                                  kf_ok, cfg)
        self._pose_host_cache = None
        self._kf_pose_host = None
        self._prefetch_poses()

    def _prefetch_poses(self):
        """Dispatch packed copies of the (BA-corrected) live pose and the
        newest keyframe pose and start their host copies: the consumers
        (_record_pose, _keyframe_ready) read them a moment later without
        blocking on a device round trip."""
        KF = self.state.kfs.frame.shape[0]
        kf_idx = ((len(self.kf_frames) - 1) % KF) if self.kf_frames else 0
        self._pose_prefetch = _pack_rt(self.state.R, self.state.t)
        self._kf_prefetch = _pack_rt(self.state.kfs.R[kf_idx],
                                     self.state.kfs.t[kf_idx])
        self._pose_prefetch.copy_to_host_async()
        self._kf_prefetch.copy_to_host_async()

    def _apply_pending_ba(self):
        """Deferred write-back of an in-flight BA result (async_ba)."""
        pb = self._pending_ba
        if pb is None:
            return
        self._pending_ba = None
        res = pb["res"]
        if self.ba_device is not None:
            dev0 = self.state.frame.devices().pop()
            res = jax.device_put(res, dev0)
        self.state = steps.apply_ba_table_results(
            self.state, res, pb["ring"], pb["kf_ok"],
            self.cfg, gen0=pb["gen0"])
        self._pose_host_cache = None
        self._kf_pose_host = None
        self._prefetch_poses()

    def _poll_ba(self, max_defer: int = 8):
        """Apply the in-flight BA once its result is ready (or after
        ``max_defer`` frames regardless — bounded staleness)."""
        pb = self._pending_ba
        if pb is None:
            return
        if pb["res"].cost.is_ready() or self.frame - pb["frame"] >= max_defer:
            self._apply_pending_ba()

    def _cancel_pending_ba(self):
        """bCancelBA: a merge rewrites poses, so an in-flight BA computed
        against pre-merge geometry must be dropped (SL_CoSLAM.cpp:1402)."""
        self._pending_ba = None

    def _host_scan(self):
        """Per-frame cached packed device reduction: grouping overlap,
        merge prefilter counts, loop prefilter counts — ONE transfer.
        Returns (shared [C,C], area [C,C], merge_counts [C,C],
        alive_per_owner [C], dormant_counts [C])."""
        if self._scan_frame == self.frame and self._scan_cache is not None:
            return self._scan_cache
        from coslam_tpu.slam.grouping import host_scan_device
        arr = np.asarray(jax.device_get(host_scan_device(
            self.state, self.K, self.cfg.image_height,
            self.cfg.image_width, self.cfg.p.loop_dormant_age)))
        C = self.cfg.num_cameras
        self._scan_cache = (arr[:, :C], arr[:, C:2 * C],
                            arr[:, 2 * C:3 * C], arr[:, 3 * C],
                            arr[:, 3 * C + 1])
        self._scan_frame = self.frame
        return self._scan_cache

    def _candidate_scan(self):
        sh, ar, mc, alive_own, dorm = self._host_scan()
        return mc, alive_own, dorm

    def _merge_possible(self) -> bool:
        """Superset test of checkPossibleMergable from the device scan."""
        mc, alive_own, _ = self._candidate_scan()
        p = self.cfg.p
        C = self.cfg.num_cameras
        for a in range(C):
            for g in np.unique(self.group_id):
                if g == self.group_id[a]:
                    continue
                cams_g = self.group_id == g
                cnt = float(mc[a, cams_g].sum())
                n_own = float(alive_own[cams_g].sum())
                if cnt >= p.merge_overlap_min or \
                        (n_own > 0 and cnt / n_own >= p.merge_overlap_ratio):
                    return True
        return False

    def _try_merge(self, pyr):
        from coslam_tpu.slam.merge import (merge_candidates, merge_groups,
                                           fuse_duplicate_points,
                                           MergeCandidate)
        from coslam_tpu.slam.state import ST_ALIVE, PT_STATIC
        cfg = self.cfg
        if not self._merge_possible():
            return
        cands = merge_candidates(self.state, cfg, np.asarray(self.K),
                                 self.group_id)
        if not cands:
            return
        cand = cands[0]
        # anchor the group with the more ESTABLISHED map: age-mass (sum of
        # point ages) — raw counts mislead because an exploring camera
        # mints many fresh points while the stable group holds the old map
        mp = self.state.mappts
        alive = (np.asarray(mp.status) == ST_ALIVE) & \
            (np.asarray(mp.ptype) == PT_STATIC)
        grp_owner = self.group_id[np.clip(np.asarray(mp.owner), 0,
                                          cfg.num_cameras - 1)]
        age = np.maximum(self.frame - np.asarray(mp.first_frame), 0)
        n_a = float((alive * age)[grp_owner == self.group_id[cand.cam_a]].sum())
        n_b = float((alive * age)[grp_owner == self.group_id[cand.cam_b]].sum())
        if n_b > n_a:
            cand = MergeCandidate(cam_a=cand.cam_b, cam_b=cand.cam_a,
                                  overlap=cand.overlap)
        cands = [cand]
        # last frame the two groups were still one (anchor for distributing
        # the realignment — searchFirstKeyFrameForMerge's role)
        f_sep = 0
        for f in range(len(self.group_hist) - 1, -1, -1):
            g = self.group_hist[f]
            if g[cand.cam_a] == g[cand.cam_b]:
                f_sep = f
                break
        # NOTE: an earlier round guarded short separations with a blind
        # time-based reunify (merge_min_sep_frames); it both undid REAL
        # splits (latching genuinely-separated groups together through
        # the settle window) and failed to protect long occlusions. The
        # no-op hypothesis check inside merge_groups replaces it with
        # evidence: identity-explains-bridge -> unify without realigning;
        # distinct views -> bridge match fails -> stay split.
        res = merge_groups(self.state, cfg, pyr, self.K, self.kc,
                           self.group_id, cands[0], f_sep=f_sep)
        if res.ok:
            # only COMMITTED merges start the merge_min_interval clock —
            # a failed bridge attempt (thin matches this frame) must not
            # block the retry at the next grouping tick; the reference
            # likewise spaces merges, not attempts (SL_CoSLAM.cpp:1375)
            self._last_merge = self.frame
        if res.ok and res.noop:
            # identity hypothesis won: the groups still share one
            # consistent map (split was an occlusion flap, not drift) —
            # unify + re-register, no realignment, no merge BA
            ga = self.group_id[cands[0].cam_a]
            gb = self.group_id[cands[0].cam_b]
            self.group_id = np.where(self.group_id == gb, ga,
                                     self.group_id)
            self.state = self.state._replace(
                group_id=jnp.asarray(self.group_id))
            from coslam_tpu.slam.intercam import register_map_points
            self.state, _ = register_map_points(
                self.state, pyr, self.K, cfg,
                max_age=cfg.p.num_act_frames, gate_scale=3.0)
            self.merge_log.append({
                "frame": self.frame, "cam_a": cands[0].cam_a,
                "cam_b": cands[0].cam_b, "scale": res.scale,
                "n_matches": res.n_matches, "scale_move": 1.0,
                "noop": True})
            # the reference BAs after every committed group merge
            # (mergeCamGroups -> requestForBA, SL_CoSLAM.cpp:1340-1346);
            # a no-op unify skips the REALIGNMENT, not the polish — the
            # wide window covering both chains' separation-era keyframes,
            # anchored by the just-re-registered shared observations,
            # absorbs the residual drift both groups accumulated apart.
            # Only for separations long enough to have accumulated any
            # (an occlusion flap of a few frames has nothing to polish,
            # and a wide window with near-zero cross observations can
            # only shake the chains)
            if self.frame - f_sep > 2 * cfg.p.keyframe_min_interval:
                self.state = self.state._replace(
                    kfs=steps.add_keyframe(self.state))
                self.kf_frames.append(self.frame)
                self._kf_pose_host = None
                self._run_ba(sync=True, window=cfg.p.merge_ba_window)
            return
        if res.ok:
            # bCancelBA: an in-flight BA solved against pre-merge geometry
            # must not write back over the realigned state
            self._cancel_pending_ba()
            # widened pose gates through the settle window (largeErr,
            # SL_CoSLAM.cpp:371-374,407): realigned poses shed inliers
            # under the normal Mahalanobis gates exactly when support is
            # scarcest
            self._large_err_until = self.frame + 12
            self.state = res.state
            # iterate the bridge (Gauss-Newton outer loop on the
            # alignment): a thin central match set leaves a bas-relief
            # ambiguity — the first PnP can verify at <10 px while still
            # ~5-10 deg off (yaw compensated by lateral shift). Re-running
            # the bridge from the realigned pose solves for the residual;
            # convergence is merge_groups' own no-op test reporting that
            # the current pose now explains the bridge.
            for _ in range(2):
                res_i = merge_groups(self.state, cfg, pyr, self.K,
                                     self.kc, self.group_id, cands[0],
                                     f_sep=f_sep)
                if not res_i.ok or res_i.noop:
                    break
                res = res_i._replace(scale=res.scale)
                self.state = res.state
            self.state = fuse_duplicate_points(self.state, cfg,
                                               self.group_id, cands[0])
            self.merge_log.append({
                "frame": self.frame, "cam_a": cands[0].cam_a,
                "cam_b": cands[0].cam_b, "scale": res.scale,
                "n_matches": res.n_matches,
                "scale_move": res.scale_move})
            # unify the group sets directly (mergeMatchedGroups): the
            # realigned groups ARE one group now; shared observations
            # re-form via registration over the next frames
            ga = self.group_id[cands[0].cam_a]
            gb = self.group_id[cands[0].cam_b]
            self.group_id = np.where(self.group_id == gb, ga, self.group_id)
            self.state = self.state._replace(
                group_id=jnp.asarray(self.group_id))
            # actively re-form cross-group observations right away with a
            # widened gate (the post-merge largeErr window,
            # SL_CoSLAM.cpp:371-374,407) so grouping sees shared points
            # before the settle window expires
            from coslam_tpu.slam.intercam import register_map_points
            self.state, _ = register_map_points(
                self.state, pyr, self.K, cfg,
                max_age=cfg.p.num_act_frames, gate_scale=3.0)
            # merge transformed poses AND keyframe-ring poses: both host
            # caches are stale now
            self._pose_host_cache = None
            self._kf_pose_host = None
            self._pose_prefetch = None
            self._kf_prefetch = None
            # joint BA over BOTH groups' recent keyframes (the reference's
            # genMergeInfoVer2 robust BA + recomputeMapPoints,
            # SL_MergeCameraGroup.cpp:557-725,1175-1183): the rigid
            # realignment leaves the moving group's drift accumulated
            # during separation; a WIDE window (merge_ba_window
            # keyframes, covering the separation era — not just the
            # last ba_window) lets mid-separation structure and both
            # chains absorb it, anchored by the fused bridge
            # observations at the merge keyframe
            self.state = self.state._replace(kfs=steps.add_keyframe(self.state))
            self.kf_frames.append(self.frame)
            self._kf_pose_host = None
            self._run_ba(sync=True, window=cfg.p.merge_ba_window)

    def _try_loop_closure(self, pyr):
        """Intra-group loop closure: when a camera's view re-covers its own
        dormant map (unseen > loop_dormant_age frames), re-acquire those
        points, PnP the drift-free pose, and distribute the correction over
        the drift window (slam/loop.py; the merge machinery pointed at the
        group's own past). The reference has no analogue — its realignment
        only fires between groups."""
        cfg = self.cfg
        p = cfg.p
        if self.frame - self._last_closure < p.loop_min_interval:
            return
        if self.frame - self._last_loop_attempt < self._loop_backoff:
            return
        if self.merge_log and self.frame - self.merge_log[-1]["frame"] <= 12:
            return   # settle window after a merge
        # device prefilter: enough dormant points in SOME view (superset
        # of the full hull-masked test — skips the host map pull)
        _, _, dorm_counts = self._candidate_scan()
        if dorm_counts.max(initial=0) < p.loop_overlap_min:
            # dormant coverage fell away: the next revisit retries fresh
            self._loop_backoff = GROUPING_INTERVAL
            return
        from coslam_tpu.slam.loop import find_loop_candidates, close_loop
        self._last_loop_attempt = self.frame
        cands = find_loop_candidates(self.state, cfg, np.asarray(self.K))
        if not cands:
            return
        res = close_loop(self.state, cfg, pyr, self.K, self.kc,
                         self.group_id, cands[0][0])
        if not res.ok:
            # failed-attempt backoff (same rationale as the merge bridge:
            # an attempt is NCC searches + several round trips; a dwell
            # where the closure keeps failing — thin matches, view still
            # oblique — must not pay it every grouping tick). Capped
            # small: a revisit dwell is tens of frames.
            self._loop_backoff = min(
                max(2 * GROUPING_INTERVAL, self._loop_backoff * 2),
                4 * GROUPING_INTERVAL)
            return
        self._loop_backoff = GROUPING_INTERVAL
        # poses were rewritten: drop any in-flight BA, refresh host caches
        self._cancel_pending_ba()
        self.state = res.state
        self._pose_host_cache = None
        self._kf_pose_host = None
        self._pose_prefetch = None
        self._kf_prefetch = None
        self._last_closure = self.frame
        self._large_err_until = self.frame + 12   # largeErr settle window
        self.loop_log.append({"frame": self.frame, "cam": res.cam,
                              "n_inliers": res.n_inliers,
                              "f_anchor": res.f_anchor,
                              "scale": res.scale})
        # polish the realigned window with a BA at a fresh keyframe (wide
        # window: the drift window of a loop spans many keyframes too)
        self.state = self.state._replace(kfs=steps.add_keyframe(self.state))
        self.kf_frames.append(self.frame)
        self._run_ba(sync=True, window=self.cfg.p.merge_ba_window)

    def _update_grouping(self):
        """Recompute camera groups with SPLIT hysteresis: a proposal that
        separates currently co-grouped cameras must persist for two
        consecutive grouping rounds before it is committed. Shared
        observations fluctuate around the threshold right after merges and
        occlusions; acting on one low reading triggers a split followed by
        an immediate weak-evidence re-merge, which is far more damaging
        than reacting one round later. Joins apply immediately (the
        cameras already share one map)."""
        from coslam_tpu.slam.grouping import camera_grouping
        shared, area, _, _, _ = self._host_scan()
        gid = camera_grouping(self.state, self.cfg, shared=shared,
                              area=area)
        cur = self.group_id
        C = self.cfg.num_cameras
        splits = any(cur[i] == cur[j] and gid[i] != gid[j]
                     for i in range(C) for j in range(i + 1, C))
        if splits:
            key = tuple(gid.tolist())
            if self._split_pending != key:
                self._split_pending = key
                return
        self._split_pending = None
        if splits:
            # a fresh split: merge attempts start from zero backoff
            self._merge_backoff = 0
            self._last_merge_try = -(10 ** 9)
        self.group_id = gid
        self.state = self.state._replace(group_id=jnp.asarray(gid))

    def _store_dynamic_snapshot(self, frame: Optional[int] = None):
        """Per-frame dynamic-point snapshot (storeDynamicPoints,
        SL_CoSLAM.cpp:1900-1911) — the dynamic trajectories output."""
        from coslam_tpu.slam.state import PT_DYNAMIC
        mp = self.state.mappts
        status, ptype, xyz = jax.device_get((mp.status, mp.ptype, mp.xyz))
        dyn = (np.asarray(status) == ST_ALIVE) & \
              (np.asarray(ptype) == PT_DYNAMIC)
        ids = np.nonzero(dyn)[0]
        if len(ids):
            self.dyn_log.append((self.frame if frame is None else frame,
                                 ids, np.asarray(xyz)[dyn]))

    def _flush_overlap(self):
        """Drain the pending overlapped stats: run the final frame's host
        cadence (keyframe/BA/merge checks, dynamic snapshot) and record
        its pose so the trajectory covers every processed frame."""
        if not self.overlap or self._pending_fs is None:
            return
        pframe, pv = self._pending_fs
        self._pending_fs = None
        stats = {"frame": pframe}
        self._flushing = True
        try:
            stats.update(self._host_cadence(self.pyr_prev, pv,
                                            frame=pframe))
        finally:
            self._flushing = False
        self._record_pose()
        self.stats_log.append(stats)

    def _pose_host(self):
        """Current (R, t) as numpy, fetched once per state change.

        Invalidation is explicit (``_pose_host_cache = None`` wherever
        state.R/t is rewritten) rather than frame-keyed: a frame-keyed
        cache is poisoned when an external caller reads the pose between
        frames — the next frame's bookkeeping would then see a stale
        pose, and downstream keyframe decisions are sensitive to it."""
        if self._pose_host_cache is None:
            # one packed [C, 3, 4] transfer instead of two round trips;
            # a BA write-back leaves an async-prefetched copy behind
            pf = self._pose_prefetch
            if pf is not None:
                Rt = np.asarray(pf)
                self._pose_prefetch = None
            else:
                Rt = np.asarray(jax.device_get(_pack_rt(self.state.R,
                                                        self.state.t)))
            self._pose_host_cache = (Rt[..., :3].copy(),
                                     Rt[..., 3].copy())
        return self._pose_host_cache

    # ------------------------------------------------------------------
    def _record_pose(self):
        R, t = self._pose_host()
        for c in range(self.cfg.num_cameras):
            if self.traj[c]:
                R_prev, t_prev = self.traj[c][-1]
                # tiny 3x3 host math — no device dispatch
                Rr = R[c] @ R_prev.T
                tr = t[c] - Rr @ t_prev
                self.rel[c].append((Rr, tr))
            self.traj[c].append((R[c].copy(), t[c].copy()))

    def trajectory(self, c: int = 0, correct: bool = True,
                   chain_scales: bool = False):
        """Return ([F,3,3], [F,3]) for camera c. With correct=True, non-key
        poses are re-aligned to the final (BA-corrected) keyframe poses via
        the chain pose graph (updateNonKeyCameraPoses equivalent). With
        chain_scales, each inter-keyframe segment additionally carries one
        unknown translation scale (the uncertainScale mechanism,
        SL_GlobalPoseEstimation.cpp:283-335): when a merge or loop closure
        rescaled the keyframe anchors, the raw relative translations of the
        drift window are still at the old scale — the per-segment scale
        lets the chain stretch to its anchors instead of distorting."""
        self._flush_chunk()
        self._flush_overlap()
        Rs = np.stack([p[0] for p in self.traj[c]])
        ts = np.stack([p[1] for p in self.traj[c]])
        if not correct or not self.kf_frames:
            return Rs, ts
        F = Rs.shape[0]
        KF = self.state.kfs.frame.shape[0]
        fixed = np.zeros(F, dtype=bool)
        fixed_R = Rs.copy()
        fixed_t = ts.copy()
        kf_frames = np.asarray(self.state.kfs.frame)
        for w in range(min(int(self.state.kfs.n), KF)):
            idx = (int(self.state.kfs.n) - 1 - w) % KF
            f = int(kf_frames[idx])
            if 0 <= f < F:
                fixed[f] = True
                fixed_R[f] = np.asarray(self.state.kfs.R[idx, c])
                fixed_t[f] = np.asarray(self.state.kfs.t[idx, c])
        fixed[0] = True
        if len(self.rel[c]) != F - 1:
            return Rs, ts
        R_rel = np.stack([r[0] for r in self.rel[c]]) if F > 1 else \
            np.zeros((0, 3, 3), np.float32)
        t_rel = np.stack([r[1] for r in self.rel[c]]) if F > 1 else \
            np.zeros((0, 3), np.float32)
        if F > 512:
            # long runs: the dense 3Fx3F solve is cubic in run length;
            # consecutive anchors decouple the chain — per-segment solves
            from coslam_tpu.solvers.pose_graph import solve_chain_segments
            return solve_chain_segments(R_rel, t_rel, fixed, fixed_R,
                                        fixed_t, chain_scales=chain_scales)
        pg = chain_graph(jnp.asarray(R_rel), jnp.asarray(t_rel),
                         jnp.asarray(fixed), jnp.asarray(fixed_R),
                         jnp.asarray(fixed_t), jnp.ones(F, dtype=bool))
        num_scales = 1
        if chain_scales:
            anchors = np.nonzero(fixed)[0]
            if len(anchors) >= 2:
                # edge k (k -> k+1) belongs to the segment between the
                # surrounding anchors; edges outside [first, last) anchor
                # stay rigid (their scale would be unobservable)
                seg = np.searchsorted(anchors, np.arange(F - 1),
                                      side="right") - 1
                sg = np.where(
                    (np.arange(F - 1) >= anchors[0])
                    & (np.arange(F - 1) < anchors[-1]),
                    seg, -1).astype(np.int32)
                num_scales = max(1, int(len(anchors) - 1))
                pg = pg._replace(scale_group=jnp.asarray(sg))
        R_sol = solve_rotations(pg)
        t_sol, _ = solve_translations(pg, R_sol, num_scales=num_scales)
        return np.asarray(R_sol), np.asarray(t_sol)

    # ------------------------------------------------------------------
    def map_points(self):
        """Alive map points as numpy (id, xyz, cov)."""
        st = self.state.mappts
        alive = np.asarray(st.status) == ST_ALIVE
        ids = np.nonzero(alive)[0]
        return ids, np.asarray(st.xyz)[alive], np.asarray(st.cov)[alive]
