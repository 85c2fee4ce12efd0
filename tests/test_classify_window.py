"""Classification-window tests: the N-frame static-consistency test
(isStaticPoint over ``classify_frame_window`` frames) and the
drop-one-outlier-view rescue (isStaticRemovable) —
reference SL_CoSLAMHelper.cpp:253-315."""

import numpy as np
import jax.numpy as jnp
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.slam.state import (init_state, history_len,
                                   long_history_len, LONG_STRIDE,
                                   ST_ALIVE, ST_FALSE, PT_STATIC)
from coslam_tpu.slam.classify import classify_map_points


def _project(K, R, t, X):
    Xc = R @ X + t
    return np.array([Xc[0] / Xc[2] * K[0, 0] + K[0, 2],
                     Xc[1] / Xc[2] * K[1, 1] + K[1, 2]], np.float32)


def _three_cam_setup(window=20):
    import dataclasses
    cfg = small_test_config(num_cameras=3)
    cfg = cfg.replace(
        p=dataclasses.replace(cfg.p, classify_frame_window=window))
    st = init_state(cfg)
    K = np.broadcast_to(np.array([[200.0, 0, 80], [0, 200.0, 60],
                                  [0, 0, 1]], np.float32), (3, 3, 3)).copy()
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (3, 3, 3)).copy()
    t = np.stack([np.array([0, 0, 0], np.float32),
                  np.array([-1.0, 0, 0], np.float32),
                  np.array([1.0, 0, 0], np.float32)])
    return cfg, st, K, R, t


def test_drop_one_view_saves_static_point():
    """A 3-view static point with ONE corrupted observation must survive
    (outlier view detached), not go inconsistent."""
    cfg, st, K, R, t = _three_cam_setup()
    X = np.array([0.3, -0.2, 5.0], np.float32)
    frame = 10
    tracks = st.tracks
    pos = np.zeros(tracks.pos.shape, np.float32)
    valid = np.zeros(tracks.valid.shape, bool)
    mpt = np.full(tracks.mpt.shape, -1, np.int32)
    age = np.zeros(tracks.age.shape, np.int32)
    for c in range(3):
        pos[c, 0] = _project(K[c], R[c], t[c], X)
        valid[c, 0] = True
        mpt[c, 0] = 0
        age[c, 0] = 2
    pos[2, 0] += np.array([30.0, 0.0], np.float32)   # corrupt view 2
    tracks = tracks._replace(pos=jnp.asarray(pos), valid=jnp.asarray(valid),
                             mpt=jnp.asarray(mpt), age=jnp.asarray(age))
    mp = st.mappts
    mp = mp._replace(
        xyz=mp.xyz.at[0].set(jnp.asarray(X)),
        status=mp.status.at[0].set(ST_ALIVE),
        ptype=mp.ptype.at[0].set(PT_STATIC))
    st = st._replace(tracks=tracks, mappts=mp,
                     R=jnp.asarray(R), t=jnp.asarray(t),
                     frame=jnp.asarray(frame, jnp.int32))
    out = classify_map_points(st, jnp.asarray(K), cfg)
    assert int(out.mappts.status[0]) == ST_ALIVE
    assert int(out.mappts.ptype[0]) == PT_STATIC
    assert int(out.mappts.bad_votes[0]) == 0
    # the corrupted view was detached, the clean views stay bound
    assert int(out.tracks.mpt[2, 0]) == -1
    assert int(out.tracks.mpt[0, 0]) == 0
    assert int(out.tracks.mpt[1, 0]) == 0
    # the rescued position is close to truth
    assert np.linalg.norm(np.asarray(out.mappts.xyz[0]) - X) < 0.2


@pytest.mark.parametrize("window,expect_fail", [(2, False), (7, True)])
def test_classify_frame_window_gates_history(window, expect_fail):
    """The windowed consistency test reads ``classify_frame_window``:
    history inconsistency OUTSIDE the window is ignored; inside it, the
    point accrues a bad vote."""
    cfg, st, K, R, t = _three_cam_setup(window=window)
    T = history_len(cfg)
    X = np.array([0.0, 0.0, 5.0], np.float32)
    frame = 30
    tracks = st.tracks
    pos = np.zeros(tracks.pos.shape, np.float32)
    valid = np.zeros(tracks.valid.shape, bool)
    mpt = np.full(tracks.mpt.shape, -1, np.int32)
    age = np.zeros(tracks.age.shape, np.int32)
    hist = np.zeros(tracks.hist.shape, np.float32)
    hist_ok = np.zeros(tracks.hist_valid.shape, bool)
    ph_R = np.asarray(st.pose_hist_R).copy()
    ph_t = np.asarray(st.pose_hist_t).copy()
    for c in range(2):                      # two views only (nv = 2)
        px = _project(K[c], R[c], t[c], X)
        pos[c, 0] = px
        valid[c, 0] = True
        mpt[c, 0] = 0
        age[c, 0] = 25
        for k in range(1, T):               # history offsets back from now
            ring = (frame - k) % T
            # consistent for k <= 2, drifted 50 px for k >= 3
            hist[c, ring, 0] = px if k <= 2 else px + np.array([50.0, 0])
            hist_ok[c, ring, 0] = True
            ph_R[c, ring] = R[c]
            ph_t[c, ring] = t[c]
    tracks = tracks._replace(pos=jnp.asarray(pos), valid=jnp.asarray(valid),
                             mpt=jnp.asarray(mpt), age=jnp.asarray(age),
                             hist=jnp.asarray(hist),
                             hist_valid=jnp.asarray(hist_ok))
    mp = st.mappts
    mp = mp._replace(
        xyz=mp.xyz.at[0].set(jnp.asarray(X)),
        status=mp.status.at[0].set(ST_ALIVE),
        ptype=mp.ptype.at[0].set(PT_STATIC))
    st = st._replace(tracks=tracks, mappts=mp,
                     R=jnp.asarray(R), t=jnp.asarray(t),
                     pose_hist_R=jnp.asarray(ph_R),
                     pose_hist_t=jnp.asarray(ph_t),
                     frame=jnp.asarray(frame, jnp.int32))
    out = classify_map_points(st, jnp.asarray(K), cfg)
    if expect_fail:
        assert int(out.mappts.bad_votes[0]) == 1
    else:
        assert int(out.mappts.bad_votes[0]) == 0
        assert int(out.mappts.status[0]) == ST_ALIVE


@pytest.mark.parametrize("window,expect_fail", [(7, False), (20, True)])
def test_long_window_catches_slow_mover(window, expect_fail):
    """A point whose recent history matches its stored position but whose
    older history (beyond the dense ring span) does not — e.g. an object
    that moved and then stopped — passes the dense-ring-only test and is
    caught only when ``classify_frame_window`` actually spans the long
    horizon via the every-LONG_STRIDE-frames ring (the reference checks
    the full numFrame=60 span, SL_CoSLAM.cpp:423-425)."""
    cfg, st, K, R, t = _three_cam_setup(window=window)
    T = history_len(cfg)
    TL = long_history_len(cfg)
    assert window <= T - 1 or window <= LONG_STRIDE * TL
    X = np.array([0.0, 0.0, 5.0], np.float32)
    frame = 60
    tracks = st.tracks
    pos = np.zeros(tracks.pos.shape, np.float32)
    valid = np.zeros(tracks.valid.shape, bool)
    mpt = np.full(tracks.mpt.shape, -1, np.int32)
    age = np.zeros(tracks.age.shape, np.int32)
    hist = np.zeros(tracks.hist.shape, np.float32)
    hist_ok = np.zeros(tracks.hist_valid.shape, bool)
    hist_l = np.zeros(tracks.hist_long.shape, np.float32)
    hist_l_ok = np.zeros(tracks.hist_long_valid.shape, bool)
    ph_R = np.asarray(st.pose_hist_R).copy()
    ph_t = np.asarray(st.pose_hist_t).copy()
    phl_R = np.asarray(st.pose_hist_long_R).copy()
    phl_t = np.asarray(st.pose_hist_long_t).copy()
    off = np.array([50.0, 0.0], np.float32)   # where the object used to be
    for c in range(2):                        # two views only (nv = 2)
        px = _project(K[c], R[c], t[c], X)
        pos[c, 0] = px
        valid[c, 0] = True
        mpt[c, 0] = 0
        age[c, 0] = 40
        for k in range(1, T):                 # dense ring: consistent
            ring = (frame - k) % T
            hist[c, ring, 0] = px
            hist_ok[c, ring, 0] = True
            ph_R[c, ring] = R[c]
            ph_t[c, ring] = t[c]
        m_cur = frame // LONG_STRIDE
        for j in range(TL):                   # long ring
            m = m_cur - j
            q = m * LONG_STRIDE               # the frame slot j holds
            li = m % TL
            k = frame - q                     # offset back from now
            # recent long entries consistent; older than the dense span
            # the object sat 50 px away
            hist_l[c, li, 0] = px if k <= T - 1 else px + off
            hist_l_ok[c, li, 0] = True
            phl_R[c, li] = R[c]
            phl_t[c, li] = t[c]
    tracks = tracks._replace(pos=jnp.asarray(pos), valid=jnp.asarray(valid),
                             mpt=jnp.asarray(mpt), age=jnp.asarray(age),
                             hist=jnp.asarray(hist),
                             hist_valid=jnp.asarray(hist_ok),
                             hist_long=jnp.asarray(hist_l),
                             hist_long_valid=jnp.asarray(hist_l_ok))
    mp = st.mappts
    mp = mp._replace(
        xyz=mp.xyz.at[0].set(jnp.asarray(X)),
        status=mp.status.at[0].set(ST_ALIVE),
        ptype=mp.ptype.at[0].set(PT_STATIC))
    st = st._replace(tracks=tracks, mappts=mp,
                     R=jnp.asarray(R), t=jnp.asarray(t),
                     pose_hist_R=jnp.asarray(ph_R),
                     pose_hist_t=jnp.asarray(ph_t),
                     pose_hist_long_R=jnp.asarray(phl_R),
                     pose_hist_long_t=jnp.asarray(phl_t),
                     frame=jnp.asarray(frame, jnp.int32))
    out = classify_map_points(st, jnp.asarray(K), cfg)
    if expect_fail:
        # the long-horizon inconsistency is seen -> bad vote accrues
        assert int(out.mappts.bad_votes[0]) == 1
    else:
        # dense-ring-only window: the recent history explains the stored
        # position, the point passes
        assert int(out.mappts.bad_votes[0]) == 0
        assert int(out.mappts.status[0]) == ST_ALIVE
