"""Multi-view inter-camera mapping (featTracksFromMatches +
triangulateMultiView, SL_NewMapPointsInterCam.cpp:158,224,631) and
decidePointType dynamic-neighborhood gating (:25-91)."""

import numpy as np
import jax.numpy as jnp
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig)
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.slam.state import ST_FREE, ST_ALIVE, PT_STATIC, PT_DYNAMIC
from coslam_tpu.slam.intercam import intercam_map_group
from coslam_tpu.ops import build_pyramid

pytestmark = pytest.mark.slow

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


@pytest.fixture(scope="module")
def four_cam_engine():
    rng = np.random.default_rng(1)
    C, F = 4, 16
    planes = make_room(rng, size=10.0)
    Rr, tr = orbit_trajectory(F, forward=0.05)
    rot_c, offs_c = multi_cam_rig(C, baseline=0.8)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            frames[f, c] = render_sequence(
                planes, K1, Rc[None], (-Rc @ center)[None], H, W)[0]
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    K = np.stack([K1] * C)
    kc = np.zeros((C, 5), dtype=np.float32)
    eng = CoSlamEngine(cfg, K, kc)
    for f in range(F):
        eng.process_frame(frames[f])
    assert eng.bootstrapped
    pyr = eng.pyr_prev
    return eng, pyr


def _empty_map_state(eng):
    """The engine's state with the map cleared and all bindings cut, so
    group mapping must mint everything fresh."""
    st = eng.state
    mp = st.mappts
    return st._replace(
        tracks=st.tracks._replace(
            mpt=jnp.full_like(st.tracks.mpt, -1)),
        mappts=mp._replace(status=jnp.zeros_like(mp.status)))


def test_group_mapping_mints_three_plus_view_points(four_cam_engine):
    eng, pyr = four_cam_engine
    cfg = eng.cfg
    st = _empty_map_state(eng)
    cams = (0, 1, 2, 3)
    mp, tr, n_new = intercam_map_group(st, pyr, eng.K, eng.kc, cams, cfg)
    n_new = int(n_new)
    assert n_new > 10
    # per-slot binding count across cameras
    mpt = np.asarray(tr.mpt)
    valid = np.asarray(tr.valid)
    P = np.asarray(mp.xyz).shape[0]
    counts = np.zeros(P, np.int64)
    for c in range(4):
        sel = valid[c] & (mpt[c] >= 0)
        np.add.at(counts, mpt[c][sel], 1)
    alive = np.asarray(mp.status) == ST_ALIVE
    # the multi-view chaining must produce points seen by 3+ cameras
    assert int((counts[alive] >= 3).sum()) >= 5
    # minted points reproject onto their bound features
    xyz = np.asarray(mp.xyz)
    Rn = np.asarray(st.R)
    tn = np.asarray(st.t)
    pos = np.asarray(tr.pos)
    errs = []
    for c in range(4):
        sel = np.nonzero(valid[c] & (mpt[c] >= 0))[0]
        Xc = xyz[mpt[c][sel]] @ Rn[c].T + tn[c]
        u = Xc[:, 0] / Xc[:, 2] * K1[0, 0] + K1[0, 2]
        v = Xc[:, 1] / Xc[:, 2] * K1[1, 1] + K1[1, 2]
        errs.append(np.hypot(u - pos[c, sel, 0], v - pos[c, sel, 1]))
    assert np.median(np.concatenate(errs)) < 2.0


def test_decide_point_type_near_dynamic_features(four_cam_engine):
    """Candidate features near features bound to MAPPED dynamic points
    must never mint PT_STATIC (decidePointType builds its square mask
    from getMappedDynPts, SL_NewMapPointsInterCam.cpp:40-62 — vote-only
    dynamic features do not mask)."""
    eng, pyr = four_cam_engine
    cfg = eng.cfg
    st = _empty_map_state(eng)
    # bind every other camera-1 feature in the left half-image to an
    # alive dynamic map point (the bound features are excluded from
    # matching; their unmapped neighbors stay matchable and must mint
    # dynamic within the square mask)
    pos1 = np.asarray(st.tracks.pos[1])
    valid1 = np.asarray(st.tracks.valid[1])
    dyn_zone = np.nonzero(valid1 & (pos1[:, 0] < W / 2))[0]
    if len(dyn_zone) < 5:
        pytest.skip("too few features in the zone")
    bound = dyn_zone[::2]
    mpt = np.asarray(st.tracks.mpt).copy()
    status = np.asarray(st.mappts.status).copy()
    ptype0 = np.asarray(st.mappts.ptype).copy()
    slots = np.arange(len(bound), dtype=np.int32)
    mpt[1, bound] = slots
    status[slots] = ST_ALIVE
    ptype0[slots] = PT_DYNAMIC
    st = st._replace(
        tracks=st.tracks._replace(mpt=jnp.asarray(mpt)),
        mappts=st.mappts._replace(status=jnp.asarray(status),
                                  ptype=jnp.asarray(ptype0)))
    cams = (0, 1, 2, 3)
    mp, tr, n_new = intercam_map_group(st, pyr, eng.K, eng.kc, cams, cfg)
    assert int(n_new) > 0
    mpt1 = np.asarray(tr.mpt[1])
    alive = np.asarray(mp.status) == ST_ALIVE
    ptype = np.asarray(mp.ptype)
    dyn_pos = pos1[bound]
    r = cfg.p.dyn_neighborhood_px
    sel = np.nonzero(np.asarray(tr.valid[1]) & (mpt1 >= 0))[0]
    sel = sel[~np.isin(sel, bound)]        # only freshly minted bindings
    near = []
    for f in sel:
        slot = mpt1[f]
        if not alive[slot]:
            continue
        # Chebyshev (square-mask) distance, matching the reference's mask
        d = np.maximum(np.abs(dyn_pos[:, 0] - pos1[f, 0]),
                       np.abs(dyn_pos[:, 1] - pos1[f, 1])).min() \
            if len(dyn_pos) else np.inf
        if d <= r:
            assert ptype[slot] == PT_DYNAMIC, \
                f"point near dynamic feature minted type {ptype[slot]}"
        near.append(d <= r)
    # and at least one such dynamic-neighborhood point was actually minted
    assert any(near)
