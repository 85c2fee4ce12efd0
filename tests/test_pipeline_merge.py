"""BASELINE config 4: camera-group split/merge — cameras separating and
rejoining, pose-graph realignment on re-overlap."""

import numpy as np
import jax.numpy as jnp
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render
from coslam_tpu.geometry.se3 import so3_exp
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.io.ate import ate_rmse

pytestmark = pytest.mark.slow

C, H, W = 2, 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)
F = 100


def _yaw1(f):
    """cam1 yaws ~51 deg away (frames 20-40), holds, returns (55-75)."""
    if f < 20:
        return 0.0
    if f < 40:
        return 0.9 * (f - 20) / 20
    if f < 55:
        return 0.9
    if f < 75:
        return 0.9 * (75 - f) / 20
    return 0.0


@pytest.fixture(scope="module")
def split_merge_run():
    rng = np.random.default_rng(1)
    planes = make_room(rng, size=10.0)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        base_c = np.array([0.0, 0.0, 0.02 * f], dtype=np.float32)
        for c in range(C):
            yaw = _yaw1(f) if c == 1 else 0.0
            Rc = np.asarray(so3_exp(jnp.array([0.0, yaw, 0.0],
                                              dtype=jnp.float32)))
            center = base_c + np.array([c * 1.0 - 0.5, 0, 0],
                                       dtype=np.float32)
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
            frames[f, c] = np.asarray(render(planes, K1, Rc, ts_gt[c, f],
                                             H, W))
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))
    groups_hist = []
    for f in range(F):
        eng.process_frame(frames[f])
        groups_hist.append(tuple(eng.group_id.tolist()))
    return eng, Rs_gt, ts_gt, groups_hist


def test_group_splits_during_separation(split_merge_run):
    _, _, _, groups = split_merge_run
    # separated phase (frames 45-70) must be in different groups
    assert any(g[0] != g[1] for g in groups[45:70])


def test_merge_happens_on_reoverlap(split_merge_run):
    eng, _, _, _ = split_merge_run
    # the REAL (Sim(3)-realigning) merge; short grouping flaps after it
    # may append no-realign "reunify" entries, which is the intended
    # protection against re-applying scale to drift that does not exist
    real = [m for m in eng.merge_log if not m.get("reunify")]
    assert len(real) >= 1
    m = real[-1]
    assert m["frame"] >= 70          # after the views re-overlap
    if m.get("noop"):
        # identity explained the bridge: no realignment, no rescale —
        # the logged baseline is the kept geometry. (At this toy scale
        # the ~30-match bridge strip leaves the PnP baseline on a
        # bas-relief manifold, so asserting its magnitude would assert
        # sampling luck; the alignment quality is pinned by
        # test_post_merge_alignment's final-pose checks.)
        assert m["scale_move"] == 1.0
    else:
        assert 0.3 < m["scale"] < 3.0    # metric scale recovered sanely
    # n_matches counts PnP-against-the-anchor-map inliers (map-verified
    # matches — a much stricter filter than the old E-matrix inliers,
    # so the floor is lower)
    assert m["n_matches"] >= 10


def test_groups_rejoined_at_end(split_merge_run):
    _, _, _, groups = split_merge_run
    assert groups[-1][0] == groups[-1][1]


def test_post_merge_alignment(split_merge_run):
    eng, Rs_gt, ts_gt, _ = split_merge_run
    # cam0 (anchor) stays accurate; cam1 realigned within bound
    a0 = ate_rmse(*eng.trajectory(0, True), Rs_gt[0], ts_gt[0])
    a1 = ate_rmse(*eng.trajectory(1, True), Rs_gt[1], ts_gt[1])
    assert a0 < 0.15, a0
    # cam1's solo stretch is a pure-rotation scale-drift regime; the merge
    # realignment (graded Sim(3) from the PnP-on-anchor-map bridge)
    # recovers the pose and the merge-time JOINT wide-window BA absorbs
    # part of the mid-separation shape error. The final-pose checks below
    # pin the realignment quality; this bound pins the whole-trajectory
    # error (dominated by the un-observable mid-separation drift) at the
    # level the round-4 robustness stack produces (~0.50; a broken merge
    # leaves it >1.5, no merge at all ~2).
    assert a1 < 0.65, a1
    # final relative pose between the cameras: at this 150x200 toy scale
    # the bridge is ~14 map-verified matches concentrated in the shared
    # view — a bas-relief-flat direction leaves several degrees of yaw
    # unobservable (verified deterministic at ~8.4 deg across repeated
    # runs; the PnP bridge, its Gauss-Newton iteration, and the joint
    # wide-window BA all converge to the same minimum because the match
    # set genuinely does not constrain it tighter). A BROKEN realignment
    # is 20+ deg (no merge) — the bound separates those regimes; the
    # production-scale splitmerge ACCURACY row (640x480, 1024 features,
    # dense bridge) is the sharp version of this check.
    R0, _ = eng.trajectory(0, True)
    R1, _ = eng.trajectory(1, True)
    R_rel = R1[-1] @ R0[-1].T
    R_rel_gt = Rs_gt[1, -1] @ Rs_gt[0, -1].T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_rel @ R_rel_gt.T) - 1) / 2,
                                       -1, 1)))
    assert ang < 12.0, ang


def test_fuse_close_points_unit():
    """Duplicate unification: co-located same-appearance points fuse to
    the older slot; distinct-appearance neighbors survive."""
    import jax.numpy as jnp
    from coslam_tpu.config import small_test_config
    from coslam_tpu.slam.state import init_state, ST_ALIVE, ST_FREE
    from coslam_tpu.slam.merge import fuse_close_points

    cfg = small_test_config(num_cameras=2)
    st = init_state(cfg)
    mp = st.mappts
    B = mp.ncc.shape[-1]
    rngl = np.random.default_rng(0)
    blk1 = rngl.standard_normal(B).astype(np.float32)
    blk1 /= np.linalg.norm(blk1)
    blk2 = rngl.standard_normal(B).astype(np.float32)
    blk2 /= np.linalg.norm(blk2)
    xyz = np.zeros((mp.xyz.shape[0], 3), np.float32)
    xyz[0] = [1, 1, 5]
    xyz[1] = [1.05, 1, 5]      # duplicate of 0 (same appearance)
    xyz[2] = [1.1, 1, 5]       # close to 0 but DIFFERENT appearance
    xyz[3] = [4, 4, 9]         # far away
    status = np.zeros(mp.status.shape[0], np.int32)
    status[:4] = ST_ALIVE
    ncc = np.zeros(mp.ncc.shape, np.float32)
    ncc_ok = np.zeros(mp.ncc_valid.shape, bool)
    for i, b in [(0, blk1), (1, blk1), (2, blk2), (3, blk1)]:
        ncc[i, 0] = b
        ncc_ok[i, 0] = True
    ff = np.zeros(mp.first_frame.shape[0], np.int32)
    ff[1] = 5                  # point 1 is newer -> it dies
    st = st._replace(mappts=mp._replace(
        xyz=jnp.asarray(xyz), status=jnp.asarray(status),
        ncc=jnp.asarray(ncc), ncc_valid=jnp.asarray(ncc_ok),
        first_frame=jnp.asarray(ff)))
    st2, n = fuse_close_points(st, cfg)
    status2 = np.asarray(st2.mappts.status)
    assert n == 1
    assert status2[0] == ST_ALIVE
    assert status2[1] != ST_ALIVE        # fused away
    assert status2[2] == ST_ALIVE        # different appearance survives
    assert status2[3] == ST_ALIVE
    # scale invariance: the same scene bootstrapped at 7x the depth makes
    # IDENTICAL fusion decisions (the gate is depth-relative, not
    # world-unit)
    s = 7.0
    st_s = st._replace(
        mappts=st.mappts._replace(xyz=st.mappts.xyz * s),
        t=st.t * s)
    st3, n3 = fuse_close_points(st_s, cfg)
    assert n3 == n
    assert (np.asarray(st3.mappts.status)[:4] == status2[:4]).all()
