"""Long-run stability under a tiny map-point budget: the fixed-capacity
slot table must keep reclaiming false/dead slots (lifecycle_update +
generation bumps) so mapping never starves — the reference bounds state
with its cur/act/inact migration + releaseFeatPts (SL_CoSLAM.cpp:1176-1223,
1786-1799); here capacity pressure exercises the same mechanism."""

import dataclasses

import numpy as np

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, orbit_trajectory, render_sequence
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.slam.state import ST_ALIVE
import pytest

pytestmark = pytest.mark.slow

H, W = 150, 200
KMAT = np.array([[[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]]],
                dtype=np.float32)


def test_map_capacity_pressure():
    rng = np.random.default_rng(0)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    cfg = cfg.replace(cap=dataclasses.replace(cfg.cap, max_map_points=128))
    kc = np.zeros((1, 5), dtype=np.float32)
    planes = make_room(rng, size=10.0)
    F = 50
    Rs_gt, ts_gt = orbit_trajectory(F, forward=0.06)
    frames = render_sequence(planes, KMAT[0], Rs_gt, ts_gt, H, W)
    eng = CoSlamEngine(cfg, KMAT, kc)
    late_allocs = 0
    for f in range(F):
        stats = eng.process_frame(frames[f][None])
        if f > 25:
            late_allocs += int(stats.get("n_new_points", 0))
    mp = eng.state.mappts
    status = np.asarray(mp.status)
    assert (status == ST_ALIVE).sum() <= 128
    assert np.isfinite(np.asarray(mp.xyz)).all()
    # tracking survived capacity pressure
    assert eng.stats_log[-1]["n_inliers"][0] > 20
    # generation counter advanced: slots were actually recycled
    assert int(np.asarray(mp.gen).max()) >= 1
