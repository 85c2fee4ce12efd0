"""Asynchronous (deferred, cancelable) bundle adjustment.

The reference runs windowed BA in a worker thread concurrently with
tracking (SURVEY.md §3.4, SL_CoSLAM.cpp:1702-1784) with write-back under
a mutex and merge cancellation (bCancelBA). The engine's TPU equivalent
dispatches the solve without blocking, applies the result a few frames
later with generation-guarded point write-back, and drops it on merge.
"""

import numpy as np
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, orbit_trajectory, render_sequence
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

pytestmark = pytest.mark.slow

H, W = 150, 200
KMAT = np.array([[[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]]],
                dtype=np.float32)


@pytest.fixture(scope="module")
def async_run():
    rng = np.random.default_rng(0)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    kc = np.zeros((1, 5), dtype=np.float32)
    planes = make_room(rng, size=10.0)
    F = 60
    Rs_gt, ts_gt = orbit_trajectory(F, forward=0.06)
    frames = render_sequence(planes, KMAT[0], Rs_gt, ts_gt, H, W)
    eng = CoSlamEngine(cfg, KMAT, kc, async_ba=True)
    dispatches = 0
    for f in range(F):
        had = eng._pending_ba is not None
        eng.process_frame(frames[f][None])
        if not had and eng._pending_ba is not None:
            dispatches += 1
    return eng, Rs_gt, ts_gt, dispatches


def test_async_ba_dispatches_and_applies(async_run):
    eng, _, _, dispatches = async_run
    assert dispatches >= 2          # BA actually went through the async path
    eng._apply_pending_ba()         # flush any tail
    assert eng._pending_ba is None


def test_async_ba_ate_within_bound(async_run):
    eng, Rs_gt, ts_gt, _ = async_run
    eng._apply_pending_ba()
    Rs, ts = eng.trajectory(0, correct=True)
    ate = ate_rmse(Rs, ts, Rs_gt, ts_gt)
    assert ate < 0.20, f"async-BA ATE {ate}"


def test_async_ba_map_quality(async_run):
    eng, _, _, _ = async_run
    ids, xyz, cov = eng.map_points()
    assert len(ids) > 60
    assert np.isfinite(xyz).all()


def test_cancel_drops_pending(async_run):
    eng, _, _, _ = async_run
    # synthesize a pending entry, then cancel must drop it untouched
    eng._pending_ba = {"res": None}
    eng._cancel_pending_ba()
    assert eng._pending_ba is None
