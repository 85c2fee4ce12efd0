"""End-to-end monocular SLAM on a synthetic room (BASELINE config 1:
single-camera, KLT + pose + windowed BA)."""

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
def mono_run():
    rng = np.random.default_rng(0)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    kc = np.zeros((1, 5), dtype=np.float32)
    planes = make_room(rng, size=10.0)
    F = 60
    Rs_gt, ts_gt = orbit_trajectory(F, forward=0.06)
    frames = render_sequence(planes, KMAT[0], Rs_gt, ts_gt, H, W)
    eng = CoSlamEngine(cfg, KMAT, kc)
    for f in range(F):
        eng.process_frame(frames[f][None])
    return eng, Rs_gt, ts_gt


def test_bootstrap_happens(mono_run):
    eng, _, _ = mono_run
    assert eng.bootstrapped
    assert len(eng.kf_frames) >= 3


def test_tracks_and_map_alive(mono_run):
    eng, _, _ = mono_run
    last = eng.stats_log[-1]
    assert last["n_inliers"][0] > 40
    ids, xyz, cov = eng.map_points()
    assert len(ids) > 60
    # map points live in the room (|x|,|y| < 12, 0 < z < 25)
    assert np.isfinite(xyz).all()
    assert (np.abs(xyz[:, :2]) < 15).mean() > 0.95


def test_ate_within_bound(mono_run):
    eng, Rs_gt, ts_gt = mono_run
    Rs, ts = eng.trajectory(0, correct=True)
    ate = ate_rmse(Rs, ts, Rs_gt, ts_gt)
    # trajectory is ~3.6 m long; sub-20 cm keeps us honest on CPU-size config
    assert ate < 0.20, f"ATE {ate}"


def test_reprojection_quality(mono_run):
    eng, _, _ = mono_run
    errs = [s["med_err"][0] for s in eng.stats_log if "med_err" in s]
    assert np.nanmedian(errs) < 0.5


def test_export_roundtrip(mono_run, tmp_path):
    from coslam_tpu.io.export import export_results, load_campose
    eng, Rs_gt, ts_gt = mono_run
    out = tmp_path / "results"
    export_results(str(out), eng)
    assert (out / "mappts.txt").exists()
    Rs, ts = load_campose(str(out / "0_campose.txt"))
    assert Rs.shape[0] == 60
    ate = ate_rmse(Rs, ts, Rs_gt, ts_gt)
    assert ate < 0.25


def test_mono_with_lens_distortion():
    """End-to-end with a distorted camera (kc != 0): exercises the
    raw-vs-undistorted dual coordinate path (the tracker works on raw
    pixels, the SLAM core on undistorted ones — GPUKLT.cpp:43-47)."""
    import jax.numpy as jnp
    from coslam_tpu.config import small_test_config
    from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                         render, apply_distortion_warp)
    from coslam_tpu.io.ate import ate_rmse
    from coslam_tpu.slam.pipeline import CoSlamEngine

    rng = np.random.default_rng(0)
    kc = np.array([-0.25, 0.08, 1e-3, -5e-4, 0.0], np.float32)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    planes = make_room(rng, size=10.0)
    F = 50
    Rs_gt, ts_gt = orbit_trajectory(F, forward=0.06)
    frames = np.zeros((F, H, W), np.float32)
    for f in range(F):
        ideal = render(planes, KMAT[0], Rs_gt[f], ts_gt[f], H, W)
        frames[f] = np.asarray(apply_distortion_warp(ideal, KMAT[0], kc))
    eng = CoSlamEngine(cfg, KMAT, kc[None])
    for f in range(F):
        eng.process_frame(frames[f][None])
    assert eng.bootstrapped
    ate = ate_rmse(*eng.trajectory(0, True), Rs_gt, ts_gt)
    assert ate < 0.25, f"distorted-camera ATE {ate}"
