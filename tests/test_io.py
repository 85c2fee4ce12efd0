"""I/O tests: native threaded loader, formats, input/calib parsing."""

import numpy as np
import pytest

from coslam_tpu.io.loader import (FrameLoader, write_raw_sequence,
                                  native_lib, MODE_RAW, MODE_PGM)
from coslam_tpu.io.calib import (parse_input_file, read_calib_file,
                                 write_calib_file)


def test_native_lib_builds():
    assert native_lib() is not None, "g++ build of frameloader failed"


def _write_seq(tmp_path, C=2, F=7, H=24, W=32, seed=0):
    rng = np.random.default_rng(seed)
    paths, truth = [], []
    for c in range(C):
        frames = rng.integers(0, 255, (F, H, W), dtype=np.uint8)
        p = str(tmp_path / f"cam{c}.csrw")
        write_raw_sequence(p, frames)
        paths.append(p)
        truth.append(frames)
    return paths, np.stack(truth)  # [C, F, H, W]


def test_loader_raw_roundtrip(tmp_path):
    paths, truth = _write_seq(tmp_path)
    ld = FrameLoader(paths, mode=MODE_RAW)
    assert ld.hw == (24, 32)
    got = []
    for fr in ld:
        got.append(fr)
    ld.close()
    got = np.stack(got)  # [F, C, H, W]
    assert got.shape == (7, 2, 24, 32)
    np.testing.assert_array_equal(got.transpose(1, 0, 2, 3),
                                  truth.astype(np.float32))


def test_loader_resize(tmp_path):
    paths, truth = _write_seq(tmp_path)
    ld = FrameLoader(paths, mode=MODE_RAW, out_hw=(12, 16))
    fr = next(ld)
    ld.close()
    assert fr.shape == (2, 12, 16)
    # box resize ~= block means
    blk = truth[0, 0].reshape(12, 2, 16, 2).mean(axis=(1, 3))
    assert np.abs(fr[0] - blk).max() <= 1.0


def test_loader_pgm(tmp_path):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 255, (4, 20, 28), dtype=np.uint8)
    for i, fr in enumerate(frames):
        with open(tmp_path / f"img_{i:04d}.pgm", "wb") as f:
            f.write(b"P5\n# test\n28 20\n255\n" + fr.tobytes())
    ld = FrameLoader([str(tmp_path / "img_%04d.pgm")], mode=MODE_PGM)
    got = np.stack(list(ld))
    ld.close()
    assert got.shape == (4, 1, 20, 28)
    np.testing.assert_array_equal(got[:, 0], frames.astype(np.float32))


def test_input_and_calib_parsing(tmp_path):
    K = np.array([[300.0, 0.1, 160], [0, 301.0, 120], [0, 0, 1]], np.float32)
    kc = np.array([-0.2, 0.05, 1e-3, -1e-3, 0.0], np.float32)
    for c in range(2):
        write_calib_file(str(tmp_path / f"cal{c}.txt"), K, kc)
    inp = tmp_path / "input.txt"
    inp.write_text(
        "2 #number of sequences\n"
        "0 0 #skip / init\n"
        "5 0\n"
        f"{tmp_path}/video1.avi #videos\n"
        f"{tmp_path}/video2.avi\n"
        f"{tmp_path}/cal0.txt\n"
        f"{tmp_path}/cal1.txt\n")
    spec = parse_input_file(str(inp))
    assert spec.num_views == 2
    assert spec.skip_frames == [0, 5]
    assert spec.video_paths[1].endswith("video2.avi")
    K2, kc2 = read_calib_file(spec.calib_paths[0])
    np.testing.assert_allclose(K2, K, rtol=1e-6)
    np.testing.assert_allclose(kc2, kc, rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    """Save mid-run, restore into a fresh engine, verify identical
    continuation (the reference has no checkpointing at all)."""
    import jax
    from coslam_tpu.config import small_test_config
    from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                         render_sequence)
    from coslam_tpu.io.checkpoint import save_checkpoint, load_checkpoint
    from coslam_tpu.slam.pipeline import CoSlamEngine

    rng = np.random.default_rng(0)
    cfg = small_test_config(num_cameras=1, h=120, w=160)
    K = np.array([[[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]]], np.float32)
    kc = np.zeros((1, 5), np.float32)
    planes = make_room(rng, size=10.0)
    F = 30
    Rs_gt, ts_gt = orbit_trajectory(F, forward=0.06)
    frames = render_sequence(planes, K[0], Rs_gt, ts_gt, 120, 160)
    eng = CoSlamEngine(cfg, K, kc)
    for f in range(20):
        eng.process_frame(frames[f][None])
    ckpt = str(tmp_path / "ck.npz")
    save_checkpoint(ckpt, eng)
    # continue the original
    for f in range(20, F):
        eng.process_frame(frames[f][None])
    # restore into a fresh engine and continue identically
    eng2 = CoSlamEngine(cfg, K, kc)
    load_checkpoint(ckpt, eng2)
    assert eng2.frame == 20 and eng2.bootstrapped == eng.bootstrapped
    assert eng2.pyr_prev is not None     # pyramid restored from checkpoint
    for f in range(20, F):
        eng2.process_frame(frames[f][None])
    R1, t1 = eng.trajectory(0, correct=False)
    R2, t2 = eng2.trajectory(0, correct=False)
    np.testing.assert_allclose(t2, t1, atol=1e-4)
    np.testing.assert_allclose(R2, R1, atol=1e-4)
