"""End-to-end real-video path: reference-format input.txt + calibration
files + AVI videos -> parse -> decode -> threaded loader -> engine ->
reference-format export (the MyApp.cpp:139-196 -> SL_CoSLAM.cpp:18 ->
exportResults:1914-2031 path), driven through examples/run_coslam.py."""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

cv2 = pytest.importorskip("cv2")

H, W, F, C = 120, 160, 24, 1
K1 = np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def video_inputs(tmp_path_factory):
    """Synthesize per-camera AVI files + calib files + input.txt."""
    from coslam_tpu.io.synthetic import make_room, orbit_trajectory, render
    from coslam_tpu.io.calib import write_calib_file
    root = tmp_path_factory.mktemp("video_e2e")
    rng = np.random.default_rng(3)
    planes = make_room(rng, size=10.0)
    Rr, tr = orbit_trajectory(F, forward=0.05)
    for c in range(C):
        vw = cv2.VideoWriter(str(root / f"cam{c}.avi"),
                             cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (W, H))
        assert vw.isOpened()
        for f in range(F):
            img = np.asarray(render(planes, K1, Rr[f], tr[f], H, W))
            g = np.clip(img, 0, 255).astype(np.uint8)
            vw.write(cv2.cvtColor(g, cv2.COLOR_GRAY2BGR))
        vw.release()
        write_calib_file(str(root / f"cam{c}_calib.txt"), K1,
                         np.zeros(5, np.float32))
    with open(root / "input.txt", "w") as fh:
        fh.write(f"{C}\n")
        for c in range(C):
            fh.write("0 10\n")                      # skip / init frames
        for c in range(C):
            fh.write(f"{root / f'cam{c}.avi'}\n")
        for c in range(C):
            fh.write(f"{root / f'cam{c}_calib.txt'}\n")
    return root


def test_video_to_export_roundtrip(video_inputs, tmp_path, monkeypatch):
    """run_coslam.py end-to-end on actual AVI files; the export directory
    must parse with the reference-format readers."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    import run_coslam
    out_dir = str(tmp_path / "results")
    monkeypatch.setattr(sys, "argv", [
        "run_coslam.py", str(video_inputs / "input.txt"),
        "--out", out_dir, "--cpu", "--small"])
    run_coslam.main()
    # exported artifacts parse (the reference's output format,
    # README.md:126-176)
    from coslam_tpu.io.export import load_campose
    cam0 = os.path.join(out_dir, "0_campose.txt")
    assert os.path.exists(cam0)
    Rs, ts = load_campose(cam0)
    assert Rs.shape == (F, 3, 3) and ts.shape == (F, 3)
    # poses are finite rotations and the camera actually moved
    assert np.isfinite(Rs).all() and np.isfinite(ts).all()
    RtR = np.einsum("fij,fik->fjk", Rs, Rs)
    assert np.abs(RtR - np.eye(3)).max() < 1e-2
    centers = -np.einsum("fji,fj->fi", Rs, ts)
    assert np.linalg.norm(centers[-1] - centers[0]) > 0.01
    assert os.path.exists(os.path.join(out_dir, "mappts.txt"))
    assert os.path.exists(os.path.join(out_dir, "input_videos.txt"))
    # the decode cache (AVI -> raw) was created by the video path
    assert os.path.exists(str(video_inputs / "cam0.avi.csrw"))
