"""Visualization renders from arrays and from an export directory."""

import os

import numpy as np

from coslam_tpu.io.viz import (render_scene, render_image_pane,
                               render_export_dir)


def test_render_scene(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(300, 3)).astype(np.float32) * [3, 1, 3] + [0, 0, 8]
    ptype = rng.integers(0, 3, 300).astype(np.int32)
    traj = np.stack([np.linspace(0, 2, 40), np.zeros(40),
                     np.linspace(0, 1, 40)], -1)
    K = np.array([[[200.0, 0, 100], [0, 200.0, 75], [0, 0, 1]]] * 2)
    R = np.stack([np.eye(3)] * 2)
    t = np.array([[0, 0, 0], [0.5, 0, 0]])
    dyn = [np.stack([np.linspace(0, 1, 10), np.ones(10),
                     np.full(10, 7.0)], -1)]
    out = str(tmp_path / "scene.png")
    render_scene(out, xyz, ptype, [traj, traj + [0.5, 0, 0]],
                 group_id=np.array([0, 1]), cam_R=R, cam_t=t, K=K,
                 img_hw=(150, 200), dyn_trajectories=dyn)
    assert os.path.getsize(out) > 10_000


def test_render_image_pane(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (120, 160)).astype(np.float32)
    px = rng.uniform(10, 150, (50, 2)).astype(np.float32)
    px[:, 1] = np.clip(px[:, 1], 10, 110)
    kind = rng.integers(0, 3, 50).astype(np.int32)
    reproj = px + rng.normal(0, 3, px.shape)
    out = str(tmp_path / "pane.png")
    render_image_pane(out, img, px, kind, reproj_px=reproj,
                      title="cam 0")
    assert os.path.getsize(out) > 10_000


def test_render_export_dir(tmp_path):
    d = tmp_path / "results"
    d.mkdir()
    rng = np.random.default_rng(2)
    with open(d / "mappts.txt", "w") as f:
        for i in range(100):
            p = rng.normal(size=3) * 2 + [0, 0, 6]
            f.write(f"{i} {p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    + " ".join(["0.01"] * 9) + "\n")
    for c in range(2):
        with open(d / f"{c}_campose.txt", "w") as f:
            for fr in range(30):
                R = np.eye(3).reshape(-1)
                t = [0.05 * fr + 0.3 * c, 0, 0]
                vals = " ".join(f"{v:.6f}" for v in list(R) + list(t))
                f.write(f"{fr} {vals}\n")
    out = str(tmp_path / "scene3d.png")
    render_export_dir(str(d), out)
    assert os.path.getsize(out) > 10_000
