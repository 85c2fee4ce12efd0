"""Offline visualization of an exported results directory.

Headless replacement for the reference's GL panes (GLScenePane map view
with per-state point colors + camera frusta, GLImagePane overlays —
SURVEY.md §2.6): writes a PLY point cloud (map points + trajectory
polylines) viewable in MeshLab/CloudCompare, and a PNG top-down plot if
matplotlib is available.

Usage: python examples/visualize_results.py <results_dir> [--out scene.ply]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_results(d):
    from coslam_tpu.io.export import load_campose
    pts = []
    mappts_path = os.path.join(d, "mappts.txt")
    if os.path.exists(mappts_path):
        with open(mappts_path) as f:
            for ln in f:
                v = ln.split()
                if len(v) >= 4:
                    pts.append([float(v[1]), float(v[2]), float(v[3])])
    trajs = []
    c = 0
    while os.path.exists(os.path.join(d, f"{c}_campose.txt")):
        Rs, ts = load_campose(os.path.join(d, f"{c}_campose.txt"))
        centers = -np.einsum("fji,fj->fi", Rs, ts)
        trajs.append(centers)
        c += 1
    return np.array(pts, np.float32), trajs


_CAM_COLORS = [(255, 64, 64), (64, 160, 255), (64, 220, 96),
               (255, 200, 32), (220, 64, 255), (32, 220, 220)]


def write_ply(path, pts, trajs):
    rows = []
    for p in pts:
        rows.append((p[0], p[1], p[2], 200, 200, 200))
    for c, tr in enumerate(trajs):
        col = _CAM_COLORS[c % len(_CAM_COLORS)]
        # densify the polyline so it reads as a path in point-cloud viewers
        for k in range(len(tr) - 1):
            for a in np.linspace(0, 1, 8, endpoint=False):
                q = tr[k] * (1 - a) + tr[k + 1] * a
                rows.append((q[0], q[1], q[2], *col))
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(rows)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for r in rows:
            f.write(f"{r[0]:.4f} {r[1]:.4f} {r[2]:.4f} {r[3]} {r[4]} {r[5]}\n")


def write_png(path, pts, trajs):
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return False
    fig, ax = plt.subplots(figsize=(8, 8))
    if len(pts):
        ax.scatter(pts[:, 0], pts[:, 2], s=2, c="#999999", label="map")
    for c, tr in enumerate(trajs):
        col = np.array(_CAM_COLORS[c % len(_CAM_COLORS)]) / 255.0
        ax.plot(tr[:, 0], tr[:, 2], color=col, lw=2, label=f"cam {c}")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title("map points + camera trajectories (top-down)")
    fig.savefig(path, dpi=130, bbox_inches="tight")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    pts, trajs = load_results(args.results_dir)
    out = args.out or os.path.join(args.results_dir, "scene.ply")
    write_ply(out, pts, trajs)
    print(f"wrote {out} ({len(pts)} map points, {len(trajs)} trajectories)")
    png = os.path.splitext(out)[0] + ".png"
    if write_png(png, pts, trajs):
        print(f"wrote {png}")
    # full 3D scene pane (GLScenePane equivalent)
    try:
        from coslam_tpu.io.viz import render_export_dir
        scene3d = os.path.splitext(out)[0] + "_3d.png"
        render_export_dir(args.results_dir, scene3d)
        print(f"wrote {scene3d}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
