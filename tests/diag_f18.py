"""Offline reproduction of the f=18 cam2 pose-update catastrophe: run the
engine to f=17, checkpoint, then single-step the pose solve with full
instrumentation."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, "tests")

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig,
                                     MovingQuad, make_texture)
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.slam import steps
from coslam_tpu.ops.pyramid import build_pyramid

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)

from diag_threecam import render_rig  # same fixture


def main():
    rng = np.random.default_rng(0)
    quad = MovingQuad(center0=np.array([-3.0, 0.5, 13.0], dtype=np.float32),
                      velocity=np.array([0.12, 0.0, 0.0], dtype=np.float32),
                      eu=np.array([2.2, 0.0, 0.0], dtype=np.float32),
                      ev=np.array([0.0, 2.2, 0.0], dtype=np.float32),
                      tex=make_texture(rng))
    C, F = 3, 19
    frames, Rs_gt, ts_gt = render_rig(rng, C=C, F=F, baseline=0.9,
                                      quads=[quad])
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    K = np.stack([K1] * C)
    eng = CoSlamEngine(cfg, K, np.zeros((C, 5), np.float32))
    for f in range(18):
        eng.process_frame(frames[f])
    st = eng.state
    # advance tracks with frame 18
    pyr = build_pyramid(jnp.asarray(frames[18], jnp.float32),
                        cfg.klt.n_levels)
    tracks = steps.advance_tracks(eng.pyr_prev, pyr, st.tracks,
                                  jnp.asarray(K),
                                  jnp.zeros((C, 5), jnp.float32),
                                  st.frame + 1, cfg)
    st = st._replace(tracks=tracks, frame=st.frame + 1)
    # replicate pose_update internals for diagnosis
    from coslam_tpu.slam.steps import choose_grid_features
    from coslam_tpu.solvers.pose import irls_pose
    mappts = st.mappts
    sel = np.asarray(choose_grid_features(tracks, mappts, (H, W), cfg))
    mi = np.clip(np.asarray(tracks.mpt), 0, None)
    X = np.asarray(mappts.xyz)[mi]
    pos = np.asarray(tracks.pos)
    R0 = np.asarray(st.R)
    t0 = np.asarray(st.t)
    p = cfg.p
    print("tau(max_err) =", p.max_err)
    for c in range(C):
        s = sel[c]
        Xc = (X[c] @ R0[c].T + t0[c])
        z = Xc[:, 2]
        uv = Xc[:, :2] / np.maximum(z[:, None], 1e-9) * [K1[0, 0], K1[1, 1]] \
            + [K1[0, 2], K1[1, 2]]
        r = np.linalg.norm(uv - pos[c], axis=1)
        rs = r[s]
        print(f"cam{c}: n_sel={s.sum()} resid under prev pose: "
              f"med={np.median(rs):.2f} p90={np.percentile(rs, 90):.2f} "
              f"max={rs.max():.2f} | depth med={np.median(z[s]):.2f} "
              f"min={z[s].min():.2f} max={z[s].max():.2f}")
        out = irls_pose(jnp.asarray(K[c]), jnp.asarray(R0[c]),
                        jnp.asarray(t0[c]), jnp.asarray(X[c]),
                        jnp.asarray(pos[c]), jnp.asarray(sel[c]),
                        jnp.asarray(p.max_err, jnp.float32),
                        n_irls=4, n_lm=8)
        Rn, tn = np.asarray(out.R), np.asarray(out.t)
        c_old = -R0[c].T @ t0[c]
        c_new = -Rn.T @ tn
        Xc2 = (X[c] @ Rn.T + tn)
        uv2 = Xc2[:, :2] / np.maximum(Xc2[:, 2:], 1e-9) \
            * [K1[0, 0], K1[1, 1]] + [K1[0, 2], K1[1, 2]]
        r2 = np.linalg.norm(uv2 - pos[c], axis=1)[s]
        print(f"   IRLS jump={np.linalg.norm(c_new - c_old):.3f} "
              f"resid after: med={np.median(r2):.2f} "
              f"p90={np.percentile(r2, 90):.2f}")
        # spatial spread of the selected features
        ps = pos[c][s]
        print(f"   sel bbox: x[{ps[:,0].min():.0f},{ps[:,0].max():.0f}] "
              f"y[{ps[:,1].min():.0f},{ps[:,1].max():.0f}]")
    np.save("/tmp/f18_sel.npy", sel)


if __name__ == "__main__":
    main()
