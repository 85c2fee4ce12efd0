"""new_map_points at production history depth (T=21): the log-spaced
second-view subset must still triangulate accurately.

The small-config tests (min_feat_track_len=5, T=8) take the exhaustive
branch, so this covers the subset branch directly: a laterally moving
camera observes known 3D points over 21 frames; the triangulated new map
points must land on the ground truth with wide-parallax second views
(newMapPoints role, SL_SingleSLAM.cpp:922-1050)."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import SlamConfig, CapacityConfig
from coslam_tpu.slam.state import init_state, history_len
from coslam_tpu.slam import steps


def test_subset_triangulation_accuracy(rng):
    cfg = SlamConfig(num_cameras=1, image_height=480, image_width=640,
                     cap=CapacityConfig(max_features=128,
                                        max_map_points=512,
                                        max_keyframes=8))
    assert cfg.p.min_feat_track_len == 20     # production default
    T = history_len(cfg)
    assert T == 21                            # subset branch active
    K = jnp.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]],
                  dtype=jnp.float32)
    kc = jnp.zeros((1, 5), jnp.float32)
    N = 128
    X_gt = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                     rng.uniform(4.0, 8.0, N)], axis=1).astype(np.float32)

    def pose(f):
        # lateral translation: 0.03 units/frame of baseline
        return np.eye(3, dtype=np.float32), \
            np.array([-0.03 * f, 0, 0], np.float32)

    def project(f):
        R, t = pose(f)
        Xc = X_gt @ R.T + t
        return (Xc[:, :2] / Xc[:, 2:]) * 500.0 + np.array([320, 240])

    state = init_state(cfg)
    cur = 30
    hist = np.zeros((1, T, N, 2), np.float32)
    hist_valid = np.zeros((1, T, N), bool)
    ph_R = np.zeros((1, T, 3, 3), np.float32)
    ph_t = np.zeros((1, T, 3), np.float32)
    for k in range(T):
        f = cur - k
        s = f % T
        hist[0, s] = project(f)
        hist_valid[0, s] = True
        R, t = pose(f)
        ph_R[0, s] = R
        ph_t[0, s] = t
    Rc, tc = pose(cur)
    tracks = state.tracks._replace(
        pos=jnp.asarray(hist[:, cur % T]),
        raw=jnp.asarray(hist[:, cur % T]),
        valid=jnp.ones((1, N), bool),
        age=jnp.full((1, N), T, jnp.int32),
        hist=jnp.asarray(hist), hist_valid=jnp.asarray(hist_valid))
    state = state._replace(
        frame=jnp.asarray(cur, jnp.int32),
        R=jnp.asarray(Rc)[None], t=jnp.asarray(tc)[None],
        tracks=tracks,
        pose_hist_R=jnp.asarray(ph_R), pose_hist_t=jnp.asarray(ph_t))
    B = (2 * cfg.p.ncc_patch_radius + 1) ** 2
    blocks = (jnp.zeros((1, N, B), jnp.float32), jnp.ones((1, N), bool))
    mappts, tracks2, n_new = steps.new_map_points(
        state, None, K[None], kc, cfg, blocks=blocks)
    n_new = int(n_new)
    assert n_new >= N * 0.9, n_new
    mpt = np.asarray(tracks2.mpt[0])
    got = mpt >= 0
    err = np.linalg.norm(np.asarray(mappts.xyz)[mpt[got]] - X_gt[got],
                         axis=1)
    # baseline up to 0.6 units over depth 4-8: triangulation should be mm
    assert float(np.median(err)) < 0.02, float(np.median(err))
    assert float(err.max()) < 0.2, float(err.max())
