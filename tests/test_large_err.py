"""Post-merge/loop widened pose gates (the reference's largeErr frames,
SL_CoSLAM.cpp:371-374,407): after a realignment the poses are only
approximately consistent with the map, and the normal Mahalanobis gates
would shed inliers exactly when support is scarcest."""

import numpy as np
import jax.numpy as jnp
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render_sequence
from coslam_tpu.geometry.se3 import so3_exp
from coslam_tpu.slam import steps
from coslam_tpu.slam.pipeline import CoSlamEngine

pytestmark = pytest.mark.slow

H, W = 120, 160
K1 = np.array([[150.0, 0, 80], [0, 150.0, 60], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def tracked_engine():
    rng = np.random.default_rng(5)
    planes = make_room(rng, size=10.0)
    F = 30
    Rs, ts = [], []
    for f in range(F):
        R = np.asarray(so3_exp(jnp.array([0.0, 0.01 * f, 0.0],
                                         dtype=jnp.float32)))
        c = np.array([0.25 * np.sin(0.2 * f), 0.0, 0.02 * f], np.float32)
        Rs.append(R)
        ts.append((-R @ c).astype(np.float32))
    frames = render_sequence(planes, K1, np.stack(Rs), np.stack(ts), H, W)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    eng = CoSlamEngine(cfg, K1[None], np.zeros((1, 5), np.float32))
    for f in range(F):
        eng.process_frame(np.asarray(frames[f])[None])
    return eng


def test_large_err_keeps_more_inliers_after_perturbation(tracked_engine):
    """Perturb the pose the way a merge realignment leaves it (a few px of
    residual misalignment): the widened gates must retain more inliers
    than the normal ones, and both paths must stay finite."""
    eng = tracked_engine
    cfg = eng.cfg
    st = eng.state
    # a ~1.2 deg rotation nudge: reprojections move ~several px
    dR = np.asarray(so3_exp(jnp.array([0.0, 0.02, 0.0], jnp.float32)))
    st_p = st._replace(R=jnp.einsum("ij,cjk->cik", jnp.asarray(dR), st.R))
    out_n = steps.pose_update(st_p, eng.K, eng.kc, (H, W), cfg,
                              large_err=False)
    out_w = steps.pose_update(st_p, eng.K, eng.kc, (H, W), cfg,
                              large_err=True)
    n_norm = int(np.asarray(out_n.n_inliers).sum())
    n_wide = int(np.asarray(out_w.n_inliers).sum())
    assert n_wide >= n_norm
    assert n_wide > 0
    # the widened path must also detach FEWER features (outlier mask is
    # the mpt=-1 write): count surviving bindings
    b_norm = int(np.asarray(out_n.tracks.mpt >= 0).sum())
    b_wide = int(np.asarray(out_w.tracks.mpt >= 0).sum())
    assert b_wide >= b_norm


def test_large_err_window_set_by_merge_and_loop_commit():
    """The engine arms the settle window on committed merges and loop
    closures (unit check on the bookkeeping, no scene needed)."""
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    eng = CoSlamEngine(cfg, K1[None], np.zeros((1, 5), np.float32))
    assert eng._large_err_until == 0
    # simulate the commit sites' bookkeeping contract
    eng.frame = 40
    eng._large_err_until = eng.frame + 12
    assert eng.frame < eng._large_err_until
    eng.frame = 53
    assert not (eng.frame < eng._large_err_until)
