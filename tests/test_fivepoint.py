"""5-point minimal essential solver + combined E-RANSAC."""

import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.geometry.fivepoint import (five_point_candidates,
                                           ransac_essential_5pt)
from coslam_tpu.geometry.epipolar import ransac_essential, sampson_error
from coslam_tpu.geometry.se3 import so3_exp, so3_hat


def _scene(rng, n, rot_scale=0.3, planar=False):
    R = np.asarray(so3_exp(jnp.asarray(
        rot_scale * rng.standard_normal(3).astype(np.float32))))
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-2, 2, (n, 3))
    if planar:
        X[:, 2] = 0.2 * X[:, 0] + 0.1 * X[:, 1]
    X[:, 2] += 6
    x1 = X[:, :2] / X[:, 2:3]
    Xc2 = X @ R.T + t
    x2 = Xc2[:, :2] / Xc2[:, 2:3]
    E = np.asarray(so3_hat(jnp.asarray(t, jnp.float32))) @ R
    E /= np.linalg.norm(E)
    return R, t, E, x1.astype(np.float64), x2.astype(np.float64)


def test_five_point_recovers_exact_e():
    rng = np.random.default_rng(0)
    for _ in range(10):
        _, _, E_gt, x1, x2 = _scene(rng, 5)
        E, good = five_point_candidates(x1[None], x2[None])
        errs = [min(np.abs(E[0, k] - E_gt).max(), np.abs(E[0, k] + E_gt).max())
                for k in range(10) if good[0, k]]
        assert errs and min(errs) < 1e-6


def test_five_point_on_planar_scene():
    # pure-planar 5-point samples (8-point's classic degeneracy)
    rng = np.random.default_rng(1)
    hits = 0
    for _ in range(10):
        _, _, E_gt, x1, x2 = _scene(rng, 5, planar=True)
        E, good = five_point_candidates(x1[None], x2[None])
        errs = [min(np.abs(E[0, k] - E_gt).max(), np.abs(E[0, k] + E_gt).max())
                for k in range(10) if good[0, k]]
        hits += bool(errs and min(errs) < 1e-5)
    assert hits >= 8


def test_ransac_5pt_with_outliers():
    rng = np.random.default_rng(2)
    _, _, E_gt, x1, x2 = _scene(rng, 200)
    # 30% outliers
    out = rng.random(200) < 0.3
    x2[out] += rng.uniform(0.05, 0.2, (out.sum(), 2))
    E, inl, n = ransac_essential_5pt(x1, x2, np.ones(200, bool),
                                     n_hyp=64, thresh=1e-6)
    assert n > 100
    # inliers should be dominated by non-corrupted points
    assert (inl & ~out).sum() > 0.9 * inl.sum()
    d = np.asarray(sampson_error(jnp.asarray(E, jnp.float32),
                                 jnp.asarray(x1[~out], jnp.float32),
                                 jnp.asarray(x2[~out], jnp.float32)))
    assert np.median(d) < 1e-8


def test_combined_ransac_essential():
    rng = np.random.default_rng(3)
    _, _, _, x1, x2 = _scene(rng, 150)
    res = ransac_essential(jax.random.PRNGKey(0),
                           jnp.asarray(x1, jnp.float32),
                           jnp.asarray(x2, jnp.float32),
                           jnp.ones(150, bool), num_hypotheses=128,
                           thresh=1e-6, n_hyp_5pt=32)
    assert int(res.num_inliers) > 130
