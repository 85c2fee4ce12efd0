import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.geometry import se3, epipolar


def make_pair(rng, n=200, noise=0.0, outlier_frac=0.0):
    X = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    X[:, 2] += 6.0
    R1 = np.eye(3, dtype=np.float32)
    t1 = np.zeros(3, dtype=np.float32)
    R2 = np.asarray(se3.so3_exp(jnp.array([0.05, -0.15, 0.02], dtype=jnp.float32)))
    t2 = np.array([-1.0, 0.1, 0.2], dtype=np.float32)
    x1 = (X[:, :2] / X[:, 2:3]).astype(np.float32)
    Xc2 = X @ R2.T + t2
    x2 = (Xc2[:, :2] / Xc2[:, 2:3]).astype(np.float32)
    if noise:
        x1 += noise * rng.standard_normal(x1.shape).astype(np.float32)
        x2 += noise * rng.standard_normal(x2.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        x2[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2)).astype(np.float32)
    return X, (R1, t1), (R2, t2), x1, x2, n_out


def test_essential_from_poses_epipolar_constraint(rng):
    X, (R1, t1), (R2, t2), x1, x2, _ = make_pair(rng)
    E = epipolar.essential_from_poses(jnp.asarray(R1), jnp.asarray(t1),
                                      jnp.asarray(R2), jnp.asarray(t2))
    err = epipolar.sampson_error(E, jnp.asarray(x1), jnp.asarray(x2))
    assert float(jnp.max(err)) < 1e-6


def test_fit_fundamental_clean(rng):
    X, _, _, x1, x2, _ = make_pair(rng)
    w = jnp.ones(x1.shape[0], dtype=jnp.float32)
    F = epipolar.fit_fundamental(jnp.asarray(x1), jnp.asarray(x2), w)
    err = epipolar.sampson_error(F, jnp.asarray(x1), jnp.asarray(x2))
    assert float(jnp.max(err)) < 1e-8


def test_ransac_rejects_outliers(rng):
    X, _, _, x1, x2, n_out = make_pair(rng, noise=5e-4, outlier_frac=0.3)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    res = epipolar.ransac_fundamental(
        jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2), mask,
        num_hypotheses=256, thresh=2e-5)
    inl = np.asarray(res.inliers)
    # outliers (first n_out) must be rejected; most true inliers kept
    assert inl[:n_out].sum() <= 2
    assert inl[n_out:].mean() > 0.9


def test_recover_pose_from_essential(rng):
    X, (R1, t1), (R2, t2), x1, x2, _ = make_pair(rng)
    E = epipolar.essential_from_poses(jnp.asarray(R1), jnp.asarray(t1),
                                      jnp.asarray(R2), jnp.asarray(t2))
    mask = jnp.ones(x1.shape[0], dtype=bool)
    R, t, Xr, good = epipolar.recover_pose_from_essential(
        E, jnp.asarray(x1), jnp.asarray(x2), mask)
    np.testing.assert_allclose(np.asarray(R), R2, atol=1e-3)
    t_est = np.asarray(t)
    t_true = t2 / np.linalg.norm(t2)
    np.testing.assert_allclose(t_est, t_true, atol=1e-3)
    # triangulated structure should match X up to the scale ||t2||
    scale = np.linalg.norm(t2)
    np.testing.assert_allclose(np.asarray(Xr) * scale, X, atol=0.05)
    assert bool(jnp.all(good))


def test_ransac_then_recover_full_bootstrap(rng):
    """End-to-end two-view bootstrap: RANSAC E + pose recovery with noise."""
    X, _, (R2, t2), x1, x2, n_out = make_pair(rng, noise=3e-4, outlier_frac=0.2)
    mask = jnp.ones(x1.shape[0], dtype=bool)
    res = epipolar.ransac_fundamental(
        jax.random.PRNGKey(1), jnp.asarray(x1), jnp.asarray(x2), mask,
        num_hypotheses=512, thresh=2e-5)
    R, t, Xr, good = epipolar.recover_pose_from_essential(
        res.F, jnp.asarray(x1), jnp.asarray(x2), res.inliers)
    # rotation within ~0.5 deg
    dR = np.asarray(R) @ R2.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    cos = abs(float(np.dot(np.asarray(t), t2 / np.linalg.norm(t2))))
    assert cos > 0.999


def test_fundamental_from_poses_pixel_space(rng):
    K = jnp.array([[400.0, 0, 160], [0, 400.0, 120], [0, 0, 1]], dtype=jnp.float32)
    X, (R1, t1), (R2, t2), x1, x2, _ = make_pair(rng)
    F = epipolar.fundamental_from_poses(K, jnp.asarray(R1), jnp.asarray(t1),
                                        K, jnp.asarray(R2), jnp.asarray(t2))
    p1 = np.asarray(x1) * 400.0 + np.array([160.0, 120.0])
    p2 = np.asarray(x2) * 400.0 + np.array([160.0, 120.0])
    d = epipolar.epipolar_dists(F, jnp.asarray(p1), jnp.asarray(p2))
    assert float(jnp.max(d)) < 1e-2
