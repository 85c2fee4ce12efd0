import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.geometry import se3, pnp


def make_scene(rng, n=100, noise=0.0, outlier_frac=0.0):
    X = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    X[:, 2] += 8.0
    R = np.asarray(se3.so3_exp(jnp.array([0.2, -0.1, 0.3], dtype=jnp.float32)))
    t = np.array([0.4, -0.2, 1.0], dtype=np.float32)
    Xc = X @ R.T + t
    xn = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
    if noise:
        xn += noise * rng.standard_normal(xn.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        xn[:n_out] += rng.uniform(0.05, 0.3, (n_out, 2)).astype(np.float32)
    return X, R, t, xn, n_out


def rot_angle_deg(Ra, Rb):
    d = Ra @ Rb.T
    return np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1)))


def test_pnp_dlt_clean(rng):
    X, R, t, xn, _ = make_scene(rng)
    w = jnp.ones(X.shape[0], dtype=jnp.float32)
    Re, te = pnp.pnp_dlt(jnp.asarray(X), jnp.asarray(xn), w)
    assert rot_angle_deg(np.asarray(Re), R) < 0.1
    np.testing.assert_allclose(np.asarray(te), t, atol=1e-2)


def test_ransac_pnp_with_outliers(rng):
    X, R, t, xn, n_out = make_scene(rng, noise=5e-4, outlier_frac=0.3)
    mask = jnp.ones(X.shape[0], dtype=bool)
    res = pnp.ransac_pnp(jax.random.PRNGKey(0), jnp.asarray(X), jnp.asarray(xn),
                         mask, num_hypotheses=256, thresh=5e-3)
    assert rot_angle_deg(np.asarray(res.R), R) < 1.0
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.05)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.9
    assert inl[:n_out].mean() < 0.1


def test_pnp_dlt_off_origin_conditioning(rng):
    """Regression (round 5): a scene whose world points sit far from the
    origin (centroid |c| >> extent — any map a few rooms away from the
    bootstrap datum). Without Hartley normalization the DLT's 12x12
    normal equations are so ill-conditioned that the f32 eigh returns a
    garbage null vector on TPU (0 RANSAC inliers on a bridge problem
    where 80% of matches fit at 2 px — production group merges silently
    failed for rounds while CPU tests passed on LAPACK's better f32
    eigh). Pose recovery must hold with the centroid pushed out."""
    for centroid in ([-7.0, 0.0, -3.0], [40.0, -25.0, 60.0]):
        X = rng.uniform(-2, 2, (120, 3)).astype(np.float32) \
            + np.asarray(centroid, np.float32)
        R = np.asarray(se3.so3_exp(jnp.array([0.1, 0.8, -0.05],
                                             dtype=jnp.float32)))
        c_cam = np.asarray(centroid, np.float32) \
            + np.array([0.5, 0.2, -5.0], np.float32)
        t = (-R @ c_cam).astype(np.float32)
        Xc = X @ R.T + t
        assert (Xc[:, 2] > 0.5).all()
        xn = (Xc[:, :2] / Xc[:, 2:3]).astype(np.float32)
        w = jnp.ones(X.shape[0], dtype=jnp.float32)
        Re, te = pnp.pnp_dlt(jnp.asarray(X), jnp.asarray(xn), w)
        assert rot_angle_deg(np.asarray(Re), R) < 0.2, centroid
        np.testing.assert_allclose(np.asarray(te), t,
                                   atol=2e-2 * np.linalg.norm(t))
        res = pnp.ransac_pnp(jax.random.PRNGKey(3), jnp.asarray(X),
                             jnp.asarray(xn),
                             jnp.ones(X.shape[0], dtype=bool),
                             num_hypotheses=256, thresh=5e-3)
        assert int(res.num_inliers) > 100, centroid
