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
