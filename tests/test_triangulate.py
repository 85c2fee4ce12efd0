import numpy as np
import jax.numpy as jnp

from coslam_tpu.geometry import se3, camera, triangulate


def make_views(rng, n_views=4, n_pts=64):
    X = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 8.0
    Rs, ts = [], []
    for v in range(n_views):
        w = 0.1 * rng.standard_normal(3).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(w)))
        t = np.array([0.5 * v - 1.0, 0.05 * v, 0.1 * v], dtype=np.float32)
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)
    Xc = np.einsum("vij,nj->vni", Rs, X) + ts[:, None]
    xn = Xc[..., :2] / Xc[..., 2:3]
    return X, Rs, ts, xn.astype(np.float32)


def test_two_view(rng):
    X, Rs, ts, xn = make_views(rng, n_views=2)
    Xr = triangulate.triangulate_two_view(
        jnp.asarray(Rs[0]), jnp.asarray(ts[0]), jnp.asarray(Rs[1]),
        jnp.asarray(ts[1]), jnp.asarray(xn[0]), jnp.asarray(xn[1]))
    np.testing.assert_allclose(np.asarray(Xr), X, atol=5e-2)


def test_multiview_masked(rng):
    X, Rs, ts, xn = make_views(rng, n_views=4)
    n = X.shape[0]
    Rb = jnp.broadcast_to(jnp.asarray(Rs), (n, 4, 3, 3))
    tb = jnp.broadcast_to(jnp.asarray(ts), (n, 4, 3))
    xb = jnp.asarray(np.transpose(xn, (1, 0, 2)))
    mask = np.ones((n, 4), dtype=bool)
    mask[:, 3] = False  # drop one view; corrupt it to prove masking works
    xb = xb.at[:, 3].set(999.0)
    Xr = triangulate.triangulate_multiview(Rb, tb, xb, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(Xr), X, atol=5e-2)


def test_reproj_and_back(rng):
    X, Rs, ts, xn = make_views(rng, n_views=2)
    K = jnp.eye(3, dtype=jnp.float32)
    err = triangulate.reproj_errors(K, jnp.asarray(Rs[0]), jnp.asarray(ts[0]),
                                    jnp.asarray(X), jnp.asarray(xn[0]))
    assert float(jnp.max(err)) < 1e-4
    back = triangulate.is_at_camera_back(jnp.asarray(Rs[0]), jnp.asarray(ts[0]),
                                         jnp.asarray(X))
    assert not bool(jnp.any(back))


def test_triangulation_cov_shrinks_with_views(rng):
    X, Rs, ts, xn = make_views(rng, n_views=4)
    K = np.eye(3, dtype=np.float32)
    Ks = jnp.broadcast_to(jnp.asarray(K), (4, 3, 3))
    m2 = jnp.asarray(np.array([True, True, False, False]))
    m4 = jnp.ones(4, dtype=bool)
    c2 = triangulate.triangulation_cov(Ks, jnp.asarray(Rs), jnp.asarray(ts),
                                       jnp.asarray(X[0]), m2)
    c4 = triangulate.triangulation_cov(Ks, jnp.asarray(Rs), jnp.asarray(ts),
                                       jnp.asarray(X[0]), m4)
    assert float(jnp.trace(c4)) < float(jnp.trace(c2))


def test_seq_triangulate_update_improves(rng):
    X, Rs, ts, xn = make_views(rng, n_views=2)
    K = jnp.eye(3, dtype=jnp.float32)
    X0 = jnp.asarray(X[0] + np.array([0.05, -0.05, 0.3], dtype=np.float32))
    cov0 = jnp.eye(3, dtype=jnp.float32) * 0.25
    Xn, covn, maha2 = triangulate.seq_triangulate_update(
        K, jnp.asarray(Rs[1]), jnp.asarray(ts[1]), jnp.asarray(xn[1][0]),
        X0, cov0, pixel_var=1e-6)
    err0 = np.linalg.norm(np.asarray(X0) - X[0])
    err1 = np.linalg.norm(np.asarray(Xn) - X[0])
    assert err1 < err0
    assert float(jnp.trace(covn)) < float(jnp.trace(cov0))


def test_seq_triangulate_gate_blocks_outlier(rng):
    X, Rs, ts, xn = make_views(rng, n_views=2)
    K = jnp.eye(3, dtype=jnp.float32)
    X0 = jnp.asarray(X[0])
    cov0 = jnp.eye(3, dtype=jnp.float32) * 1e-4
    bad_obs = jnp.asarray(xn[1][0] + 5.0)  # wildly wrong measurement
    Xn, covn, maha2 = triangulate.seq_triangulate_update(
        K, jnp.asarray(Rs[1]), jnp.asarray(ts[1]), bad_obs, X0, cov0,
        pixel_var=1e-6, gate_maha2=9.0)
    np.testing.assert_allclose(np.asarray(Xn), np.asarray(X0))
    assert float(maha2) > 9.0
