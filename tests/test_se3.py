import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.geometry import se3


def random_rotations(rng, n):
    w = rng.standard_normal((n, 3)).astype(np.float32)
    w *= (rng.uniform(0.01, 3.0, (n, 1)) / np.linalg.norm(w, axis=1, keepdims=True)).astype(np.float32)
    return np.asarray(se3.so3_exp(jnp.asarray(w))), w


def test_so3_exp_orthonormal(rng):
    R, _ = random_rotations(rng, 64)
    eye = np.eye(3)
    for Ri in R:
        np.testing.assert_allclose(Ri @ Ri.T, eye, atol=1e-5)
        assert np.linalg.det(Ri) > 0.99


def test_so3_exp_log_roundtrip(rng):
    _, w = random_rotations(rng, 64)
    R = se3.so3_exp(jnp.asarray(w))
    w2 = np.asarray(se3.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-3)


def test_so3_log_near_identity():
    w = jnp.array([[1e-5, -2e-5, 3e-6]], dtype=jnp.float32)
    R = se3.so3_exp(w)
    np.testing.assert_allclose(np.asarray(se3.so3_log(R)), np.asarray(w), atol=1e-6)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.standard_normal((32, 6)).astype(np.float32) * 0.5
    R, t = se3.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.se3_log(R, t))
    np.testing.assert_allclose(xi2, xi, atol=2e-3)


def test_project_to_so3(rng):
    R, _ = random_rotations(rng, 16)
    noisy = R + 0.05 * rng.standard_normal(R.shape).astype(np.float32)
    P = np.asarray(se3.project_to_so3(jnp.asarray(noisy)))
    for Pi in P:
        np.testing.assert_allclose(Pi @ Pi.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(Pi) > 0.99
    # projection of an exact rotation is itself
    P2 = np.asarray(se3.project_to_so3(jnp.asarray(R)))
    np.testing.assert_allclose(P2, R, atol=1e-5)


def test_compose_invert(rng):
    _, w = random_rotations(rng, 8)
    R = np.asarray(se3.so3_exp(jnp.asarray(w)))
    t = rng.standard_normal((8, 3)).astype(np.float32)
    Ri, ti = se3.invert(jnp.asarray(R), jnp.asarray(t))
    Rc, tc = se3.compose(jnp.asarray(R), jnp.asarray(t), Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), np.zeros((8, 3)), atol=1e-5)


def test_relative_pose(rng):
    _, w = random_rotations(rng, 4)
    R = se3.so3_exp(jnp.asarray(w))
    t = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    R21, t21 = se3.relative_pose(R[0], t[0], R[1], t[1])
    x = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    x1 = jnp.einsum("ij,nj->ni", R[0], x) + t[0]
    x2 = jnp.einsum("ij,nj->ni", R[1], x) + t[1]
    x2_pred = jnp.einsum("ij,nj->ni", R21, x1) + t21
    np.testing.assert_allclose(np.asarray(x2_pred), np.asarray(x2), atol=1e-4)
