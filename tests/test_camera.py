import numpy as np
import jax.numpy as jnp

from coslam_tpu.geometry import camera, se3


KC = jnp.array([-0.3, 0.12, 1e-3, -5e-4, 0.0], dtype=jnp.float32)
K = jnp.array([[500.0, 0.0, 320.0], [0.0, 500.0, 240.0], [0.0, 0.0, 1.0]],
              dtype=jnp.float32)


def test_distort_undistort_roundtrip(rng):
    xn = jnp.asarray(rng.uniform(-0.4, 0.4, (256, 2)).astype(np.float32))
    xd = camera.distort_normalized(xn, KC)
    xr = camera.undistort_normalized(xd, KC)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(xn), atol=1e-5)


def test_pixel_normalized_roundtrip(rng):
    px = jnp.asarray(rng.uniform(0, 640, (128, 2)).astype(np.float32))
    xn = camera.pixel_to_normalized(px, K)
    px2 = camera.normalized_to_pixel(xn, K)
    np.testing.assert_allclose(np.asarray(px2), np.asarray(px), atol=1e-3)


def test_undistort_points_identity_when_no_distortion(rng):
    px = jnp.asarray(rng.uniform(50, 600, (64, 2)).astype(np.float32))
    out = camera.undistort_points(px, K, jnp.zeros(5, dtype=jnp.float32))
    np.testing.assert_allclose(np.asarray(out), np.asarray(px), atol=1e-3)


def test_project_points(rng):
    R = np.asarray(se3.so3_exp(jnp.array([0.1, -0.2, 0.05], dtype=jnp.float32)))
    t = jnp.array([0.1, 0.0, 2.0], dtype=jnp.float32)
    X = jnp.asarray(rng.uniform(-1, 1, (32, 3)).astype(np.float32) + np.array([0, 0, 4]))
    px = camera.project_points(K, jnp.asarray(R), t, X)
    # manual
    Xc = np.asarray(X) @ R.T + np.asarray(t)
    uv = Xc[:, :2] / Xc[:, 2:3]
    expect = uv * 500.0 + np.array([320.0, 240.0])
    np.testing.assert_allclose(np.asarray(px), expect, atol=1e-2)


def test_projection_jacobian_matches_fd(rng):
    R = se3.so3_exp(jnp.array([0.1, -0.2, 0.05], dtype=jnp.float32))
    t = jnp.array([0.1, 0.0, 2.0], dtype=jnp.float32)
    X = jnp.array([[0.3, -0.2, 4.0]], dtype=jnp.float32)
    J = np.asarray(camera.projection_jacobian(K, R, t, X))[0]
    eps = 1e-3
    fd = np.zeros((2, 3))
    for k in range(3):
        dX = np.zeros(3, dtype=np.float32)
        dX[k] = eps
        p1 = np.asarray(camera.project_points(K, R, t, X + dX))[0]
        p0 = np.asarray(camera.project_points(K, R, t, X - dX))[0]
        fd[:, k] = (p1 - p0) / (2 * eps)
    np.testing.assert_allclose(J, fd, rtol=1e-2, atol=1e-2)


def test_camera_center():
    R = se3.so3_exp(jnp.array([0.3, 0.1, -0.2], dtype=jnp.float32))
    c = jnp.array([1.0, 2.0, 3.0], dtype=jnp.float32)
    t = -jnp.einsum("ij,j->i", R, c)
    np.testing.assert_allclose(np.asarray(camera.camera_center(R, t)),
                               np.asarray(c), atol=1e-5)


def test_mahalanobis2_2d():
    cov = jnp.array([[4.0, 0.0], [0.0, 1.0]], dtype=jnp.float32)
    d = jnp.array([2.0, 1.0], dtype=jnp.float32)
    m2 = camera.mahalanobis2_2d(d, cov)
    np.testing.assert_allclose(float(m2), 1.0 + 1.0, atol=1e-5)
