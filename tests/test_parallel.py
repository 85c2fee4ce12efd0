"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from coslam_tpu.parallel.dryrun import run_dryrun
from coslam_tpu.parallel.mesh import make_cam_mesh
from coslam_tpu.parallel.dist_ba import dist_bundle_adjust
from coslam_tpu.solvers.ba import BAProblem, bundle_adjust
from coslam_tpu.geometry import se3


def test_dryrun_8_devices():
    assert len(jax.devices()) >= 8
    run_dryrun(8, verbose=False)


def _make_prob(rng, n_cams=4, n_pts=128, n_dev=8):
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    X = rng.uniform(-3, 3, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 9
    Rs, ts = [], []
    for m in range(n_cams):
        w = 0.05 * rng.standard_normal(3).astype(np.float32)
        Rs.append(np.asarray(se3.so3_exp(jnp.asarray(w))))
        ts.append(np.array([0.5 * m, 0.05 * m, 0.0], np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    oc = np.repeat(np.arange(n_cams), n_pts).astype(np.int32)
    op = np.tile(np.arange(n_pts), n_cams).astype(np.int32)
    Xc = np.einsum("oij,oj->oi", Rs[oc], X[op]) + ts[oc]
    px = (Xc[:, :2] / Xc[:, 2:3] * 300 + [160, 120]).astype(np.float32)
    px += 0.3 * rng.standard_normal(px.shape).astype(np.float32)
    # pad obs to a multiple of n_dev
    O = len(oc)
    pad = (-O) % n_dev
    def padded(a, fill=0):
        return np.concatenate([a, np.full((pad,) + a.shape[1:], fill,
                                          a.dtype)])
    valid = np.concatenate([np.ones(O, bool), np.zeros(pad, bool)])
    cam_fixed = np.zeros(n_cams, bool)
    cam_fixed[:2] = True
    Rs_p = Rs.copy()
    for m in range(2, n_cams):
        dR = np.asarray(se3.so3_exp(jnp.asarray(
            0.02 * rng.standard_normal(3).astype(np.float32))))
        Rs_p[m] = dR @ Rs[m]
    prob = BAProblem(
        K=jnp.asarray(np.broadcast_to(K, (n_cams, 3, 3))),
        R=jnp.asarray(Rs_p), t=jnp.asarray(ts),
        X=jnp.asarray(X + 0.05),
        obs_cam=jnp.asarray(padded(oc)), obs_pt=jnp.asarray(padded(op)),
        obs_px=jnp.asarray(padded(px)), obs_valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(n_pts, bool))
    return prob, Rs, ts, X


def test_dist_ba_matches_single_device(rng):
    """The psum-sharded BA must produce the same solution as the
    single-device solver (same math, distributed reduction)."""
    prob, Rs, ts, X = _make_prob(rng)
    mesh = make_cam_mesh(8)
    res_d = dist_bundle_adjust(prob, mesh, max_err=10.0, max_iter=2,
                               inner_iter=10)
    res_s = bundle_adjust(prob, max_err=10.0, max_iter=2, inner_iter=10)
    np.testing.assert_allclose(np.asarray(res_d.R), np.asarray(res_s.R),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_d.t), np.asarray(res_s.t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(res_d.X), np.asarray(res_s.X),
                               atol=5e-3)
    # and it actually solved the problem
    assert float(jnp.median(res_d.obs_err[prob.obs_valid])) < 1.0


def test_dist_table_ba_matches_single_device(rng):
    """Point-sharded dense-table BA (psum-reduced camera system) must match
    the single-device table solve."""
    from coslam_tpu.solvers.ba import BATableProblem, bundle_adjust_table
    from coslam_tpu.parallel.dist_ba import dist_bundle_adjust_table
    S, Ppts, n_dev = 6, 128, 8
    K1 = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    X = rng.uniform(-3, 3, (Ppts, 3)).astype(np.float32)
    X[:, 2] += 9
    Rs, ts = [], []
    for m in range(S):
        w = 0.05 * rng.standard_normal(3).astype(np.float32)
        Rs.append(np.asarray(se3.so3_exp(jnp.asarray(w))))
        ts.append(np.array([0.4 * m, 0.05 * m, 0.0], np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    valid = rng.random((S, Ppts)) > 0.4
    px = np.zeros((S, 2, Ppts), np.float32)
    for s in range(S):
        Xc = X @ Rs[s].T + ts[s]
        px[s, 0] = Xc[:, 0] / Xc[:, 2] * 300 + 160
        px[s, 1] = Xc[:, 1] / Xc[:, 2] * 300 + 120
    px += 0.3 * rng.standard_normal(px.shape).astype(np.float32)
    cam_fixed = np.zeros(S, bool)
    cam_fixed[:2] = True
    Rp = Rs.copy()
    for m in range(2, S):
        dR = np.asarray(se3.so3_exp(jnp.asarray(
            0.02 * rng.standard_normal(3).astype(np.float32))))
        Rp[m] = dR @ Rs[m]
    # freeze under-constrained points, as the engine's build_ba_table does
    # (their normal blocks are rank-deficient; the closed-form inverse
    # amplifies numeric noise differently per reduction order)
    point_fixed = valid.sum(0) < 2
    prob = BATableProblem(
        K=jnp.broadcast_to(jnp.asarray(K1)[None], (S, 3, 3)),
        R=jnp.asarray(Rp), t=jnp.asarray(ts),
        X=jnp.asarray(X + 0.05),
        obs_px=jnp.asarray(px), obs_valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.asarray(point_fixed))
    mesh = make_cam_mesh(n_dev)
    res_d = dist_bundle_adjust_table(prob, mesh, max_err=6.0, max_iter=2,
                                     inner_iter=12)
    res_1 = bundle_adjust_table(prob, max_err=6.0, max_iter=2,
                                inner_iter=12)
    assert np.abs(np.asarray(res_d.R) - np.asarray(res_1.R)).max() < 2e-4
    assert np.abs(np.asarray(res_d.t) - np.asarray(res_1.t)).max() < 2e-3
    free = ~point_fixed
    dX = np.abs(np.asarray(res_d.X) - np.asarray(res_1.X))[free]
    assert dX.max() < 2e-2, dX.max()
