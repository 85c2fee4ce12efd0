"""Dense-table BA (scatter-free fast path) vs the list-based solver."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.solvers.ba import (BAProblem, bundle_adjust,
                                   BATableProblem, bundle_adjust_table)
from coslam_tpu.geometry.se3 import so3_exp


def _make(rng, S=6, P=96, drop=0.3):
    K1 = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]], np.float32)
    X = rng.uniform(-3, 3, (P, 3)).astype(np.float32)
    X[:, 2] += 9
    Rs, ts = [], []
    for m in range(S):
        w = 0.05 * rng.standard_normal(3).astype(np.float32)
        Rs.append(np.asarray(so3_exp(jnp.asarray(w))))
        ts.append(np.array([0.4 * m, 0.05 * m, 0.0], np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    # dense [S, P] observation table with random dropouts
    valid = rng.random((S, P)) > drop
    px = np.zeros((S, 2, P), np.float32)
    for s in range(S):
        Xc = X @ Rs[s].T + ts[s]
        px[s, 0] = Xc[:, 0] / Xc[:, 2] * 300 + 160
        px[s, 1] = Xc[:, 1] / Xc[:, 2] * 300 + 120
    px += 0.3 * rng.standard_normal(px.shape).astype(np.float32)
    cam_fixed = np.zeros(S, bool)
    cam_fixed[:2] = True
    # perturb
    Rp = Rs.copy()
    for m in range(2, S):
        dR = np.asarray(so3_exp(jnp.asarray(
            0.02 * rng.standard_normal(3).astype(np.float32))))
        Rp[m] = dR @ Rs[m]
    Xp = (X + 0.05 * rng.standard_normal(X.shape)).astype(np.float32)
    return K1, Rs, ts, Rp, Xp, X, px, valid, cam_fixed


def test_table_matches_list_solver(rng):
    K1, Rs_gt, ts, Rp, Xp, X_gt, px, valid, cam_fixed = _make(rng)
    S, _, P = px.shape
    tprob = BATableProblem(
        K=jnp.broadcast_to(jnp.asarray(K1)[None], (S, 3, 3)),
        R=jnp.asarray(Rp), t=jnp.asarray(ts), X=jnp.asarray(Xp),
        obs_px=jnp.asarray(px), obs_valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(P, bool))
    tres = bundle_adjust_table(tprob, max_err=6.0, max_iter=2, inner_iter=15)
    # same problem in list form
    ss, pp = np.nonzero(valid)
    prob = BAProblem(
        K=jnp.broadcast_to(jnp.asarray(K1)[None], (S, 3, 3)),
        R=jnp.asarray(Rp), t=jnp.asarray(ts), X=jnp.asarray(Xp),
        obs_cam=jnp.asarray(ss.astype(np.int32)),
        obs_pt=jnp.asarray(pp.astype(np.int32)),
        obs_px=jnp.asarray(px[ss, :, pp]),
        obs_valid=jnp.ones(len(ss), bool),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(P, bool))
    lres = bundle_adjust(prob, max_err=6.0, max_iter=2, inner_iter=15)
    # both converge to the ground truth poses (0.3 px measurement noise
    # with a 2-camera gauge bounds this around a few 1e-3)
    for res in (tres, lres):
        for m in range(S):
            assert np.abs(np.asarray(res.R[m]) - Rs_gt[m]).max() < 5e-3
    # and agree closely with each other
    assert np.abs(np.asarray(tres.R) - np.asarray(lres.R)).max() < 1e-3
    assert np.abs(np.asarray(tres.t) - np.asarray(lres.t)).max() < 5e-3
    # reconstructed structure near ground truth
    obs2 = np.asarray(valid.sum(0)) >= 2
    dX = np.linalg.norm(np.asarray(tres.X)[obs2] - X_gt[obs2], axis=-1)
    assert np.median(dX) < 0.05


def test_table_outlier_flags(rng):
    K1, Rs_gt, ts, Rp, Xp, X_gt, px, valid, cam_fixed = _make(rng)
    S, _, P = px.shape
    # corrupt some observations hard
    bad = np.zeros((S, P), bool)
    bad[3, :10] = valid[3, :10]
    px[3, 0, :10] += 40.0
    tprob = BATableProblem(
        K=jnp.broadcast_to(jnp.asarray(K1)[None], (S, 3, 3)),
        R=jnp.asarray(Rp), t=jnp.asarray(ts), X=jnp.asarray(Xp),
        obs_px=jnp.asarray(px), obs_valid=jnp.asarray(valid),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(P, bool))
    tres = bundle_adjust_table(tprob, max_err=6.0, max_iter=2, inner_iter=15)
    out = np.asarray(tres.obs_outlier)
    assert (out & bad).sum() >= 0.8 * bad.sum()
    # clean observations mostly not flagged
    clean = valid & ~bad
    assert (out & clean).sum() < 0.05 * clean.sum()
