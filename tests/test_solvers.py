import numpy as np
import jax
import jax.numpy as jnp

from coslam_tpu.geometry import se3
from coslam_tpu.solvers import (irls_pose, bundle_adjust, BAProblem,
                                solve_rotations, solve_translations, PoseGraph)
from coslam_tpu.solvers.pose_graph import chain_graph

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], dtype=np.float32)


def rot_angle_deg(Ra, Rb):
    d = Ra @ Rb.T
    return np.degrees(np.arccos(np.clip((np.trace(d) - 1) / 2, -1, 1)))


def make_pose_problem(rng, n=200, noise=0.3, outlier_frac=0.2):
    X = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    X[:, 2] += 8.0
    R = np.asarray(se3.so3_exp(jnp.array([0.2, -0.1, 0.15], dtype=jnp.float32)))
    t = np.array([0.3, -0.2, 0.5], dtype=np.float32)
    Xc = X @ R.T + t
    px = (Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.array([320.0, 240.0])
    px = px.astype(np.float32) + noise * rng.standard_normal((n, 2)).astype(np.float32)
    n_out = int(outlier_frac * n)
    px[:n_out] += rng.uniform(30, 100, (n_out, 2)).astype(np.float32)
    return X, R, t, px, n_out


def test_irls_pose_converges_with_outliers(rng):
    X, R, t, px, n_out = make_pose_problem(rng)
    # perturbed init
    dR = np.asarray(se3.so3_exp(jnp.array([0.03, 0.02, -0.04], dtype=jnp.float32)))
    R0 = jnp.asarray(dR @ R)
    t0 = jnp.asarray(t + np.array([0.1, -0.05, 0.2], dtype=np.float32))
    res = irls_pose(jnp.asarray(K), R0, t0, jnp.asarray(X), jnp.asarray(px),
                    jnp.ones(X.shape[0], dtype=bool), tau=10.0)
    assert rot_angle_deg(np.asarray(res.R), R) < 0.1
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.02)
    w = np.asarray(res.weights)
    assert (w[:n_out] == 0).all()          # outliers fully down-weighted
    assert (w[n_out:] > 0).mean() > 0.95


def test_irls_pose_vmap_multicam(rng):
    """The per-camera solver must vmap over a camera axis."""
    X, R, t, px, _ = make_pose_problem(rng, outlier_frac=0.0)
    Ks = jnp.asarray(np.stack([K, K]))
    R0 = jnp.asarray(np.stack([R, R]))
    t0 = jnp.asarray(np.stack([t, t]))
    Xs = jnp.asarray(np.stack([X, X]))
    pxs = jnp.asarray(np.stack([px, px]))
    vs = jnp.ones((2, X.shape[0]), dtype=bool)
    f = jax.vmap(lambda k, r, tt, x, p, v: irls_pose(k, r, tt, x, p, v, 10.0))
    out = f(Ks, R0, t0, Xs, pxs, vs)
    assert out.R.shape == (2, 3, 3)
    assert rot_angle_deg(np.asarray(out.R[0]), R) < 0.1


def make_ba_problem(rng, n_cams=4, n_pts=120, noise=0.3):
    X = rng.uniform(-4, 4, (n_pts, 3)).astype(np.float32)
    X[:, 2] += 10.0
    Rs, ts = [], []
    for m in range(n_cams):
        w = 0.08 * rng.standard_normal(3).astype(np.float32)
        Rs.append(np.asarray(se3.so3_exp(jnp.asarray(w))))
        ts.append(np.array([0.8 * m - 1.2, 0.1 * m, 0.05 * m], dtype=np.float32))
    Rs, ts = np.stack(Rs), np.stack(ts)
    obs_cam, obs_pt, obs_px = [], [], []
    for m in range(n_cams):
        Xc = X @ Rs[m].T + ts[m]
        px = (Xc[:, :2] / Xc[:, 2:3]) * 500.0 + np.array([320.0, 240.0])
        obs_cam.append(np.full(n_pts, m))
        obs_pt.append(np.arange(n_pts))
        obs_px.append(px + noise * rng.standard_normal((n_pts, 2)))
    return (X, Rs, ts, np.concatenate(obs_cam), np.concatenate(obs_pt),
            np.concatenate(obs_px).astype(np.float32))


def test_bundle_adjust_converges(rng):
    X, Rs, ts, oc, op, opx = make_ba_problem(rng)
    n_cams, n_pts = Rs.shape[0], X.shape[0]
    # perturb all but the first two cameras (gauge) and all points
    Rs_p, ts_p = Rs.copy(), ts.copy()
    for m in range(2, n_cams):
        dR = np.asarray(se3.so3_exp(jnp.asarray(
            0.02 * rng.standard_normal(3).astype(np.float32))))
        Rs_p[m] = dR @ Rs[m]
        ts_p[m] = ts[m] + 0.05 * rng.standard_normal(3).astype(np.float32)
    X_p = X + 0.1 * rng.standard_normal(X.shape).astype(np.float32)
    cam_fixed = np.zeros(n_cams, dtype=bool)
    cam_fixed[:2] = True
    prob = BAProblem(
        K=jnp.asarray(np.broadcast_to(K, (n_cams, 3, 3))),
        R=jnp.asarray(Rs_p), t=jnp.asarray(ts_p), X=jnp.asarray(X_p),
        obs_cam=jnp.asarray(oc, dtype=jnp.int32),
        obs_pt=jnp.asarray(op, dtype=jnp.int32),
        obs_px=jnp.asarray(opx),
        obs_valid=jnp.ones(oc.shape[0], dtype=bool),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(n_pts, dtype=bool))
    res = bundle_adjust(prob, max_err=10.0, max_iter=2, inner_iter=12)
    # fixed cameras untouched
    np.testing.assert_allclose(np.asarray(res.R[:2]), Rs_p[:2], atol=1e-6)
    # free cameras recovered
    for m in range(2, n_cams):
        assert rot_angle_deg(np.asarray(res.R[m]), Rs[m]) < 0.1, m
        np.testing.assert_allclose(np.asarray(res.t[m]), ts[m], atol=0.02)
    err = np.asarray(res.obs_err)
    assert np.median(err) < 1.0
    assert not bool(np.asarray(res.obs_outlier).any())


def test_bundle_adjust_flags_outliers(rng):
    X, Rs, ts, oc, op, opx = make_ba_problem(rng)
    n_cams, n_pts = Rs.shape[0], X.shape[0]
    opx = opx.copy()
    opx[:15] += 80.0  # corrupt 15 measurements
    cam_fixed = np.zeros(n_cams, dtype=bool)
    cam_fixed[:2] = True
    prob = BAProblem(
        K=jnp.asarray(np.broadcast_to(K, (n_cams, 3, 3))),
        R=jnp.asarray(Rs), t=jnp.asarray(ts), X=jnp.asarray(X),
        obs_cam=jnp.asarray(oc, dtype=jnp.int32),
        obs_pt=jnp.asarray(op, dtype=jnp.int32),
        obs_px=jnp.asarray(opx),
        obs_valid=jnp.ones(oc.shape[0], dtype=bool),
        cam_fixed=jnp.asarray(cam_fixed),
        point_fixed=jnp.zeros(n_pts, dtype=bool))
    res = bundle_adjust(prob, max_err=10.0)
    out = np.asarray(res.obs_outlier)
    assert out[:15].mean() > 0.9
    assert out[15:].mean() < 0.05


def make_chain(rng, n=10):
    """Ground-truth chain of poses."""
    Rs, ts = [np.eye(3, dtype=np.float32)], [np.zeros(3, dtype=np.float32)]
    for k in range(1, n):
        w = 0.1 * rng.standard_normal(3).astype(np.float32)
        Rs.append(np.asarray(se3.so3_exp(jnp.asarray(w))) @ Rs[-1])
        ts.append(ts[-1] + rng.uniform(-0.3, 0.3, 3).astype(np.float32))
    return np.stack(Rs), np.stack(ts)


def test_pose_graph_chain_interpolation(rng):
    """Non-key-frame propagation: fix ends to corrected values, check the
    middle follows the relative transforms."""
    n = 12
    Rs, ts = make_chain(rng, n)
    R_rel = np.einsum("kij,klj->kil", Rs[1:], Rs[:-1])  # R_{k+1} R_k^T
    t_rel = ts[1:] - np.einsum("kij,kj->ki", R_rel, ts[:-1])
    # corrected end pose: rotate+shift the whole chain end
    dR = np.asarray(se3.so3_exp(jnp.array([0.02, -0.01, 0.03], dtype=jnp.float32)))
    fixed = np.zeros(n, dtype=bool)
    fixed[0] = fixed[-1] = True
    fixed_R = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    fixed_t = np.zeros((n, 3), dtype=np.float32)
    fixed_R[0], fixed_t[0] = Rs[0], ts[0]
    fixed_R[-1], fixed_t[-1] = dR @ Rs[-1], ts[-1] + np.array([0.05, 0, 0])
    pg = chain_graph(jnp.asarray(R_rel), jnp.asarray(t_rel),
                     jnp.asarray(fixed), jnp.asarray(fixed_R),
                     jnp.asarray(fixed_t), jnp.ones(n, dtype=bool))
    R_sol = solve_rotations(pg)
    t_sol, _ = solve_translations(pg, R_sol)
    # ends match their fixed values
    assert rot_angle_deg(np.asarray(R_sol[0]), Rs[0]) < 0.05
    assert rot_angle_deg(np.asarray(R_sol[-1]), fixed_R[-1]) < 0.05
    np.testing.assert_allclose(np.asarray(t_sol[-1]), fixed_t[-1], atol=5e-3)
    # middle nodes move smoothly (bounded deviation from original)
    for k in range(1, n - 1):
        assert rot_angle_deg(np.asarray(R_sol[k]), Rs[k]) < 2.5
        assert np.linalg.norm(np.asarray(t_sol[k]) - ts[k]) < 0.1


def test_pose_graph_unknown_scale_edge(rng):
    """Merge-edge scale recovery: an E-matrix edge knows direction only;
    the solver must find the scale making the loop consistent."""
    n = 4
    Rs, ts = make_chain(rng, n)
    edges_i = np.array([0, 1, 2, 0], dtype=np.int32)
    edges_j = np.array([1, 2, 3, 3], dtype=np.int32)
    eR, et, sg = [], [], []
    for k, (i, j) in enumerate(zip(edges_i, edges_j)):
        Rji = Rs[j] @ Rs[i].T
        tji = ts[j] - Rji @ ts[i]
        if k == 3:  # the merge edge: unit direction, unknown scale
            true_scale = np.linalg.norm(tji)
            tji = tji / true_scale
            sg.append(0)
        else:
            sg.append(-1)
        eR.append(Rji)
        et.append(tji)
    fixed = np.zeros(n, dtype=bool)
    fixed[0] = True
    pg = PoseGraph(
        edge_i=jnp.asarray(edges_i), edge_j=jnp.asarray(edges_j),
        edge_R=jnp.asarray(np.stack(eR).astype(np.float32)),
        edge_t=jnp.asarray(np.stack(et).astype(np.float32)),
        edge_valid=jnp.ones(4, dtype=bool),
        edge_weight=jnp.ones(4, dtype=jnp.float32),
        scale_group=jnp.asarray(np.array(sg, dtype=np.int32)),
        fixed=jnp.asarray(fixed),
        fixed_R=jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                            (n, 3, 3)).copy()).at[0].set(jnp.asarray(Rs[0])),
        fixed_t=jnp.zeros((n, 3), dtype=jnp.float32).at[0].set(jnp.asarray(ts[0])),
        node_valid=jnp.ones(n, dtype=bool))
    R_sol = solve_rotations(pg)
    t_sol, scales = solve_translations(pg, R_sol, num_scales=1)
    np.testing.assert_allclose(np.asarray(t_sol), ts, atol=1e-2)
    assert abs(float(scales[0]) - true_scale) < 0.05 * true_scale


def test_irls_pose_epi_rescues_sparse_3d(rng):
    """With very few 3D points, the epipolar 2D-2D terms must still pin
    the pose (the intraCamEstimateEpi role)."""
    from coslam_tpu.solvers.pose import irls_pose_epi
    X, R, t, px, _ = make_pose_problem(rng, n=150, noise=0.2,
                                       outlier_frac=0.0)
    # previous pose: small motion before the current one
    dR = np.asarray(se3.so3_exp(jnp.array([0.01, -0.02, 0.01],
                                          dtype=jnp.float32)))
    R_prev = dR.T @ R
    t_prev = t - np.array([0.05, 0.0, 0.02], dtype=np.float32)
    Xc_prev = X @ R_prev.T + t_prev
    px_prev = ((Xc_prev[:, :2] / Xc_prev[:, 2:3]) * 500.0
               + np.array([320.0, 240.0])).astype(np.float32)
    valid3 = np.zeros(150, bool)
    valid3[:8] = True                 # only 8 mapped points
    valid2 = np.ones(150, bool)
    R0 = jnp.asarray(R_prev)
    t0 = jnp.asarray(t_prev)
    res = irls_pose_epi(jnp.asarray(K), R0, t0, jnp.asarray(X),
                        jnp.asarray(px), jnp.asarray(valid3),
                        jnp.asarray(R_prev), jnp.asarray(t_prev),
                        jnp.asarray(px_prev), jnp.asarray(valid2), 10.0)
    assert rot_angle_deg(np.asarray(res.R), R) < 0.2
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.05)
    # sanity: 8 points alone with plain IRLS from the same init is OK too,
    # but the epi variant must not be worse
    res0 = irls_pose(jnp.asarray(K), R0, t0, jnp.asarray(X),
                     jnp.asarray(px), jnp.asarray(valid3), 10.0)
    e_epi = rot_angle_deg(np.asarray(res.R), R)
    e_plain = rot_angle_deg(np.asarray(res0.R), R)
    assert e_epi <= e_plain + 0.05


def test_irls_pose_mega_outlier_stays_in_basin(rng):
    """Regression (round 5): a SINGLE corrupt map point at a huge residual
    (hundreds of px) must not drag the solve out of the good basin when
    the init is already excellent. The old Huber-first IRLS schedule let
    w*r^2 ~ tau*r dominate every inlier by ~1000x for three outer passes
    — enough to jump the pose ~1.5 scene units with 50 perfect inliers
    (the cam2 catastrophe in the three-camera dynamic rig). Tukey on
    every pass (intraCamWeightedLMProc parity, SL_IntraCamPose.cpp:
    640-655) zeroes it immediately."""
    X, R, t, px, _ = make_pose_problem(rng, noise=0.3, outlier_frac=0.0)
    px = px.copy()
    px[:3] += 300.0                       # mega-outliers
    res = irls_pose(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t),
                    jnp.asarray(X), jnp.asarray(px),
                    jnp.ones(X.shape[0], dtype=bool), tau=10.0)
    c_old = -R.T @ t
    c_new = -np.asarray(res.R).T @ np.asarray(res.t)
    assert np.linalg.norm(c_new - c_old) < 0.02, np.linalg.norm(c_new - c_old)
    assert (np.asarray(res.weights)[:3] == 0).all()


def test_irls_pose_far_init_still_converges(rng):
    """The Huber fallback: when Tukey rejects (nearly) everything because
    the init is far off, the pass must still produce a gradient and walk
    home (clean observations, init ~25 deg + 2 units away)."""
    X, R, t, px, _ = make_pose_problem(rng, noise=0.0, outlier_frac=0.0)
    dR = np.asarray(se3.so3_exp(jnp.array([0.0, 0.44, 0.0],
                                          dtype=jnp.float32)))
    R0 = jnp.asarray((dR @ R).astype(np.float32))
    t0 = jnp.asarray(t + np.array([2.0, 0.0, 1.0], dtype=np.float32))
    res = irls_pose(jnp.asarray(K), R0, t0, jnp.asarray(X),
                    jnp.asarray(px), jnp.ones(X.shape[0], dtype=bool),
                    tau=10.0, n_irls=5, n_lm=10)
    assert rot_angle_deg(np.asarray(res.R), R) < 0.5
    np.testing.assert_allclose(np.asarray(res.t), t, atol=0.05)
