"""Dynamic points in the windowed BA: per-keyframe dynamic snapshots
(KeyFrame::storeDynamicMapPoints, SL_KeyPoseList.h:140-148) become
independent landmarks in the BA window (SL_CoSLAMRobustBA.cpp:66-77)."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.config import small_test_config
from coslam_tpu.slam.state import (init_state, ST_ALIVE, PT_STATIC,
                                   PT_DYNAMIC)
from coslam_tpu.slam import steps
from coslam_tpu.solvers.ba import bundle_adjust_table


def _project(K, R, t, X):
    Xc = X @ R.T + t
    return np.stack([Xc[:, 0] / Xc[:, 2] * K[0, 0] + K[0, 2],
                     Xc[:, 1] / Xc[:, 2] * K[1, 1] + K[1, 2]], -1)


def _cam_poses(C):
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (C, 3, 3)).copy()
    t = np.stack([np.array([0.8 * c - 0.8, 0, 0], np.float32)
                  for c in range(C)])
    return R, t


def test_add_keyframe_snapshots_dynamic_points():
    cfg = small_test_config(num_cameras=3)
    st = init_state(cfg)
    K = np.broadcast_to(np.array([[200.0, 0, 80], [0, 200.0, 60],
                                  [0, 0, 1]], np.float32), (3, 3, 3))
    R, t = _cam_poses(3)
    Xd = np.array([[0.5, 0.1, 6.0], [-0.4, 0.3, 5.0]], np.float32)
    mp = st.mappts
    mp = mp._replace(
        xyz=mp.xyz.at[:2].set(jnp.asarray(Xd)),
        status=mp.status.at[:2].set(ST_ALIVE),
        ptype=mp.ptype.at[:2].set(PT_DYNAMIC))
    tracks = st.tracks
    pos = np.zeros(tracks.pos.shape, np.float32)
    valid = np.zeros(tracks.valid.shape, bool)
    mpt = np.full(tracks.mpt.shape, -1, np.int32)
    for c in range(3):
        pos[c, :2] = _project(K[c], R[c], t[c], Xd)
        valid[c, :2] = True
        mpt[c, :2] = [0, 1]
    st = st._replace(
        tracks=tracks._replace(pos=jnp.asarray(pos), valid=jnp.asarray(valid),
                               mpt=jnp.asarray(mpt)),
        mappts=mp, R=jnp.asarray(R), t=jnp.asarray(t),
        frame=jnp.asarray(7, jnp.int32))
    kfs = steps.add_keyframe(st)
    w = 0
    assert np.allclose(np.asarray(kfs.dyn_xyz[w, :2]), Xd, atol=1e-5)
    assert bool(np.all(np.asarray(kfs.dyn_obs_ok[w, :, :2])))
    assert not bool(np.any(np.asarray(kfs.dyn_obs_ok[w, :, 2:])))
    for c in range(3):
        assert np.allclose(np.asarray(kfs.dyn_obs_px[w, c, :2]),
                           pos[c, :2], atol=1e-5)


def test_dynamic_snapshots_improve_window_ba():
    """With few/clustered static points, a perturbed keyframe recovers
    better when the window also carries dynamic-snapshot observations."""
    rng = np.random.default_rng(3)
    cfg = small_test_config(num_cameras=3)
    C = 3
    W = cfg.cap.ba_window
    n_kf = W + 1
    K = np.broadcast_to(np.array([[200.0, 0, 80], [0, 200.0, 60],
                                  [0, 0, 1]], np.float32), (C, 3, 3))
    R0, t0 = _cam_poses(C)
    # 4 clustered static points (weak pose constraint)
    Xs = np.array([[0.0, 0.0, 5.0], [0.2, 0.0, 5.1],
                   [0.0, 0.2, 4.9], [0.2, 0.2, 5.0]], np.float32)
    n_dyn = 24
    st = init_state(cfg)
    mp = st.mappts
    mp = mp._replace(
        xyz=mp.xyz.at[:4].set(jnp.asarray(Xs)),
        status=mp.status.at[:4].set(ST_ALIVE),
        ptype=mp.ptype.at[:4].set(PT_STATIC),
        first_frame=mp.first_frame.at[:4].set(0))
    st = st._replace(mappts=mp)
    kfs = st.kfs
    rig_t = np.array([0.05, 0.02, -0.03], np.float32)  # rig motion / frame
    true_R = np.zeros((n_kf, C, 3, 3), np.float32)
    true_t = np.zeros((n_kf, C, 3), np.float32)
    for w in range(n_kf):
        Rw, tw = R0.copy(), t0 + w * rig_t
        true_R[w], true_t[w] = Rw, tw
        obs_pos = np.zeros((C, cfg.cap.max_features, 2), np.float32)
        obs_mpt = np.full((C, cfg.cap.max_features), -1, np.int32)
        # spread dynamic points, new positions each keyframe
        Xd = rng.uniform([-2, -1.5, 4], [2, 1.5, 8],
                         (n_dyn, 3)).astype(np.float32)
        dyn_px = np.zeros((C, cfg.p.dyn_max_points, 2), np.float32)
        dyn_ok = np.zeros((C, cfg.p.dyn_max_points), bool)
        for c in range(C):
            obs_pos[c, :4] = _project(K[c], Rw[c], tw[c], Xs)
            obs_mpt[c, :4] = np.arange(4)
            dyn_px[c, :n_dyn] = _project(K[c], Rw[c], tw[c], Xd)
            dyn_ok[c, :n_dyn] = True
        kfs = kfs._replace(
            frame=kfs.frame.at[w].set(w * 3),
            R=kfs.R.at[w].set(jnp.asarray(true_R[w])),
            t=kfs.t.at[w].set(jnp.asarray(true_t[w])),
            obs_pos=kfs.obs_pos.at[w].set(jnp.asarray(obs_pos)),
            obs_mpt=kfs.obs_mpt.at[w].set(jnp.asarray(obs_mpt)),
            obs_gen=kfs.obs_gen.at[w].set(0),
            dyn_xyz=kfs.dyn_xyz.at[w, :n_dyn].set(
                jnp.asarray(Xd + 0.02 * rng.standard_normal((n_dyn, 3))
                            .astype(np.float32))),
            dyn_obs_px=kfs.dyn_obs_px.at[w].set(jnp.asarray(dyn_px)),
            dyn_obs_ok=kfs.dyn_obs_ok.at[w].set(jnp.asarray(dyn_ok)),
            n=kfs.n + 1)
    # perturb the NEWEST keyframe's cameras independently
    wlast = n_kf - 1
    dR = np.eye(3, dtype=np.float32)
    th = 0.03
    pert = np.array([[1, 0, 0], [0, np.cos(th), -np.sin(th)],
                     [0, np.sin(th), np.cos(th)]], np.float32)
    kfs_pert = kfs._replace(
        R=kfs.R.at[wlast, 1].set(jnp.asarray(pert @ true_R[wlast, 1])),
        t=kfs.t.at[wlast].set(jnp.asarray(
            true_t[wlast] + np.array([[0.1, -0.05, 0.08],
                                      [-0.07, 0.12, -0.04],
                                      [0.05, 0.06, 0.1]], np.float32))))
    st = st._replace(kfs=kfs_pert, R=jnp.asarray(true_R[wlast]),
                     t=jnp.asarray(true_t[wlast]),
                     frame=jnp.asarray(wlast * 3, jnp.int32))

    def run(with_dyn: bool):
        s = st
        if not with_dyn:
            s = s._replace(kfs=s.kfs._replace(
                dyn_obs_ok=jnp.zeros_like(s.kfs.dyn_obs_ok)))
        prob, ring, kf_ok = steps.build_ba_table(s, jnp.asarray(K), cfg)
        res = bundle_adjust_table(prob, max_err=10.0, max_iter=3,
                                  inner_iter=20)
        s2 = steps.apply_ba_table_results(s, res, ring, kf_ok, cfg)
        err = np.linalg.norm(
            np.asarray(s2.kfs.t)[wlast] - true_t[wlast], axis=-1).max()
        return err, s2

    e_without, _ = run(False)
    e_with, s2 = run(True)
    assert np.all(np.isfinite(np.asarray(s2.kfs.t)))
    # dynamic snapshots must help (and never hurt) the recovery
    assert e_with <= e_without + 1e-4
    assert e_with < 0.12   # most of the 0.1-0.14 perturbation removed
