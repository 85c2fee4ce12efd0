"""Merge-time joint wide-window BA (genMergeInfoVer2's local robust BA
role, SL_MergeCameraGroup.cpp:557-725,646-647): at a committed merge the
polish BA widens to ``merge_ba_window`` keyframes so mid-separation
keyframes — outside the default ba_window — absorb the separation-era
drift instead of keeping it."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from coslam_tpu.config import small_test_config
from coslam_tpu.slam import steps
from coslam_tpu.slam.state import init_state, ST_ALIVE, PT_STATIC
from coslam_tpu.solvers.ba import bundle_adjust_table
from coslam_tpu.geometry.se3 import so3_exp


W_TOTAL = 10          # keyframes in the store
PERTURB = range(3, 8)  # mid-window keyframes carrying "separation drift"


def _drifted_state(rng):
    """A 1-camera state whose keyframe ring holds W_TOTAL keyframes with
    ground-truth observations; keyframes 3..7 and the points carry a pose
    perturbation (the drift a rigid merge realignment leaves behind)."""
    cfg = small_test_config(num_cameras=1)
    cfg = cfg.replace(cap=dataclasses.replace(cfg.cap, ba_window=5,
                                              max_keyframes=16))
    st = init_state(cfg)
    K1 = np.array([[200.0, 0, 80], [0, 200.0, 60], [0, 0, 1]], np.float32)
    P_use = 60
    X = rng.uniform(-2, 2, (P_use, 3)).astype(np.float32)
    X[:, 2] += 8
    R_gt, t_gt = [], []
    for m in range(W_TOTAL):
        w = 0.03 * rng.standard_normal(3).astype(np.float32)
        R_gt.append(np.asarray(so3_exp(jnp.asarray(w))))
        t_gt.append(np.array([0.25 * m, 0, 0], np.float32))
    kfs = st.kfs
    frame_ids = np.arange(W_TOTAL, dtype=np.int32) * 4
    Rk = np.asarray(kfs.R).copy()
    tk = np.asarray(kfs.t).copy()
    obs_pos = np.asarray(kfs.obs_pos).copy()
    obs_mpt = np.asarray(kfs.obs_mpt).copy()
    fr = np.asarray(kfs.frame).copy()
    for m in range(W_TOTAL):
        Rm, tm = R_gt[m], t_gt[m]
        if m in PERTURB:        # drift: rotation + translation offset
            dR = np.asarray(so3_exp(jnp.asarray(
                np.array([0.0, 0.02 * (m - 2), 0.0], np.float32))))
            Rm = dR @ Rm
            tm = tm + np.array([0.05 * (m - 2), 0, 0], np.float32)
        Rk[m, 0] = Rm
        tk[m, 0] = tm
        fr[m] = frame_ids[m]
        Xc = X @ R_gt[m].T + t_gt[m]       # observations from TRUTH
        u = Xc[:, 0] / Xc[:, 2] * 200 + 80
        v = Xc[:, 1] / Xc[:, 2] * 200 + 60
        obs_pos[m, 0, :P_use, 0] = u
        obs_pos[m, 0, :P_use, 1] = v
        obs_mpt[m, 0, :P_use] = np.arange(P_use)
    kfs = kfs._replace(frame=jnp.asarray(fr), R=jnp.asarray(Rk),
                       t=jnp.asarray(tk), obs_pos=jnp.asarray(obs_pos),
                       obs_mpt=jnp.asarray(obs_mpt),
                       n=jnp.asarray(W_TOTAL, jnp.int32))
    mp = st.mappts
    Xp = (X + 0.03 * rng.standard_normal(X.shape)).astype(np.float32)
    mp = mp._replace(
        xyz=mp.xyz.at[:P_use].set(jnp.asarray(Xp)),
        status=mp.status.at[:P_use].set(ST_ALIVE),
        ptype=mp.ptype.at[:P_use].set(PT_STATIC),
        first_frame=mp.first_frame.at[:P_use].set(jnp.asarray(frame_ids[1])))
    st = st._replace(kfs=kfs, mappts=mp,
                     R=jnp.asarray(R_gt[-1][None]),
                     t=jnp.asarray(t_gt[-1][None]),
                     frame=jnp.asarray(int(frame_ids[-1]), jnp.int32))
    return cfg, st, np.stack(R_gt), np.stack(t_gt), K1


def _kf_err(state, R_gt, t_gt):
    """Max rotation-entry error of the perturbed keyframes."""
    errs = []
    for m in PERTURB:
        errs.append(np.abs(np.asarray(state.kfs.R[m, 0]) - R_gt[m]).max()
                    + np.abs(np.asarray(state.kfs.t[m, 0]) - t_gt[m]).max())
    return float(np.max(errs))


def _run(state, K1, cfg, window):
    prob, ring, kf_ok = steps.build_ba_table(
        state, jnp.asarray(K1[None]), cfg, window=window)
    res = bundle_adjust_table(prob, max_err=cfg.p.max_err,
                              max_iter=2, inner_iter=30)
    return steps.apply_ba_table_results(state, res, ring, kf_ok, cfg)


def test_wide_window_corrects_mid_separation_keyframes(rng):
    cfg, st, R_gt, t_gt, K1 = _drifted_state(rng)
    err0 = _kf_err(st, R_gt, t_gt)
    assert err0 > 0.05                       # perturbation is real
    # default window (5 keyframes): the drifted keyframes 3..4 lie
    # OUTSIDE the window and keep their drift
    st_narrow = _run(st, K1, cfg, window=None)
    # wide merge window covers all of them
    st_wide = _run(st, K1, cfg, window=cfg.p.merge_ba_window)
    err_narrow = _kf_err(st_narrow, R_gt, t_gt)
    err_wide = _kf_err(st_wide, R_gt, t_gt)
    assert err_wide < 0.2 * err0, (err0, err_wide)
    assert err_wide < 0.5 * err_narrow, (err_narrow, err_wide)
    # narrow window cannot have fixed keyframe 3 (outside its span)
    e3 = np.abs(np.asarray(st_narrow.kfs.R[3, 0]) - R_gt[3]).max()
    assert e3 > 0.01
