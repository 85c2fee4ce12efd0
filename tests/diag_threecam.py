"""Diagnostic for test_three_cam_ate's cam2 drift: replicate the exact
fixture and log per-frame per-camera center error, inliers, coverage."""
import os
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import sys
sys.path.insert(0, "tests")

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, orbit_trajectory,
                                     render_sequence, multi_cam_rig,
                                     MovingQuad, make_texture)
from coslam_tpu.io.ate import ate_rmse
from coslam_tpu.slam.pipeline import CoSlamEngine

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)


def render_rig(rng, C, F, baseline, quads=None, forward=0.05):
    planes = make_room(rng, size=10.0)
    Rr, tr = orbit_trajectory(F, forward=forward)
    rot_c, offs_c = multi_cam_rig(C, baseline=baseline)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
    for c in range(C):
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c], H, W,
                                       quads=quads)
    return frames, Rs_gt, ts_gt


def main():
    rng = np.random.default_rng(0)
    quad = MovingQuad(center0=np.array([-3.0, 0.5, 13.0], dtype=np.float32),
                      velocity=np.array([0.12, 0.0, 0.0], dtype=np.float32),
                      eu=np.array([2.2, 0.0, 0.0], dtype=np.float32),
                      ev=np.array([0.0, 2.2, 0.0], dtype=np.float32),
                      tex=make_texture(rng))
    C, F = 3, 50
    frames, Rs_gt, ts_gt = render_rig(rng, C=C, F=F, baseline=0.9,
                                      quads=[quad])
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))
    orig_run_ba = eng._run_ba

    def patched_run_ba(*a, **k):
        pre_R = np.asarray(eng.state.R).copy()
        pre_t = np.asarray(eng.state.t).copy()
        orig_run_ba(*a, **k)
        post_R = np.asarray(eng.state.R)
        post_t = np.asarray(eng.state.t)
        f = eng.frame
        dc = []
        for c in range(C):
            c_pre = -pre_R[c].T @ pre_t[c]
            c_post = -post_R[c].T @ post_t[c]
            dc.append(float(np.linalg.norm(c_post - c_pre)))
        print(f"   [BA @f={f}] center_delta=" +
              "[" + ",".join(f"{x:.3f}" for x in dc) + "]", flush=True)
    eng._run_ba = patched_run_ba
    orig_cad = eng._host_cadence

    def patched_cad(pyr, fsv, frame=None):
        R = np.asarray(eng.state.R)
        t = np.asarray(eng.state.t)
        f = eng.frame
        cs = [-R[c].T @ t[c] for c in range(C)]
        gt = [-Rs_gt[c, min(f, F - 1)].T @ ts_gt[c, min(f, F - 1)]
              for c in range(C)]
        e = [float(np.linalg.norm(cs[c] - gt[c])) for c in range(C)]
        print(f"   [post-step f={f}] cerr=[" +
              ",".join(f"{x:.3f}" for x in e) + "]", flush=True)
        return orig_cad(pyr, fsv, frame=frame) if frame is not None \
            else orig_cad(pyr, fsv)
    eng._host_cadence = patched_cad
    for f in range(F):
        eng.process_frame(frames[f])
        st = eng.stats_log[-1] if eng.stats_log else {}
        R = np.asarray(eng.state.R)
        t = np.asarray(eng.state.t)
        cs = [-R[c].T @ t[c] for c in range(C)]
        gt = [-Rs_gt[c, f].T @ ts_gt[c, f] for c in range(C)]
        e = [float(np.linalg.norm(cs[c] - gt[c])) for c in range(C)]
        # per-cam feature stats: valid count, static-bound count
        tr_ = eng.state.tracks
        valid = np.asarray(tr_.valid)
        mpt = np.asarray(tr_.mpt)
        status = np.asarray(eng.state.mappts.status)
        ptype = np.asarray(eng.state.mappts.ptype)
        nstat = []
        for c in range(C):
            bound = valid[c] & (mpt[c] >= 0)
            sl = mpt[c][bound]
            nstat.append(int(((status[sl] == 1) & (ptype[sl] == 0)).sum())
                         if sl.size else 0)
        # count static-bound features inside the gt-projected quad region
        qc = np.asarray(quad.center0) + f * np.asarray(quad.velocity)
        nquad = []
        pos = np.asarray(tr_.pos)
        for c in range(C):
            Xc = Rs_gt[c, f] @ qc + ts_gt[c, f]
            if Xc[2] <= 0.1:
                nquad.append(-1)
                continue
            u = Xc[0] / Xc[2] * K1[0, 0] + K1[0, 2]
            v = Xc[1] / Xc[2] * K1[1, 1] + K1[1, 2]
            half = 1.3 / Xc[2] * K1[0, 0]
            bound = valid[c] & (mpt[c] >= 0)
            sl = mpt[c][bound]
            instat = (status[sl] == 1) & (ptype[sl] == 0)
            pq = pos[c][bound][instat]
            nquad.append(int(((np.abs(pq[:, 0] - u) < half)
                              & (np.abs(pq[:, 1] - v) < half)).sum()))
        ni = st.get("n_inliers")
        print(f"f={f:3d} cerr=[{e[0]:.3f},{e[1]:.3f},{e[2]:.3f}] "
              f"nstat={nstat} nquad={nquad} "
              f"nnew={st.get('n_new_points')} nic={st.get('n_intercam_points')} "
              f"n_inl={ni} "
              f"kf={int(eng.kf_frames[-1]) == f if eng.kf_frames else False}",
              flush=True)
    dump = {}
    for c in range(C):
        Rs, ts = eng.trajectory(c, True)
        ate = ate_rmse(Rs, ts, Rs_gt[c], ts_gt[c])
        print(f"cam{c} ATE={ate:.4f}")
        dump[f"est_R.{c}"] = Rs
        dump[f"est_t.{c}"] = ts
        Rr, tr = eng.trajectory(c, False)
        dump[f"raw_R.{c}"] = Rr
        dump[f"raw_t.{c}"] = tr
    dump["gt_R"] = Rs_gt
    dump["gt_t"] = ts_gt
    dump["kf_frames"] = np.array(eng.kf_frames)
    dump["kfs_frame"] = np.asarray(eng.state.kfs.frame)
    dump["kfs_R"] = np.asarray(eng.state.kfs.R)
    dump["kfs_t"] = np.asarray(eng.state.kfs.t)
    dump["kfs_n"] = np.asarray(eng.state.kfs.n)
    np.savez("/tmp/threecam_dump.npz", **dump)
    print("merges:", eng.merge_log)
    print("loops:", eng.loop_log)
    print("kf_frames:", eng.kf_frames)


if __name__ == "__main__":
    main()
