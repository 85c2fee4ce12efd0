"""Diagnostic for the mover-crossing rig collapse: track inter-camera
distances over the run."""
import numpy as np
import sys
sys.path.insert(0, "tests")

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import (make_room, render_sequence,
                                     multi_cam_rig, MovingQuad,
                                     make_texture, orbit_trajectory)
from coslam_tpu.slam.pipeline import CoSlamEngine

H, W = 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], np.float32)


def main():
    rng = np.random.default_rng(2)
    planes = make_room(rng, size=10.0)
    C, F = 3, 90
    Rr, tr = orbit_trajectory(F, forward=0.03)
    rot_c, offs_c = multi_cam_rig(C, baseline=0.9)
    Rs_gt = np.zeros((C, F, 3, 3), np.float32)
    ts_gt = np.zeros((C, F, 3), np.float32)
    frames = np.zeros((F, C, H, W), np.float32)
    quad = MovingQuad(center0=np.array([-4.5, 0.3, 6.0], np.float32),
                      velocity=np.array([0.16, 0.0, 0.0], np.float32),
                      eu=np.array([2.6, 0.0, 0.0], np.float32),
                      ev=np.array([0.0, 2.6, 0.0], np.float32),
                      tex=make_texture(rng))
    for f in range(F):
        c_rig = -Rr[f].T @ tr[f]
        for c in range(C):
            center = c_rig + Rr[f].T @ offs_c[c]
            Rc = rot_c[c] @ Rr[f]
            Rs_gt[c, f] = Rc
            ts_gt[c, f] = -Rc @ center
    for c in range(C):
        frames[:, c] = render_sequence(planes, K1, Rs_gt[c], ts_gt[c],
                                       H, W, quads=[quad])
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C),
                       np.zeros((C, 5), np.float32))
    for f in range(F):
        eng.process_frame(frames[f])
        st = eng.stats_log[-1] if eng.stats_log else {}
        R = np.asarray(eng.state.R)
        t = np.asarray(eng.state.t)
        cs = [-R[c].T @ t[c] for c in range(C)]
        gt = [-Rs_gt[c, f].T @ ts_gt[c, f] for c in range(C)]
        d01 = np.linalg.norm(cs[0] - cs[1])
        d12 = np.linalg.norm(cs[1] - cs[2])
        e = [np.linalg.norm(cs[c] - gt[c]) for c in range(C)]
        print(f"f={f:3d} grp={tuple(eng.group_id.tolist())} "
              f"d01={d01:.2f} d12={d12:.2f} "
              f"cerr=[{e[0]:.2f},{e[1]:.2f},{e[2]:.2f}] "
              f"n_inl={st.get('n_inliers')} joint={st.get('joint_pose')} "
              f"nst={st.get('n_static')} ndyn={st.get('n_dynamic')}")
    print("merges:", eng.merge_log)
    print("loops:", eng.loop_log)


if __name__ == "__main__":
    main()
