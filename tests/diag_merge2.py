"""Diagnostic for the split/merge scenario (test_pipeline_merge fixture)."""
import numpy as np
import jax.numpy as jnp
import sys
sys.path.insert(0, "tests")

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render
from coslam_tpu.geometry.se3 import so3_exp
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.slam.grouping import view_overlap_counts

C, H, W = 2, 150, 200
K1 = np.array([[180.0, 0, 100], [0, 180.0, 75], [0, 0, 1]], dtype=np.float32)
F = 100


def _yaw1(f):
    if f < 20:
        return 0.0
    if f < 40:
        return 0.9 * (f - 20) / 20
    if f < 55:
        return 0.9
    if f < 75:
        return 0.9 * (75 - f) / 20
    return 0.0


def main():
    rng = np.random.default_rng(1)
    planes = make_room(rng, size=10.0)
    frames = np.zeros((F, C, H, W), np.float32)
    gt_c = np.zeros((F, C, 3))
    gt_R = np.zeros((F, C, 3, 3))
    for f in range(F):
        base_c = np.array([0.0, 0.0, 0.02 * f], dtype=np.float32)
        for c in range(C):
            yaw = _yaw1(f) if c == 1 else 0.0
            Rc = np.asarray(so3_exp(jnp.array([0.0, yaw, 0.0],
                                              dtype=jnp.float32)))
            center = base_c + np.array([c * 1.0 - 0.5, 0, 0],
                                       dtype=np.float32)
            frames[f, c] = np.asarray(render(planes, K1, Rc, -Rc @ center,
                                             H, W))
            gt_c[f, c] = center
            gt_R[f, c] = Rc
    cfg = small_test_config(num_cameras=C, h=H, w=W)
    eng = CoSlamEngine(cfg, np.stack([K1] * C), np.zeros((C, 5), np.float32))

    # instrument every merge gate
    import coslam_tpu.slam.merge as mg
    import coslam_tpu.slam.pipeline as pl
    orig_mg = mg.merge_groups
    orig_mc = mg.merge_candidates

    def mc_dbg(state, cfg2, K2, gid):
        out = orig_mc(state, cfg2, K2, gid)
        print(f"  [cand f={int(state.frame)}] gid={tuple(gid.tolist())} "
              f"cands={[(c.cam_a, c.cam_b, c.overlap) for c in out]}")
        return out

    def mg_dbg(state, cfg2, pyr, K2, kc2, gid, cand, f_sep=None):
        res = orig_mg(state, cfg2, pyr, K2, kc2, gid, cand, f_sep=f_sep)
        print(f"  [merge f={int(state.frame)}] a={cand.cam_a} b={cand.cam_b}"
              f" f_sep={f_sep} ok={res.ok} noop={res.noop} "
              f"n_matches={res.n_matches} scale={res.scale:.3f} "
              f"s_move={res.scale_move:.3f}")
        return res

    mg.merge_groups = mg_dbg
    mg.merge_candidates = mc_dbg

    from coslam_tpu.slam import steps as steps_mod
    orig_apply = steps_mod.apply_ba_table_results

    def apply_dbg(state, res, ring, kf_ok, cfg3, gen0=None):
        out = orig_apply(state, res, ring, kf_ok, cfg3, gen0)
        dR = float(jnp.max(jnp.abs(out.kfs.R - state.kfs.R)))
        dt = float(jnp.max(jnp.abs(out.kfs.t - state.kfs.t)))
        dl = float(jnp.max(jnp.abs(out.R - state.R)))
        print(f"  [BA apply f={int(state.frame)}] dkfR={dR:.4f} "
              f"dkft={dt:.4f} dliveR={dl:.4f}")
        return out

    steps_mod.apply_ba_table_results = apply_dbg
    pl.steps.apply_ba_table_results = apply_dbg
    for f in range(F):
        eng.process_frame(frames[f])
        st = eng.stats_log[-1] if eng.stats_log else {}
        sh, ar = view_overlap_counts(eng.state)
        sh = np.asarray(sh)
        ar = np.asarray(ar)
        R = np.asarray(eng.state.R)
        t = np.asarray(eng.state.t)
        cerr = [np.linalg.norm(-R[c].T @ t[c] - gt_c[f, c]) for c in range(C)]
        aerr = [np.degrees(np.arccos(np.clip(
            (np.trace(R[c] @ gt_R[f, c].T) - 1) / 2, -1, 1)))
            for c in range(C)]
        cover = min(ar[0, 1], ar[1, 0]) / (H * W)
        print(f"f={f:3d} grp={tuple(eng.group_id.tolist())} "
              f"sh01={sh[0, 1]:.0f} cover={cover:.2f} "
              f"n_inl={st.get('n_inliers')} "
              f"cerr=[{cerr[0]:.2f},{cerr[1]:.2f}] "
              f"aerr=[{aerr[0]:.1f},{aerr[1]:.1f}]")
    print("merge_log:", eng.merge_log)


if __name__ == "__main__":
    main()
