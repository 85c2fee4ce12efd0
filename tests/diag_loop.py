"""Diagnostic: why does the loop-closure scenario never commit a closure?

Instruments the exact test_loop_closure scenario: dormant-point counts,
candidate-scan output, find_loop_candidates results, and close_loop gate
outcomes at every GROUPING_INTERVAL frame.

Run: JAX_PLATFORMS=cpu python tests/diag_loop.py
"""
import dataclasses

import numpy as np

from coslam_tpu.config import small_test_config
from coslam_tpu.io.synthetic import make_room, render_sequence
from coslam_tpu.slam.pipeline import CoSlamEngine
from coslam_tpu.slam.state import ST_ALIVE, ST_FALSE, PT_STATIC

import sys
sys.path.insert(0, "tests")
from test_loop_closure import yaw_sweep_trajectory, H, W, KMAT


def main():
    rng = np.random.default_rng(0)
    cfg = small_test_config(num_cameras=1, h=H, w=W)
    cfg = cfg.replace(p=dataclasses.replace(
        cfg.p, loop_dormant_age=30, loop_min_interval=20,
        loop_overlap_min=12, loop_min_inliers=7))
    kc = np.zeros((1, 5), dtype=np.float32)
    planes = make_room(rng, size=10.0)
    F = 88
    Rs_gt, ts_gt = yaw_sweep_trajectory(F)
    frames = render_sequence(planes, KMAT[0], Rs_gt, ts_gt, H, W)
    eng = CoSlamEngine(cfg, KMAT, kc)

    import coslam_tpu.slam.loop as loop_mod
    orig_close = loop_mod.close_loop

    def close_loop_dbg(state, cfg2, pyr, K, kc2, gid, c, **kw):
        res = orig_close(state, cfg2, pyr, K, kc2, gid, c, **kw)
        print(f"  close_loop cam={c}: ok={res.ok} n_inl={res.n_inliers}")
        return res

    loop_mod.close_loop = close_loop_dbg
    # pipeline imports close_loop inside _try_loop_closure, so patching the
    # module attribute is enough

    # track who kills points: classify vs BA writeback
    from coslam_tpu.slam.state import ST_FALSE as _SF
    orig_run_ba = eng._run_ba

    def run_ba_dbg(*a, **kw):
        before = int(np.asarray(eng.state.mappts.status == _SF).sum())
        out = orig_run_ba(*a, **kw)
        eng._apply_pending_ba() if eng._pending_ba is not None else None
        after = int(np.asarray(eng.state.mappts.status == _SF).sum())
        if after != before:
            print(f"  [BA] f={eng.frame} false {before} -> {after}")
        return out

    eng._run_ba = run_ba_dbg

    import coslam_tpu.slam.pipeline as pl
    orig_classify = pl.steps.classify_and_lifecycle \
        if hasattr(pl.steps, 'classify_and_lifecycle') else None

    for f in range(F):
        eng.process_frame(frames[f][None])
        st = eng.stats_log[-1] if eng.stats_log else {}
        R = np.asarray(eng.state.R[0])
        t = np.asarray(eng.state.t[0])
        c_est = -R.T @ t
        c_gt = -Rs_gt[f].T @ ts_gt[f]
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(R @ Rs_gt[f].T) - 1) / 2, -1, 1)))
        print(f"  f={f:3d} n_inl={st.get('n_inliers')} "
              f"kf={st.get('keyframe', False)} "
              f"c_err={np.linalg.norm(c_est - c_gt):.3f} ang_err={ang:.2f}")
        if f % 5 == 0 or f > 55:
            mp = eng.state.mappts
            alive = np.asarray(mp.status == ST_ALIVE)
            static = np.asarray(mp.ptype == PT_STATIC)
            last = np.asarray(mp.last_obs)
            dorm = alive & static & (f - last >= cfg.p.loop_dormant_age)
            n_false = int(np.asarray(mp.status == ST_FALSE).sum())
            from coslam_tpu.slam.loop import find_loop_candidates
            cands = find_loop_candidates(eng.state, cfg, np.asarray(eng.K))
            print(f"f={f:3d} alive={int(alive.sum()):4d} "
                  f"alive&static={int((alive & static).sum()):4d} "
                  f"dormant={int(dorm.sum()):4d} false={n_false:4d} "
                  f"cands={cands} loops={len(eng.loop_log)}")
    print("loop_log:", eng.loop_log)


if __name__ == "__main__":
    main()
