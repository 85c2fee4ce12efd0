"""Per-segment unknown translation scales in the export chain graph
(the reference's uncertainScale mechanism applied to trajectory export).

Synthetic check: a chain whose middle segment's relative translations are
recorded at half scale, with correct keyframe anchors at both ends — the
scaled solve must stretch the segment onto its anchors; the rigid solve
cannot."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.solvers.pose_graph import (chain_graph, solve_rotations,
                                           solve_translations)


def test_segment_scale_recovers_shrunken_chain():
    F = 21
    rng = np.random.default_rng(0)
    # ground-truth path: straight line with small wiggle
    c_gt = np.stack([np.linspace(0, 2, F),
                     0.05 * np.sin(np.arange(F)),
                     np.zeros(F)], -1).astype(np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (F, 3, 3))
    t_gt = -c_gt  # R = I
    # relative translations, middle segment (frames 5..15) at HALF scale
    t_rel = (t_gt[1:] - t_gt[:-1]).copy()
    t_rel[5:15] *= 0.5
    R_rel = np.broadcast_to(np.eye(3, dtype=np.float32), (F - 1, 3, 3))
    fixed = np.zeros(F, bool)
    fixed[[0, 5, 15, F - 1]] = True
    pg = chain_graph(jnp.asarray(R_rel), jnp.asarray(t_rel.astype(np.float32)),
                     jnp.asarray(fixed), jnp.asarray(R),
                     jnp.asarray(t_gt), jnp.ones(F, bool))
    anchors = np.nonzero(fixed)[0]
    seg = np.searchsorted(anchors, np.arange(F - 1), side="right") - 1
    sg = np.where((np.arange(F - 1) >= anchors[0])
                  & (np.arange(F - 1) < anchors[-1]), seg, -1).astype(np.int32)
    R_sol = solve_rotations(pg)
    # rigid: the shrunken segment cannot reach its anchors smoothly
    t_rigid, _ = solve_translations(pg, R_sol, num_scales=1)
    # scaled: one unknown scale per segment
    pgs = pg._replace(scale_group=jnp.asarray(sg))
    t_scaled, scales = solve_translations(pgs, R_sol,
                                          num_scales=len(anchors) - 1)
    err_rigid = np.linalg.norm(np.asarray(t_rigid) - t_gt, axis=-1)
    err_scaled = np.linalg.norm(np.asarray(t_scaled) - t_gt, axis=-1)
    # middle-of-segment frames are the telling ones
    mid = [8, 10, 12]
    assert err_scaled[mid].max() < 0.02, err_scaled[mid]
    assert err_scaled[mid].max() < 0.3 * err_rigid[mid].max()
    # the middle segment's scale is recovered (~2x to undo the half-scale)
    s = np.asarray(scales)
    assert abs(s[1] - 2.0) < 0.1, s


def test_segmented_chain_matches_dense():
    """solve_chain_segments == dense chain solve (up to the soft-anchor
    weight) on a drifting chain with periodic anchors."""
    import numpy as np
    import jax.numpy as jnp
    from coslam_tpu.geometry.se3 import so3_exp
    from coslam_tpu.solvers.pose_graph import (chain_graph, solve_rotations,
                                               solve_translations,
                                               solve_chain_segments)
    rng = np.random.default_rng(2)
    F = 61
    R_gt = np.zeros((F, 3, 3), np.float32)
    t_gt = np.zeros((F, 3), np.float32)
    R_gt[0] = np.eye(3)
    for f in range(1, F):
        w = 0.02 * rng.standard_normal(3).astype(np.float32)
        dR = np.asarray(so3_exp(jnp.asarray(w)))
        R_gt[f] = dR @ R_gt[f - 1]
        t_gt[f] = t_gt[f - 1] + 0.1 * rng.standard_normal(3)
    # noisy relative edges (drift)
    R_rel = np.zeros((F - 1, 3, 3), np.float32)
    t_rel = np.zeros((F - 1, 3), np.float32)
    for f in range(F - 1):
        nR = np.asarray(so3_exp(jnp.asarray(
            0.01 * rng.standard_normal(3).astype(np.float32))))
        R_rel[f] = nR @ R_gt[f + 1] @ R_gt[f].T
        t_rel[f] = t_gt[f + 1] - R_rel[f] @ t_gt[f] \
            + 0.01 * rng.standard_normal(3)
    fixed = np.zeros(F, bool)
    fixed[::7] = True
    fixed[0] = fixed[-1] = True
    fixed_R = R_gt.copy()
    fixed_t = t_gt.copy()
    pg = chain_graph(jnp.asarray(R_rel), jnp.asarray(t_rel),
                     jnp.asarray(fixed), jnp.asarray(fixed_R),
                     jnp.asarray(fixed_t), jnp.ones(F, bool))
    R_d = np.asarray(solve_rotations(pg))
    t_d, _ = solve_translations(pg, jnp.asarray(R_d), num_scales=1)
    t_d = np.asarray(t_d)
    R_s, t_s = solve_chain_segments(R_rel, t_rel, fixed, fixed_R, fixed_t)
    assert np.abs(R_s - R_d).max() < 5e-3
    assert np.abs(t_s - t_d).max() < 5e-3
