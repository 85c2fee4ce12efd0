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
