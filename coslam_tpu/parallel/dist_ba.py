"""Distributed windowed BA: observation-sharded Schur reduction with psum.

The observation axis (keyframe-window observations, naturally grouped by
camera) is sharded across the mesh; each device accumulates its local
camera/landmark normal-equation blocks, the blocks are psum-reduced over
ICI, and the small dense reduced camera system is solved replicated on
every device (cheapest: it is only [6M, 6M]). This is the BASELINE.json
target topology: "distributed bundle adjustment via Schur-complement
reduction over ICI collectives (psum of camera-block Hessians after
marginalizing landmarks)".

Implementation: ``bundle_adjust(axis_name=...)`` already psums its
reductions; this module wraps it in shard_map with the right specs.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from coslam_tpu.solvers.ba import (BAProblem, BAResult, bundle_adjust,
                                   BATableProblem, BATableResult,
                                   bundle_adjust_table)


def dist_bundle_adjust(prob: BAProblem, mesh: Mesh, max_err: float = 10.0,
                       max_iter: int = 2, inner_iter: int = 10) -> BAResult:
    """Run the windowed BA with observations sharded over mesh axis 'cam'.

    Requires prob.obs_* leading dim divisible by the mesh size (pad with
    obs_valid=False). Parameters (K/R/t/X/fixed masks) are replicated;
    per-observation outputs come back sharded the same way.
    """
    obs_sharded = P("cam")
    rep = P()
    in_specs = BAProblem(
        K=rep, R=rep, t=rep, X=rep,
        obs_cam=obs_sharded, obs_pt=obs_sharded, obs_px=obs_sharded,
        obs_valid=obs_sharded, cam_fixed=rep, point_fixed=rep)
    out_specs = BAResult(R=rep, t=rep, X=rep,
                         obs_outlier=obs_sharded, obs_err=obs_sharded,
                         cost=rep)

    fn = shard_map(
        partial(bundle_adjust, max_err=max_err, max_iter=max_iter,
                inner_iter=inner_iter, axis_name="cam"),
        mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False)
    return fn(prob)


def dist_bundle_adjust_table(prob: BATableProblem, mesh: Mesh,
                             max_err: float = 10.0, max_iter: int = 2,
                             inner_iter: int = 10) -> BATableResult:
    """Distributed dense-table BA: the POINT axis shards over mesh axis
    'cam'; each device eliminates its landmark blocks locally, the reduced
    [6S, 6S] camera system and rhs are psum-reduced over ICI, the dense
    solve replicates, back-substitution stays local. This is the fast-path
    equivalent of ``dist_bundle_adjust`` (which shards the observation
    list); the table form is what the engine's windowed BA uses.

    Requires P divisible by the mesh size (pad with obs_valid=False and
    point_fixed=True).
    """
    shard_p = P("cam")
    rep = P()
    in_specs = BATableProblem(
        K=rep, R=rep, t=rep,
        X=shard_p,
        obs_px=P(None, None, "cam"), obs_valid=P(None, "cam"),
        cam_fixed=rep, point_fixed=shard_p)
    out_specs = BATableResult(
        R=rep, t=rep, X=shard_p,
        obs_outlier=P(None, "cam"), obs_err=P(None, "cam"), cost=rep,
        obs_valid=P(None, "cam"))
    fn = shard_map(
        partial(bundle_adjust_table, max_err=max_err, max_iter=max_iter,
                inner_iter=inner_iter, axis_name="cam"),
        mesh=mesh, in_specs=(in_specs,), out_specs=out_specs,
        check_vma=False)
    return fn(prob)
