"""Optimization solvers: per-camera pose IRLS-LM, windowed Schur BA,
linear pose-graph alignment, joint multi-camera robust pose.

These replace the reference's SL_IntraCamPose LM solver, sba-1.6 /
bundleAdjustRobust sparse BA, and the GlobalPoseGraph sparse linear
solver (SURVEY.md §2.4-2.5) with batched dense device-side solves:
the problems are small (<=13 cameras x small windows) and map onto
TPU matmuls far better than sparse factorization.
"""

from coslam_tpu.solvers.pose import irls_pose, IRLSPoseResult  # noqa: F401
from coslam_tpu.solvers.ba import bundle_adjust, BAProblem, BAResult  # noqa: F401
from coslam_tpu.solvers.pose_graph import (  # noqa: F401
    solve_rotations, solve_translations, PoseGraph,
)
