"""Numeric geometry substrate.

Re-implements (as batched JAX numerics) the LibVisualSLAM surface the
reference depends on but does not vendor (SURVEY.md §2.9): SO(3)/SE(3)
maps, camera projection + radial-tangential distortion, two-/multi-view
triangulation with covariances, E/F estimation with batched RANSAC, PnP,
and robust weight functions.
"""

from coslam_tpu.geometry.se3 import (  # noqa: F401
    so3_exp, so3_log, se3_exp, se3_log, project_to_so3, so3_hat,
)
from coslam_tpu.geometry.camera import (  # noqa: F401
    Intrinsics, project_points, distort_normalized, undistort_points,
    normalize_points, camera_center, projection_cov,
)
from coslam_tpu.geometry.triangulate import (  # noqa: F401
    triangulate_two_view, triangulate_multiview, triangulation_cov,
    reproj_errors, seq_triangulate_update, is_at_camera_back,
)
from coslam_tpu.geometry.robust import tukey_weight, huber_weight  # noqa: F401
