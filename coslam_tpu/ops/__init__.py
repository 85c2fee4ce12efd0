"""Tracking front-end ops: batched image kernels.

TPU-native replacement for the reference's Cg/OpenGL GPGPU runtime
(src/tracking/CGKLT/ — SURVEY.md §2.1): Gaussian pyramids with
derivatives, iterative coarse-to-fine KLT with per-feature gain,
structure-tensor corner detection with NMS + top-k, and NCC appearance
blocks. Everything is batched over a leading camera axis and written so
XLA can fuse/tile it (convs for pyramids, matmuls for NCC); a Pallas
path is used where fusion alone is not enough.
"""

from coslam_tpu.ops.pyramid import build_pyramid, Pyramid  # noqa: F401
from coslam_tpu.ops.patches import sample_bilinear, extract_patches  # noqa: F401
from coslam_tpu.ops.klt import klt_track, KLTResult  # noqa: F401
from coslam_tpu.ops.corners import detect_corners, cornerness_map  # noqa: F401
from coslam_tpu.ops.ncc import extract_ncc_blocks, ncc_score_matrix  # noqa: F401
