"""Multi-chip scaling: camera-sharded tracking and distributed Schur BA.

The reference is single-process shared-memory (SURVEY.md §2.7 — pthreads,
OpenMP, one mutex); this package is the NEW architectural layer the TPU
port adds: a `jax.sharding.Mesh` over a 'cam' axis, per-camera state
sharded across devices (tracking / pose / mapping are embarrassingly
camera-parallel), the map replicated, and windowed BA reduced across the
mesh with psum of camera-block Hessians after landmark Schur elimination
(over ICI within a slice).
"""

from coslam_tpu.parallel.mesh import make_cam_mesh, shard_state  # noqa: F401
from coslam_tpu.parallel.dist_ba import dist_bundle_adjust  # noqa: F401
