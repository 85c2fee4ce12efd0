"""coslam_tpu — TPU-native collaborative visual SLAM.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of CoSLAM
(Zou & Tan, TPAMI 2013; reference C++/Cg implementation surveyed in
/root/repo/SURVEY.md): N synchronized freely-moving cameras jointly
estimating egomotion plus a 3D map of static and dynamic points, with
camera groups that split and merge over time.

Architecture (deliberately NOT a port of the reference):
  - pointer-linked lists      -> fixed-capacity SoA arrays + validity masks
  - Cg fragment shaders       -> batched XLA ops / Pallas kernels over [C,H,W]
  - per-camera C++ loops      -> vmapped / sharded camera axis
  - sba/LAPACK sparse BA      -> batched device-side LM with dense Schur
                                 complement over landmark blocks
  - pthreads + global mutex   -> pure functional step with explicit state
  - (new) multi-host scaling  -> jax.sharding Mesh, psum of camera-block
                                 Hessians over ICI
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry (SE(3), triangulation, LM/BA solves) needs true f32 matmuls; the
# TPU default lowers f32 matmuls to bf16 passes, which breaks rotation
# orthonormality at the 1e-4 level. Hot image/matching kernels that tolerate
# low precision request it explicitly at their call sites.
_jax.config.update("jax_default_matmul_precision", "highest")

from coslam_tpu.config import SlamConfig, small_test_config  # noqa: F401


def __getattr__(name):
    # lazy: CoSlamEngine pulls the whole pipeline stack; keep bare
    # `import coslam_tpu` light for tooling
    if name == "CoSlamEngine":
        from coslam_tpu.slam.pipeline import CoSlamEngine
        return CoSlamEngine
    raise AttributeError(name)
