"""Fused Pallas pyramid level vs the XLA shift-add reference (interpret
mode on CPU; the same kernel runs compiled on TPU)."""

import numpy as np
import jax.numpy as jnp

from coslam_tpu.ops.image import gaussian_blur, sobel_derivatives
from coslam_tpu.ops.pyramid_pallas import pyramid_level_pallas


def test_level_matches_xla_interior():
    rng = np.random.default_rng(0)
    for (H, W) in [(120, 160), (64, 128), (130, 200)]:
        img = jnp.asarray(rng.uniform(0, 255, (2, H, W)), jnp.float32)
        sm_ref = gaussian_blur(img)
        dx_ref, dy_ref = sobel_derivatives(sm_ref)
        sm, dx, dy = pyramid_level_pallas(img, interpret=True)
        # blurred image agrees everywhere; derivatives agree in the
        # interior (the outermost 1-px frame uses a different edge
        # convention — documented in ops/pyramid.py)
        assert np.abs(np.asarray(sm) - np.asarray(sm_ref)).max() < 1e-3
        for a, b in [(dx, dx_ref), (dy, dy_ref)]:
            d = np.abs(np.asarray(a) - np.asarray(b))
            assert d[:, 1:-1, 1:-1].max() < 1e-3
        # blur-only variant (levels >= 1 skip the derivative outputs)
        sm2 = pyramid_level_pallas(img, interpret=True, derivs=False)
        assert np.array_equal(np.asarray(sm2), np.asarray(sm))
