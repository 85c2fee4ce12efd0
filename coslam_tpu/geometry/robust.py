"""Robust M-estimator weight functions (Tukey biweight, Huber).

The reference wraps its LM pose solver in Tukey-biweight IRLS with
tau = Param::maxErr (SL_IntraCamPose.cpp:640-655,687-703) and its robust
BA reweights with outlier flags (bundleAdjustRobust contract,
SL_CoSLAMRobustBA.cpp:174,296-309).
"""

from __future__ import annotations

import jax.numpy as jnp


def tukey_weight(r: jnp.ndarray, tau: float) -> jnp.ndarray:
    """IRLS weight for residual magnitude r: (1 - (r/tau)^2)^2, 0 beyond tau."""
    u = r / tau
    w = jnp.square(1.0 - jnp.square(u))
    return jnp.where(jnp.abs(u) < 1.0, w, 0.0)


def huber_weight(r: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight: 1 inside delta, delta/|r| outside."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))
