"""Robust-cost utilities: Huber IRLS weights, chi-squared gates, MAD.

TPU-native equivalent of g2o's `RobustKernelHuber`
(reference Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp) and the
`vector_mad` helper (reference include/auxiliar.h:90-106). The optimizer
uses iteratively-reweighted least squares: each residual block gets weight
w = rho'(chi2) which for Huber is min(1, delta / |r|).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight for Huber loss given squared error chi2 = ||r||^2."""
    r = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    return jnp.minimum(1.0, delta / r)


def huber_cost(chi2: jnp.ndarray, delta: float) -> jnp.ndarray:
    """rho(chi2): quadratic inside delta, linear outside."""
    r = jnp.sqrt(jnp.maximum(chi2, 0.0))
    quad = chi2
    lin = 2.0 * delta * r - delta * delta
    return jnp.where(r <= delta, quad, lin)


def mad_sigma(x: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Robust sigma estimate 1.4826 * median(|x - median(x)|) over masked values.

    Mirrors `vector_mad` (reference include/auxiliar.h:90-106), used by the
    line matcher's ratio test (LSDmatcher.cpp:168-180). Masked-out entries
    are replaced by the median so they do not perturb the estimate.
    """
    if mask is None:
        med = jnp.median(x)
        return 1.4826 * jnp.median(jnp.abs(x - med))
    big = jnp.where(mask, x, jnp.nan)
    med = jnp.nanmedian(big)
    dev = jnp.where(mask, jnp.abs(x - med), jnp.nan)
    return 1.4826 * jnp.nanmedian(dev)


__all__ = ["huber_weight", "huber_cost", "mad_sigma"]
