"""Robust reweighting for BRDF fits (IRLS) + sensor-saturation masking.

The reference fit raw 8-bit intensities with plain least squares
(``brdfdata.cpp:945-960``), so cast shadows, interreflections, and clipped
(saturated) pixels pull the fit arbitrarily. This module adds the standard
remedies as framework features:

- :func:`saturation_weights` — zero-weight measurements at the sensor ceiling
  (their true radiance is unknown, only a lower bound).
- :func:`robust_weights` — Huber / Cauchy / Tukey ψ-weights from residuals,
  scaled by a per-texel MAD, for iteratively-reweighted least squares: fit,
  reweight, warm-start refit. Shadowed views (model ≫ measurement impossible
  under the lobe, measurement ≈ 0) downweight automatically.

All functions are elementwise/jittable and compose with both the lax solver
and the Pallas kernel (weights are an input of both).
"""

from __future__ import annotations

import jax.numpy as jnp

_MAD_TO_SIGMA = 1.4826


def saturation_weights(
    intensity: jnp.ndarray, threshold: float = 0.98
) -> jnp.ndarray:
    """1.0 for trustworthy measurements, 0.0 at/above the sensor ceiling."""
    return (intensity < threshold).astype(intensity.dtype)


def _sigma(residuals: jnp.ndarray, weights: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Per-texel robust scale: weighted median absolute residual × 1.4826."""
    r = jnp.abs(residuals)
    # masked median via sorting with +inf on masked entries, then indexing the
    # effective count midpoint
    masked = jnp.where(weights > 0, r, jnp.inf)
    srt = jnp.sort(masked, axis=axis)
    n_eff = jnp.sum(weights > 0, axis=axis).astype(jnp.int32)
    idx = jnp.maximum(n_eff // 2, 0)
    med = jnp.take_along_axis(srt, idx[..., None], axis=axis)[..., 0]
    med = jnp.where(jnp.isfinite(med), med, 0.0)
    return _MAD_TO_SIGMA * med


def robust_weights(
    residuals: jnp.ndarray,
    base_weights: jnp.ndarray,
    kind: str = "huber",
    tuning: float | None = None,
    min_sigma: float = 1e-3,
) -> jnp.ndarray:
    """IRLS weights √(ψ(r)/r) per measurement, composed with ``base_weights``.

    ``residuals``/``base_weights`` are (..., V); the robust scale is estimated
    per texel over its views.
    """
    defaults = {"huber": 1.345, "cauchy": 2.385, "tukey": 4.685}
    if kind not in defaults:
        raise ValueError(f"unknown robust kind {kind!r}")
    c = defaults[kind] if tuning is None else tuning
    sigma = jnp.maximum(_sigma(residuals, base_weights), min_sigma)
    u = jnp.abs(residuals) / (c * sigma[..., None])

    if kind == "huber":
        w = jnp.minimum(1.0, 1.0 / jnp.maximum(u, 1e-12))
        w = jnp.where(u <= 1.0, 1.0, w)
    elif kind == "cauchy":
        w = 1.0 / (1.0 + u * u)
    else:  # tukey biweight
        w = jnp.where(u < 1.0, (1.0 - u * u) ** 2, 0.0)
    return base_weights * jnp.sqrt(w)
