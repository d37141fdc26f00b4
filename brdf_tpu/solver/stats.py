"""Fit statistics: covariance, standard deviations, correlations, R².

The levmar N10 component (``dlevmar_covar/stddev/corcoef/R2``,
``levmar/misc_core.c:564-658``, decls ``levmar.h:357-383``), vectorized: all
functions accept a trailing batch of fits and run under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def covariance(jac: jnp.ndarray, chi2: jnp.ndarray, n_meas: int) -> jnp.ndarray:
    """Covariance of the fitted parameters: ``σ² (JᵀJ)⁺`` with
    ``σ² = χ²/(n − r)``, ``r = rank(JᵀJ)`` (``LEVMAR_COVAR``,
    ``misc_core.c:564-591``). ``jac`` is (..., n, m)."""
    jtj = jnp.einsum("...nm,...nk->...mk", jac, jac)
    # rank via eigenvalues of the symmetric PSD JtJ
    eig = jnp.linalg.eigvalsh(jtj)
    tol = jnp.max(eig, axis=-1, keepdims=True) * jtj.shape[-1] * jnp.finfo(jtj.dtype).eps
    rank = jnp.sum(eig > tol, axis=-1)
    dof = jnp.maximum(n_meas - rank, 1)
    sigma2 = chi2 / dof
    pinv = jnp.linalg.pinv(jtj)
    return sigma2[..., None, None] * pinv


def stddev(cov: jnp.ndarray) -> jnp.ndarray:
    """Per-parameter standard deviations √C_jj (``misc_core.c:598-610``)."""
    return jnp.sqrt(jnp.maximum(jnp.diagonal(cov, axis1=-2, axis2=-1), 0.0))


def corcoef(cov: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation matrix ρ_ij = C_ij/√(C_ii C_jj)
    (``misc_core.c:613-630``)."""
    sd = stddev(cov)
    denom = sd[..., :, None] * sd[..., None, :]
    return cov / jnp.maximum(denom, 1e-30)


def r_squared(pred: jnp.ndarray, target: jnp.ndarray, axis=-1) -> jnp.ndarray:
    """Coefficient of determination R² = 1 − Σ(y−ŷ)²/Σ(y−ȳ)²
    (``LEVMAR_R2``, ``misc_core.c:633-658``)."""
    ss_res = jnp.sum((target - pred) ** 2, axis=axis)
    mean = jnp.mean(target, axis=axis, keepdims=True)
    ss_tot = jnp.sum((target - mean) ** 2, axis=axis)
    return 1.0 - ss_res / jnp.maximum(ss_tot, 1e-30)


def fit_statistics(residual_fn, p, data, target, data_axes=0):
    """Bundle: (covariance, stddev, corcoef, R²) for fitted batch ``p``.

    ``residual_fn(p, data)`` returns residuals ``pred − target`` so
    predictions are recovered as ``target + r``.
    """
    def one(p_i, d_i):
        r = residual_fn(p_i, d_i)
        j = jax.jacfwd(lambda q: residual_fn(q, d_i))(p_i)
        return r, j

    if p.ndim == 2:
        r, j = jax.vmap(one, in_axes=(0, data_axes))(p, data)
    else:
        r, j = one(p, data)
    chi2 = jnp.sum(r * r, axis=-1)
    cov = covariance(j, chi2, r.shape[-1])
    pred = target + r
    return {
        "covariance": cov,
        "stddev": stddev(cov),
        "corcoef": corcoef(cov),
        "r2": r_squared(pred, target),
        "chi2": chi2,
    }
