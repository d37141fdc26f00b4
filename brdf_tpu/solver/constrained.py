"""Extended constrained LM variants: box + linear equalities + inequalities.

Completes the levmar API family (``levmar/levmar.h:126-202``) on top of the
core solvers in :mod:`brdf_tpu.solver.lm`:

- :func:`levmar_blec` — box + linear equality (``LEVMAR_BLEC_DER/DIF``,
  ``levmar/lmblec_core.c``): box constraints become quadratic penalty
  residuals appended to the measurement vector (the reference's method:
  ``w·max(C(p)²−1, 0)`` per bounded variable with ``C`` the box-normalized
  coordinate, ``lmblec_core.c:20-50``), then null-space-eliminated LM over
  the equality manifold.
- :func:`levmar_bleic` — box + linear equality + inequality
  (``LEVMAR_BLEIC_DER/DIF``, ``levmar/lmbleic_core.c:93-120``): each
  inequality ``C p ≥ d`` gains a surplus variable ``y ≥ 0`` turning it into
  the equality ``C p − y = d``; the augmented problem is a blec problem.
- :func:`levmar_blic` / :func:`levmar_leic` / :func:`levmar_lic` —
  convenience wrappers (``levmar.h:155-202``).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

from brdf_tpu.solver.lm import LMOptions, LMResult, levmar_lec

_BC_WEIGHT = 1e4   # penalty weight (levmar's __BLEC_WEIGHT analogue)


def levmar_blec(
    residual_fn,
    p0: jnp.ndarray,
    A: jnp.ndarray,
    b: jnp.ndarray,
    lower=None,
    upper=None,
    data: Any = None,
    opts: LMOptions = LMOptions(),
    penalty_weight: float = _BC_WEIGHT,
    data_axes: Any = 0,
) -> LMResult:
    """Box + linear-equality constrained LM via box penalties + elimination."""
    m = p0.shape[-1]
    dtype = p0.dtype
    lo = np.full(m, -np.inf) if lower is None else np.broadcast_to(np.asarray(lower, float), (m,))
    hi = np.full(m, np.inf) if upper is None else np.broadcast_to(np.asarray(upper, float), (m,))
    # One hinge residual per finite bound side: r = w·max(l−p, 0) (and
    # symmetrically for the upper side). levmar normalizes coordinates into
    # the box and penalizes c²−1 (lmblec_core.c:20-50), but that collapses for
    # one-sided/huge boxes (the surplus variables of bleic); hinges stay
    # well-scaled for any box.
    lo_idx = np.nonzero(np.isfinite(lo))[0]
    hi_idx = np.nonzero(np.isfinite(hi))[0]
    lo_j = jnp.asarray(lo_idx, jnp.int32)
    hi_j = jnp.asarray(hi_idx, jnp.int32)
    lo_v = jnp.asarray(lo[lo_idx], dtype)
    hi_v = jnp.asarray(hi[hi_idx], dtype)
    w = jnp.asarray(penalty_weight, dtype)

    def aug_residual(p, d):
        r = residual_fn(p, d)
        parts = [r]
        if len(lo_idx):
            parts.append(w * jnp.maximum(lo_v - p[..., lo_j], 0.0))
        if len(hi_idx):
            parts.append(w * jnp.maximum(p[..., hi_j] - hi_v, 0.0))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else r

    res = levmar_lec(
        aug_residual, p0, A, b, data=data, opts=opts, data_axes=data_axes
    )
    # Clamp the reported point into the box (penalties keep it within ~1/w),
    # but SURFACE the pre-clamp violation: a hard clip after a penalty solve
    # can silently hide a penalty-weight failure (the reference reported
    # constraint status via info codes; VERDICT.md Weak #5).
    lo_a = jnp.asarray(lo, dtype)
    hi_a = jnp.asarray(hi, dtype)
    # infinite bounds contribute −inf → max(·, 0) = 0, so no masking needed
    violation = jnp.max(
        jnp.maximum(jnp.maximum(lo_a - res.p, res.p - hi_a), 0.0), axis=-1
    )
    p_clamped = jnp.clip(res.p, lo_a, hi_a)
    return res._replace(p=p_clamped, constraint_violation=violation)


def levmar_bleic(
    residual_fn,
    p0: jnp.ndarray,
    A: jnp.ndarray | None,
    b: jnp.ndarray | None,
    C: jnp.ndarray,
    d: jnp.ndarray,
    lower=None,
    upper=None,
    data: Any = None,
    opts: LMOptions = LMOptions(),
    data_axes: Any = 0,
) -> LMResult:
    """Box + linear equality + inequality (``C p ≥ d``) constrained LM.

    Augments with surplus variables ``y ≥ 0``: ``C p − y = d`` becomes an
    equality; the augmented problem is box+lec (``lmbleic_core.c:93-120``).
    """
    m = p0.shape[-1]
    dtype = p0.dtype
    C = np.asarray(C, float)
    d = np.asarray(d, float)
    k2 = C.shape[0]

    if A is None:
        A_full = np.concatenate([C, -np.eye(k2)], axis=1)
        b_full = d
    else:
        A = np.asarray(A, float)
        b = np.asarray(b, float)
        A_full = np.block(
            [[A, np.zeros((A.shape[0], k2))], [C, -np.eye(k2)]]
        )
        b_full = np.concatenate([b, d])

    lo = np.full(m, -np.inf) if lower is None else np.broadcast_to(np.asarray(lower, float), (m,))
    hi = np.full(m, np.inf) if upper is None else np.broadcast_to(np.asarray(upper, float), (m,))
    lo_full = np.concatenate([lo, np.zeros(k2)])      # surplus y ≥ 0
    hi_full = np.concatenate([hi, np.full(k2, np.inf)])

    y0 = jnp.maximum(p0[..., None, :] @ jnp.asarray(C.T, dtype) - jnp.asarray(d, dtype), 0.0)
    y0 = y0[..., 0, :] if y0.ndim == p0.ndim + 1 else y0
    p0_full = jnp.concatenate([p0, y0.reshape(p0.shape[:-1] + (k2,))], axis=-1)

    def wrapped(p_aug, dd):
        return residual_fn(p_aug[..., :m], dd)

    res = levmar_blec(
        wrapped, p0_full, jnp.asarray(A_full, dtype), jnp.asarray(b_full, dtype),
        lower=lo_full, upper=hi_full, data=data, opts=opts, data_axes=data_axes,
    )
    return res._replace(p=res.p[..., :m])


def levmar_blic(residual_fn, p0, C, d, lower=None, upper=None, **kw) -> LMResult:
    """Box + linear inequalities only."""
    return levmar_bleic(residual_fn, p0, None, None, C, d, lower, upper, **kw)


def levmar_leic(residual_fn, p0, A, b, C, d, **kw) -> LMResult:
    """Linear equalities + inequalities only."""
    return levmar_bleic(residual_fn, p0, A, b, C, d, None, None, **kw)


def levmar_lic(residual_fn, p0, C, d, **kw) -> LMResult:
    """Linear inequalities only."""
    return levmar_bleic(residual_fn, p0, None, None, C, d, None, None, **kw)
