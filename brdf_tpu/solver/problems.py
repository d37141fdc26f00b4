"""Golden nonlinear-least-squares problems for solver verification.

The reference validates its solver family through ``levmar/lmdemo.c`` — 21
classic NLS problems with known minimizers (SURVEY.md §4). This module carries
the same *pattern*: canonical problems (standard public formulations from the
Moré-Garbow-Hillstrom and Hock-Schittkowski collections), each with its known
minimum, used as pytest golden cases for :mod:`brdf_tpu.solver.lm`.

Each problem is a :class:`Problem` with a residual function ``r(p, data)``
whose squared norm the solver minimizes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax.numpy as jnp
import numpy as np


class Problem(NamedTuple):
    name: str
    residual: Callable
    p0: tuple[float, ...]
    p_star: tuple[float, ...]       # known minimizer
    lower: tuple[float, ...] | None = None
    upper: tuple[float, ...] | None = None
    data: object = None
    # linear equality constraint A p = b (levmar_lec problems)
    A: np.ndarray | None = None
    b: np.ndarray | None = None
    tol: float = 1e-5


def _rosenbrock(p, data=None):
    return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])


def _powell(p, data=None):
    return jnp.stack([p[0], 10.0 * p[0] / (p[0] + 0.1) + 2.0 * p[1] ** 2])


def _wood(p, data=None):
    s = jnp.sqrt(10.0)
    return jnp.stack(
        [
            10.0 * (p[1] - p[0] ** 2),
            1.0 - p[0],
            jnp.sqrt(90.0) * (p[3] - p[2] ** 2),
            1.0 - p[2],
            s * (p[1] + p[3] - 2.0),
            (p[1] - p[3]) / s,
        ]
    )


def _helical_valley(p, data=None):
    theta = jnp.arctan2(p[1], p[0]) / (2.0 * jnp.pi)
    return jnp.stack(
        [
            10.0 * (p[2] - 10.0 * theta),
            10.0 * (jnp.sqrt(p[0] ** 2 + p[1] ** 2) - 1.0),
            p[2],
        ]
    )


# Meyer's data-fitting problem (scaled form): x ≈ p0 · exp(10 p1/(u + p2) − 13)
_MEYER_X = np.array(
    [34.780, 28.610, 23.650, 19.630, 16.370, 13.720, 11.540, 9.744,
     8.261, 7.030, 6.005, 5.147, 4.427, 3.820, 3.307, 2.872]
)
_MEYER_U = 0.45 + 0.05 * np.arange(1, 17)


def _meyer(p, data=None):
    u = jnp.asarray(_MEYER_U, p.dtype)
    x = jnp.asarray(_MEYER_X, p.dtype)
    return p[0] * jnp.exp(10.0 * p[1] / (u + p[2]) - 13.0) - x


def _quad_target(p, data=None):
    """Separable quadratic with minimum at (2, 3) — becomes an active-bound
    problem under the box [.,1]×[.,1]."""
    return jnp.stack([p[0] - 2.0, p[1] - 3.0])


def _hs28_residual(p, data=None):
    return jnp.stack([p[0] + p[1], p[1] + p[2]])


def _exponential_fit(p, data):
    """expfit.c-style synthetic data fit: y = p0·exp(−p1 t) + p2."""
    t, y = data
    return p[0] * jnp.exp(-p[1] * t) + p[2] - y


def _modified_rosenbrock(p, data=None):
    """Modified Rosenbrock (MGH): extra constant residual."""
    return jnp.stack(
        [10.0 * (p[1] - p[0] ** 2), 1.0 - p[0], jnp.full((), 100.0, p.dtype)]
    )


def _freudenstein_roth(p, data=None):
    return jnp.stack(
        [
            -13.0 + p[0] + ((5.0 - p[1]) * p[1] - 2.0) * p[1],
            -29.0 + p[0] + ((p[1] + 1.0) * p[1] - 14.0) * p[1],
        ]
    )


def _beale(p, data=None):
    return jnp.stack(
        [
            1.5 - p[0] * (1.0 - p[1]),
            2.25 - p[0] * (1.0 - p[1] ** 2),
            2.625 - p[0] * (1.0 - p[1] ** 3),
        ]
    )


def _hs01(p, data=None):
    """Hock-Schittkowski 01: Rosenbrock with p1 ≥ −1.5."""
    return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])


def _hs21(p, data=None):
    """Hock-Schittkowski 21 objective as residuals: f = p0²/100 + p1² − 100;
    box 2 ≤ p0 ≤ 50, −50 ≤ p1 ≤ 50 → minimum at (2, 0)."""
    return jnp.stack([p[0] / 10.0, p[1]])


def _hatfldb(p, data=None):
    """HATFLDB: r0 = p0 − 1, r_i = p_{i-1} − √p_i; box p ≥ 0, p1 ≤ 0.8."""
    safe = jnp.maximum(p, 0.0)
    return jnp.stack(
        [
            p[0] - 1.0,
            p[0] - jnp.sqrt(jnp.maximum(safe[1], 1e-30)),
            p[1] - jnp.sqrt(jnp.maximum(safe[2], 1e-30)),
            p[2] - jnp.sqrt(jnp.maximum(safe[3], 1e-30)),
        ]
    )




def make_expfit_data(dtype=np.float64):
    """Noise-free expfit data from known params (5.0, 0.1, 1.0) — the
    self-validating synthetic round trip of ``levmar/expfit.c:1-60``."""
    t = np.arange(40, dtype=dtype)
    y = 5.0 * np.exp(-0.1 * t) + 1.0
    return t, y


PROBLEMS: list[Problem] = [
    Problem("rosenbrock", _rosenbrock, (-1.2, 1.0), (1.0, 1.0)),
    Problem("powell", _powell, (3.0, 1.0), (0.0, 0.0), tol=1e-4),
    Problem("wood", _wood, (-3.0, -1.0, -3.0, -1.0), (1.0, 1.0, 1.0, 1.0)),
    Problem("helical_valley", _helical_valley, (-1.0, 0.0, 0.0), (1.0, 0.0, 0.0)),
    Problem("meyer", _meyer, (8.85, 4.0, 2.5), (2.48, 6.18, 3.45), tol=2e-2),
    # box-constrained: interior solution
    Problem(
        "rosenbrock_box_interior", _rosenbrock, (-1.9, 1.0), (1.0, 1.0),
        lower=(-2.0, -1.5), upper=(3.0, 3.0),
    ),
    # box-constrained: solution on the boundary
    Problem(
        "quad_active_bounds", _quad_target, (0.0, 0.0), (1.0, 1.0),
        lower=(-5.0, -5.0), upper=(1.0, 1.0),
    ),
    # linear equality constrained (Hock-Schittkowski 28)
    Problem(
        "hs28_lec", _hs28_residual, (-4.0, 1.0, 1.0), (0.5, -0.5, 0.5),
        A=np.array([[1.0, 2.0, 3.0]]), b=np.array([1.0]),
    ),
    Problem(
        "expfit", _exponential_fit, (1.0, 0.0, 0.0), (5.0, 0.1, 1.0),
        data=make_expfit_data(),
    ),
    Problem(
        "modified_rosenbrock", _modified_rosenbrock, (-1.2, 1.0), (1.0, 1.0),
    ),
    Problem("freudenstein_roth", _freudenstein_roth, (6.0, 3.0), (5.0, 4.0)),
    Problem("beale", _beale, (1.0, 1.0), (3.0, 0.5), tol=1e-4),
    Problem(
        "hs01_box", _hs01, (-2.0, 1.0), (1.0, 1.0),
        lower=(float("-inf"), -1.5), upper=(float("inf"), float("inf")),
    ),
    Problem(
        "hs21_box", _hs21, (-1.0, -1.0), (2.0, 0.0),
        lower=(2.0, -50.0), upper=(50.0, 50.0),
    ),
    Problem(
        "hatfldb", _hatfldb, (0.1, 0.1, 0.1, 0.1),
        (0.947214, 0.8, 0.64, 0.4096),
        lower=(0.0, 0.0, 0.0, 0.0), upper=(100.0, 0.8, 100.0, 100.0),
        tol=1e-4,
    ),
]
