"""Extended constraint variants (blec/bleic/lic) and fit statistics —
the levmar API-family completion (SURVEY.md §2.2 N4-N6, N10)."""

import jax.numpy as jnp
import numpy as np

from brdf_tpu.solver.constrained import (
    levmar_blec,
    levmar_bleic,
    levmar_blic,
    levmar_lic,
)
from brdf_tpu.solver.lm import LMOptions
from brdf_tpu.solver.stats import corcoef, fit_statistics, r_squared

OPTS = LMOptions(itmax=300)


def _quad(target):
    def residual(p, data=None):
        return p - jnp.asarray(target)
    return residual


def test_blec_interior_solution():
    """min ‖p−(1,2,3)‖² s.t. p0+p1+p2=6, box [0,10]³ → (1,2,3) feasible."""
    res = levmar_blec(
        _quad((1.0, 2.0, 3.0)), jnp.asarray([2.0, 2.0, 2.0]),
        A=np.array([[1.0, 1.0, 1.0]]), b=np.array([6.0]),
        lower=(0, 0, 0), upper=(10, 10, 10), opts=OPTS, data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(res.p), [1, 2, 3], atol=1e-5)


def test_blec_active_box():
    """min ‖p−(5,-3)‖² s.t. p0+p1=2, box [0,4]² — unconstrained manifold
    optimum (5,-3) is outside the box; KKT solution is (4,-2)→clipped...
    actual constrained optimum on the segment p0∈[0,4],p1=2−p0∈[0,4]... wait
    p1≥0 ⇒ p0≤2: minimize (p0−5)²+(2−p0+3)² over p0∈[0,2] → p0=2, p1=0."""
    res = levmar_blec(
        _quad((5.0, -3.0)), jnp.asarray([1.0, 1.0]),
        A=np.array([[1.0, 1.0]]), b=np.array([2.0]),
        lower=(0.0, 0.0), upper=(4.0, 4.0), opts=OPTS, data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(res.p), [2.0, 0.0], atol=1e-2)


def test_bleic_inequality():
    """min ‖p−(0,0)‖² s.t. p0+p1 ≥ 2 → (1,1)."""
    res = levmar_lic(
        _quad((0.0, 0.0)), jnp.asarray([3.0, 3.0]),
        C=np.array([[1.0, 1.0]]), d=np.array([2.0]),
        opts=OPTS, data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(res.p), [1.0, 1.0], atol=1e-2)


def test_bleic_inactive_inequality():
    """Inequality already satisfied at optimum → unconstrained answer."""
    res = levmar_blic(
        _quad((3.0, 4.0)), jnp.asarray([1.0, 1.0]),
        C=np.array([[1.0, 0.0]]), d=np.array([1.0]),
        lower=(0.0, 0.0), upper=(10.0, 10.0),
        opts=OPTS, data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(res.p), [3.0, 4.0], atol=1e-3)


def test_bleic_mixed():
    """Equality p0+p1+p2=1, inequality p2 ≥ 0.5, target (1,1,0):
    optimum: minimize (p0−1)²+(p1−1)²+p2² on the plane with p2≥0.5 →
    with p2=0.5, p0+p1=0.5 symmetric → p0=p1=0.25."""
    res = levmar_bleic(
        _quad((1.0, 1.0, 0.0)), jnp.asarray([0.0, 0.0, 1.0]),
        A=np.array([[1.0, 1.0, 1.0]]), b=np.array([1.0]),
        C=np.array([[0.0, 0.0, 1.0]]), d=np.array([0.5]),
        opts=OPTS, data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(res.p), [0.25, 0.25, 0.5], atol=1e-2)


def test_fit_statistics_linear_model():
    """Linear fit y = a x + b with known noise: R² near 1, stddev sane,
    slope/intercept strongly anticorrelated for x > 0."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.linspace(0, 1, 50))
    a, b, sigma = 2.0, -0.5, 0.01
    y = a * np.asarray(x) + b + rng.normal(0, sigma, 50)
    y = jnp.asarray(y)

    def residual(p, data=None):
        return p[0] * x + p[1] - y

    from brdf_tpu.solver.lm import levmar

    res = levmar(residual, jnp.asarray([0.0, 0.0]), data_axes=None,
                 opts=LMOptions(itmax=100))
    stats = fit_statistics(residual, res.p, None, y, data_axes=None)
    assert float(stats["r2"]) > 0.999
    sd = np.asarray(stats["stddev"])
    # ~ sigma/sqrt(n)-scale uncertainties
    assert 1e-4 < sd[0] < 2e-2 and 1e-4 < sd[1] < 2e-2
    rho = np.asarray(stats["corcoef"])
    assert rho[0, 1] < -0.5
    np.testing.assert_allclose(np.diagonal(rho), 1.0, atol=1e-6)


def test_r_squared_perfect_and_mean():
    y = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(float(r_squared(y, y)), 1.0)
    np.testing.assert_allclose(float(r_squared(jnp.full(4, 2.5), y)), 0.0)


def test_blec_surfaces_constraint_violation():
    """The blec penalty solve clamps its reported point into the box but must
    surface the pre-clamp violation (VERDICT.md Weak #5): tiny when the
    penalty worked, and the info channel exists for when it did not."""
    import jax.numpy as jnp

    def residual(p, _):
        # unconstrained optimum pulls p[0] far above the box
        return jnp.stack([p[0] - 5.0, p[1] - 0.5])

    A = jnp.asarray([[0.0, 1.0]])
    b = jnp.asarray([0.5])
    res = levmar_blec(
        residual, jnp.asarray([0.0, 0.5]), A, b,
        lower=(0.0, 0.0), upper=(1.0, 1.0),
        data=None, data_axes=None, opts=LMOptions(itmax=200),
    )
    v = float(res.constraint_violation)
    assert np.isfinite(v)
    # point is clamped into the box...
    assert float(res.p[0]) <= 1.0 + 1e-6
    # ...and the surfaced violation reports the (small) penalty compromise
    assert 0.0 <= v < 1e-2


def test_nlss_counter():
    """nlss (levmar info[9]): one damped solve per inner damping try; at
    least one per outer iteration, more when steps get rejected."""
    import jax.numpy as jnp
    from brdf_tpu.solver.lm import levmar_bc

    def rosenbrock(p, _):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    res = levmar_bc(rosenbrock, jnp.asarray([-1.2, 1.0]), data_axes=None,
                    opts=LMOptions(itmax=100))
    assert int(res.nlss) >= int(res.iters)
    assert int(res.nlss) <= int(res.nfev)


def test_fit_report_statistics():
    """FitReport.statistics: the post-fit analytics levmar exposed as
    dlevmar_covar/stddev/corcoef/R2 (misc_core.c:564-658), on a synthetic
    exact-recovery fit: R^2 ~ 1, tiny parameter stddevs, unit-diagonal
    correlation matrices."""
    import numpy as np
    import jax.numpy as jnp
    from brdf_tpu.models.brdf import MODELS, ShadingAngles
    from brdf_tpu.pipeline.fit import TexelProblem, fit_per_texel

    rng = np.random.default_rng(0)
    t, v, c = 64, 16, 3
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
    )
    spec = MODELS["blinn_phong"]
    true_p = np.stack([rng.uniform(.2,.8,(t,c)), rng.uniform(.3,.9,(t,c)),
                       rng.uniform(3,20,(t,c))], -1).astype(np.float32)
    intensity = np.stack(
        [np.asarray(spec.fn(jnp.asarray(true_p[:, ch]), ang)) for ch in range(c)],
        axis=-1,
    )
    prob = TexelProblem(
        angles=ang, intensity=intensity,
        weights=np.ones((t, v), np.float32),
        face_ids=np.arange(t),
    )
    rep = fit_per_texel(prob, "blinn_phong", mask_saturation=False)
    stats = rep.statistics(prob)
    assert stats["stddev"].shape == (t, c, 3)
    assert stats["corcoef"].shape == (t, c, 3, 3)
    assert stats["r2"].shape == (t, c)
    conv = np.isin(np.asarray(rep.result.stop), (1, 2, 6))
    assert np.median(stats["r2"][conv]) > 0.999
    # exact data: noise sigma^2 = chi2/dof ~ 0 -> tiny stddevs
    assert np.median(stats["stddev"][conv]) < 1e-2
    # correlation diagonals are 1 wherever the covariance is nonzero
    # (exactly-zero chi2 gives a zero covariance whose correlations are
    # degenerate by definition — levmar would divide by zero there too)
    diag = np.diagonal(stats["corcoef"], axis1=-2, axis2=-1)
    defined = stats["stddev"] > 1e-12
    assert np.allclose(diag[conv & defined.all(-1)], 1.0, atol=1e-3)
