"""Golden NLS problems for the JAX LM solver — the lmdemo.c pattern
(SURVEY.md §4, item 1): known minimizers, termination codes, and batched
semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.solver import (
    LMOptions,
    StopReason,
    check_jacobian,
    levmar,
    levmar_bc,
    levmar_lec,
)
from brdf_tpu.solver.problems import PROBLEMS, make_expfit_data, _exponential_fit

OPTS = LMOptions(itmax=300)


@pytest.mark.parametrize("prob", PROBLEMS, ids=lambda p: p.name)
def test_golden_problem(prob):
    from brdf_tpu.solver.constrained import levmar_blec, levmar_bleic

    p0 = jnp.asarray(prob.p0, jnp.float64)
    opts = OPTS._replace(itmax=max(OPTS.itmax, prob.itmax))
    boxed = prob.lower is not None or prob.upper is not None
    if prob.C is not None:
        res = levmar_bleic(
            prob.residual, p0, prob.A, prob.b, prob.C, prob.d,
            lower=prob.lower, upper=prob.upper, data=prob.data, opts=opts,
            data_axes=None,
        )
    elif prob.A is not None and boxed:
        kw = {}
        if prob.penalty_weight is not None:
            kw["penalty_weight"] = prob.penalty_weight
        res = levmar_blec(
            prob.residual, p0, prob.A, prob.b, lower=prob.lower,
            upper=prob.upper, data=prob.data, opts=opts, data_axes=None, **kw,
        )
    elif prob.A is not None:
        res = levmar_lec(
            prob.residual, p0, prob.A, prob.b, data=prob.data, opts=opts,
            data_axes=None,
        )
    elif boxed:
        res = levmar_bc(
            prob.residual, p0, prob.lower, prob.upper, data=prob.data,
            opts=opts, data_axes=None,
        )
    else:
        res = levmar(prob.residual, p0, data=prob.data, opts=opts, data_axes=None)

    np.testing.assert_allclose(
        np.asarray(res.p), np.asarray(prob.p_star), atol=prob.tol, rtol=prob.tol
    )
    assert int(res.stop) in (
        StopReason.SMALL_GRADIENT,
        StopReason.SMALL_DP,
        StopReason.SMALL_CHI2,
    ), f"{prob.name}: bad stop reason {StopReason(int(res.stop))}"
    assert int(res.iters) <= opts.itmax


def test_batched_solves_match_individual():
    """A batch of independent problems must reproduce per-problem solves —
    the property the reference's serial per-pixel loop (brdfdata.cpp:1195-1221)
    gets trivially and the vmapped solver must preserve."""
    t, _ = make_expfit_data()
    rng = np.random.default_rng(0)
    true_params = np.abs(rng.normal(size=(8, 3))) + np.array([1.0, 0.05, 0.5])
    ys = true_params[:, 0:1] * np.exp(-true_params[:, 1:2] * t[None]) + true_params[:, 2:3]

    data = (jnp.asarray(np.broadcast_to(t, ys.shape)), jnp.asarray(ys))
    p0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (8, 3))

    batched = levmar(_exponential_fit, p0, data=data, opts=OPTS)
    assert batched.p.shape == (8, 3)
    np.testing.assert_allclose(np.asarray(batched.p), true_params, rtol=1e-4, atol=1e-4)

    # spot-check one problem solved alone
    single = levmar(
        _exponential_fit,
        jnp.asarray([1.0, 0.0, 0.0]),
        data=(data[0][3], data[1][3]),
        opts=OPTS,
        data_axes=None,
    )
    np.testing.assert_allclose(np.asarray(single.p), np.asarray(batched.p[3]), rtol=1e-5, atol=1e-6)


def test_box_projection_keeps_feasible():
    from brdf_tpu.solver.problems import _quad_target

    res = levmar_bc(
        _quad_target,
        jnp.asarray([5.0, -7.0]),
        lower=(-1.0, -1.0),
        upper=(1.0, 1.0),
        opts=OPTS,
        data_axes=None,
    )
    p = np.asarray(res.p)
    assert np.all(p >= -1.0 - 1e-12) and np.all(p <= 1.0 + 1e-12)
    np.testing.assert_allclose(p, [1.0, 1.0], atol=1e-8)


def test_invalid_residuals_flagged():
    def bad(p, data=None):
        return jnp.stack([jnp.sqrt(p[0]) , p[1]])  # NaN for p0 < 0

    res = levmar(bad, jnp.asarray([-1.0, 1.0]), opts=OPTS, data_axes=None)
    assert int(res.stop) == StopReason.INVALID_VALUES


def test_jacobian_check_matches_fd():
    """chkjac-style agreement between autodiff and central differences
    (levmar/misc_core.c:250-321 analogue)."""
    from brdf_tpu.solver.problems import _meyer

    err = check_jacobian(_meyer, jnp.asarray([8.85, 4.0, 2.5]))
    assert float(err) < 1e-6


def test_analytic_jacobian_path():
    def res_fn(p, data=None):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    def jac_fn(p, data=None):
        return jnp.array([[-20.0 * p[0], 10.0], [-1.0, 0.0]])

    r = levmar(res_fn, jnp.asarray([-1.2, 1.0]), opts=OPTS, jac_fn=jac_fn, data_axes=None)
    np.testing.assert_allclose(np.asarray(r.p), [1.0, 1.0], atol=1e-8)


@pytest.mark.parametrize("linsolver", ["cholesky", "qr", "lu", "svd"])
def test_linsolver_suite_agrees(linsolver):
    """Every damped-system solver (the levmar Axb_core.c suite analogue) must
    reach the same minimizer: Meyer unconstrained + hatfldb boxed."""
    by_name = {p.name: p for p in PROBLEMS}
    opts = OPTS._replace(linsolver=linsolver)

    meyer = by_name["meyer"]
    r = levmar(meyer.residual, jnp.asarray(meyer.p0, jnp.float64),
               data=meyer.data, opts=opts, data_axes=None)
    np.testing.assert_allclose(np.asarray(r.p), meyer.p_star,
                               atol=meyer.tol, rtol=meyer.tol)

    hat = by_name["hatfldb"]
    r = levmar_bc(hat.residual, jnp.asarray(hat.p0, jnp.float64),
                  hat.lower, hat.upper, data=hat.data, opts=opts,
                  data_axes=None)
    np.testing.assert_allclose(np.asarray(r.p), hat.p_star,
                               atol=hat.tol, rtol=hat.tol)


def test_svd_linsolver_handles_singular_system():
    """A residual ignoring one parameter makes JᵀJ exactly singular; the SVD
    pseudo-inverse path (AX_EQ_B_SVD analogue) must still converge in the
    identifiable subspace."""
    def res_fn(p, data=None):
        return jnp.stack([p[0] - 2.0, 3.0 * (p[0] + p[1] - 1.0)])

    # p2 never appears: column 2 of J is zero. mu>0 regularizes, but SVD must
    # also survive mu≈0 iterations without NaN.
    def res3(p, data=None):
        return res_fn(p)

    r = levmar(res3, jnp.asarray([5.0, 5.0, 7.0]),
               opts=OPTS._replace(linsolver="svd"), data_axes=None)
    p = np.asarray(r.p)
    np.testing.assert_allclose(p[0], 2.0, atol=1e-8)
    np.testing.assert_allclose(p[1], -1.0, atol=1e-8)
    assert np.isfinite(p).all()


def test_chkjac_scores_grade_correct_and_wrong_jacobians():
    """MINPACK-CHKDER per-residual scores (dlevmar_chkjac,
    levmar/misc_core.c:250-321): a correct Jacobian scores ~1 on every
    residual; a corrupted column drags the affected residuals to ~0."""
    from brdf_tpu.solver import chkjac
    from brdf_tpu.solver.problems import _meyer

    p = jnp.asarray([8.85, 4.0, 2.5], jnp.float64)
    good = chkjac(_meyer, p)
    assert good.shape == (16,)
    assert float(jnp.min(good)) > 0.8

    def bad_jac(q, data=None):
        import jax
        j = jax.jacfwd(lambda r: _meyer(r, data))(q)
        return j.at[:, 1].multiply(3.0)  # corrupt one column

    bad = chkjac(_meyer, p, jac_fn=bad_jac)
    assert float(jnp.max(bad)) < 0.5


def test_dscl_diagonal_scaling_recovers_badly_scaled_problem():
    """levmar's dscl handling (lmbc_core.c:360-366): parameters spanning
    orders of magnitude fit cleanly when solved in scaled variables, and the
    result comes back unscaled."""
    # y = a·exp(-b·t) with a ~ 1e4 and b ~ 1e-3: raw scaling is terrible
    t = jnp.linspace(0.0, 1000.0, 32, dtype=jnp.float64)
    a_true, b_true = 2.0e4, 4.0e-3
    y = a_true * jnp.exp(-b_true * t)

    def resid(p, data=None):
        return p[0] * jnp.exp(-p[1] * t) - y

    p0 = jnp.asarray([1.0e4, 1.0e-2], jnp.float64)
    res = levmar_bc(
        resid, p0, lower=(0.0, 0.0), upper=(1e6, 1.0),
        opts=LMOptions(itmax=200), data_axes=None, dscl=(1.0e4, 1.0e-3),
    )
    np.testing.assert_allclose(np.asarray(res.p), [a_true, b_true], rtol=1e-6)
    # eps2's relative step test ran in scaled space; result is unscaled
    assert int(res.stop) in (
        StopReason.SMALL_GRADIENT, StopReason.SMALL_DP, StopReason.SMALL_CHI2,
    )


def test_dscl_with_analytic_jacobian_matches_unscaled():
    def resid(p, data=None):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    def jac(p, data=None):
        return jnp.array([[-20.0 * p[0], 10.0], [-1.0, 0.0]])

    p0 = jnp.asarray([-1.2, 1.0], jnp.float64)
    r_plain = levmar_bc(resid, p0, opts=OPTS, jac_fn=jac, data_axes=None)
    r_scaled = levmar_bc(
        resid, p0, opts=OPTS, jac_fn=jac, data_axes=None, dscl=(2.0, 0.5)
    )
    np.testing.assert_allclose(np.asarray(r_scaled.p), np.asarray(r_plain.p), atol=1e-8)


def test_secant_jac_mode_converges():
    """jac_mode='secant' (Broyden rank-1 updates between full-FD refreshes,
    the LEVMAR_DIF scheme, lm_core.c:578-588): reaches the golden minima
    with strictly fewer Jacobian evaluations than iterations."""
    import jax.numpy as jnp
    import numpy as np
    from brdf_tpu.solver.lm import LMOptions, levmar_bc
    from brdf_tpu.solver.problems import PROBLEMS

    for name in ("rosenbrock", "hs01_box", "hatfldb"):
        prob = next(p for p in PROBLEMS if p.name == name)
        lower = None if prob.lower is None else jnp.asarray(prob.lower, jnp.float64)
        upper = None if prob.upper is None else jnp.asarray(prob.upper, jnp.float64)
        res = levmar_bc(
            prob.residual, jnp.asarray(prob.p0, jnp.float64), lower, upper,
            data_axes=None, jac_mode="secant", secant_refresh=5,
            opts=LMOptions(itmax=400),
        )
        np.testing.assert_allclose(
            np.asarray(res.p), np.asarray(prob.p_star), rtol=5e-4, atol=5e-4,
            err_msg=name,
        )
        # secant's point: far fewer full Jacobian evaluations than iterations
        assert int(res.njev) < int(res.iters), name
        assert int(res.njev) >= 1 + int(res.iters) // 6, name


def test_secant_batched_matches_unbatched():
    import jax.numpy as jnp
    import numpy as np
    from brdf_tpu.solver.lm import LMOptions, levmar_bc

    def rosen(p, _):
        return jnp.stack([10.0 * (p[1] - p[0] ** 2), 1.0 - p[0]])

    p0 = jnp.asarray([[-1.2, 1.0], [2.0, 2.0], [0.5, -0.5]], jnp.float64)
    res_b = levmar_bc(rosen, p0, data_axes=None, jac_mode="secant",
                      opts=LMOptions(itmax=300))
    for i in range(3):
        res_1 = levmar_bc(rosen, p0[i], data_axes=None, jac_mode="secant",
                          opts=LMOptions(itmax=300))
        np.testing.assert_allclose(np.asarray(res_b.p[i]), np.asarray(res_1.p),
                                   rtol=1e-8, atol=1e-10)
