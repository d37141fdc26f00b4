"""Pallas fused-LM kernel vs the reference JAX solver (interpret mode on CPU).

Gate (BASELINE acceptance): the kernel's converged fits must match the
float64-validated `solver.lm` path — same data, same starts — in final χ² and
parameters on identifiable texels, and its analytic derivatives must match
autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.ops.lm_pallas import PALLAS_MODELS, lm_fit_pallas
from brdf_tpu.solver.init import linear_grid_init
from brdf_tpu.solver.lm import LMOptions, levmar_bc

OPTS = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=40)


def _problem(model, t=256, v=16, seed=0):
    rng = np.random.default_rng(seed)
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
    )
    if model in ("cook_torrance", "ward"):   # bounded shape param in (0, 1]
        true_p = np.stack(
            [rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t), rng.uniform(0.15, 0.9, t)],
            -1,
        ).astype(np.float32)
    else:
        true_p = np.stack(
            [rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t), rng.uniform(2, 25, t)],
            -1,
        ).astype(np.float32)
    target = MODELS[model].fn(jnp.asarray(true_p), ang)
    return ang, target, true_p


@pytest.mark.parametrize("model", list(PALLAS_MODELS))
def test_analytic_derivatives_match_autodiff(model):
    """The kernel's hand-derived (I, dI/dp) must equal jacfwd of the jnp lobe."""
    spec = PALLAS_MODELS[model]
    mspec = MODELS[model]
    rng = np.random.default_rng(1)
    t, v = 64, 8
    ang, _, true_p = _problem(model, t, v, seed=1)
    angs = tuple(getattr(ang, n) for n in spec.angle_names)
    kd = jnp.asarray(true_p[:, 0:1])
    ks = jnp.asarray(true_p[:, 1:2])
    sh = jnp.asarray(true_p[:, 2:3])
    i_val, d_kd, d_ks, d_sh = spec.eval(angs, kd, ks, sh)

    i_ref = mspec.fn(jnp.asarray(true_p), ang)
    np.testing.assert_allclose(np.asarray(i_val), np.asarray(i_ref), rtol=2e-5, atol=1e-6)

    def per_texel(p, a):
        return mspec.fn(p, a)

    jac = jax.vmap(jax.jacfwd(per_texel))(
        jnp.asarray(true_p), jax.tree.map(lambda x: x, ang)
    )  # (T, V, 3)
    np.testing.assert_allclose(np.asarray(d_kd), np.asarray(jac[..., 0]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_ks), np.asarray(jac[..., 1]), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(jac[..., 2]), rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("model", list(PALLAS_MODELS))
def test_pallas_fit_matches_solver(model):
    ang, target, true_p = _problem(model)
    spec = MODELS[model]
    p0 = linear_grid_init(model, ang, target).astype(jnp.float32)

    res_pallas = lm_fit_pallas(
        model, ang, target, p0, opts=OPTS,
        lower=tuple(spec.lower), upper=tuple(spec.upper),
        block_t=128, interpret=True,
    )

    def residual(p, data):
        a, y = data
        return spec.fn(p, a) - y

    res_ref = levmar_bc(
        residual, p0, spec.lower, spec.upper, data=(ang, target), opts=OPTS
    )

    chi2_p = np.asarray(res_pallas.chi2)
    chi2_r = np.asarray(res_ref.chi2)
    # both reach the (same) noise floor on nearly all texels
    assert np.median(chi2_p) < 1e-9
    assert (chi2_p < np.maximum(chi2_r * 10, 1e-8)).mean() > 0.9
    # parameters agree where the reference solver itself found the truth
    ref_found = (
        np.abs(np.asarray(res_ref.p) - true_p)
        / np.maximum(np.abs(true_p), 1e-3)
    ).max(-1) < 1e-2
    pal_err = (
        np.abs(np.asarray(res_pallas.p) - true_p)
        / np.maximum(np.abs(true_p), 1e-3)
    ).max(-1)
    assert (pal_err[ref_found] < 2e-2).mean() > 0.9


def test_padding_and_weights():
    """T not divisible by the block: padded lanes must not leak; zero-weight
    views must not influence the result."""
    ang, target, _ = _problem("blinn_phong", t=100, v=16, seed=3)
    p0 = linear_grid_init("blinn_phong", ang, target).astype(jnp.float32)
    w = jnp.ones_like(target).at[:, 10:].set(0.0)
    bad_target = target.at[:, 10:].set(55.0)
    res = lm_fit_pallas(
        "blinn_phong", ang, bad_target, p0, weights=w, opts=OPTS,
        block_t=128, interpret=True,
    )
    assert res.p.shape == (100, 3)
    ang_t = jax.tree.map(lambda a: a[:, :10], ang)
    p0_t = linear_grid_init("blinn_phong", ang_t, target[:, :10]).astype(jnp.float32)
    res_t = lm_fit_pallas(
        "blinn_phong", ang_t, target[:, :10], p0_t, opts=OPTS,
        block_t=128, interpret=True,
    )
    # same optimization problem (masked vs truncated); compare χ² quality
    assert np.median(np.asarray(res.chi2)) < 1e-9
    assert np.median(np.asarray(res_t.chi2)) < 1e-9
