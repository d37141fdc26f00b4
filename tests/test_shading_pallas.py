"""Pallas shading kernel (ops/shading_pallas.py) vs the jnp models.

The BASELINE acceptance criterion: the Pallas shading kernel's forward and
analytic backward must be allclose to the (float64-capable) reference
evaluation in models/brdf.py — the generalization of levmar's ``chkjac``
derivative verification (``/root/reference/levmar/misc_core.c:250-321``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.ops.shading_pallas import SHADING_KERNELS, shade_pallas

ALL_MODELS = sorted(SHADING_KERNELS)


def make_case(model, t=517, v=16, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    spec = MODELS[model]
    ext = {}
    if spec.tangent:
        ext = {
            name: jnp.asarray(rng.uniform(-1, 1, (t, v)), dtype)
            for name in ("cos_th", "cos_bh", "cos_tl", "cos_bl", "cos_tv", "cos_bv")
        }
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(-1, 1, (t, v)), dtype),
        cos_nh=jnp.asarray(rng.uniform(-1, 1, (t, v)), dtype),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), dtype),
        cos_vn=jnp.asarray(rng.uniform(0.05, 1, (t, v)), dtype),
        **ext,
    )
    cols = []
    for lo, hi, name in zip(spec.lower, spec.upper, spec.param_names):
        if name == "n":
            cols.append(rng.uniform(1.0, 30.0, t))
        elif name == "phi":
            cols.append(rng.uniform(-1.2, 1.2, t))
        else:
            cols.append(rng.uniform(max(lo, 0.05), min(hi, 1.0), t))
    params = jnp.asarray(np.stack(cols, -1), dtype)
    return params, ang


@pytest.mark.parametrize("model", ALL_MODELS)
def test_forward_matches_jnp(model):
    params, ang = make_case(model)
    got = shade_pallas(model, params, ang)
    want = MODELS[model].fn(params, ang)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("model", ALL_MODELS)
def test_forward_matches_float64(model):
    params, ang = make_case(model, seed=3)
    got = shade_pallas(model, params, ang)
    p64 = jnp.asarray(np.asarray(params), jnp.float64)
    a64 = ShadingAngles(*[jnp.asarray(np.asarray(x), jnp.float64) for x in ang])
    want = MODELS[model].fn(p64, a64)
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-4, atol=1e-5)


@pytest.mark.parametrize("model", ALL_MODELS)
def test_vjp_matches_autodiff(model):
    """Analytic backward == jax.vjp through the jnp model, for the parameter
    cotangents AND every angle-channel cotangent."""
    params, ang = make_case(model, seed=1)
    rng = np.random.default_rng(2)
    ct = jnp.asarray(rng.normal(size=ang.cos_ln.shape), jnp.float32)

    out_ref, vjp_ref = jax.vjp(lambda p, a: MODELS[model].fn(p, a), params, ang)
    dp_ref, dang_ref = vjp_ref(ct)

    out, vjp = jax.vjp(lambda p, a: shade_pallas(model, p, a), params, ang)
    dp, dang = vjp(ct)

    np.testing.assert_allclose(out, out_ref, rtol=3e-5, atol=1e-6)
    np.testing.assert_allclose(dp, dp_ref, rtol=2e-4, atol=2e-4)
    for name in ShadingAngles._fields:
        if getattr(dang_ref, name) is None:   # unused tangent channels
            assert getattr(dang, name) is None, f"{model} d/d{name}"
            continue
        np.testing.assert_allclose(
            getattr(dang, name), getattr(dang_ref, name),
            rtol=2e-4, atol=2e-4, err_msg=f"{model} d/d{name}",
        )


@pytest.mark.parametrize("model", ALL_MODELS)
def test_grad_of_loss(model):
    """jax.grad of a fit-style loss flows through the kernel to params and
    angles (the joint normal-map path needs the angle gradients)."""
    params, ang = make_case(model, t=260, seed=4)
    target = MODELS[model].fn(params, ang)
    p0 = params * 0.8 + 0.05

    def loss(p, a):
        pred = shade_pallas(model, p, a)
        return 0.5 * jnp.sum((pred - target) ** 2)

    def loss_ref(p, a):
        pred = MODELS[model].fn(p, a)
        return 0.5 * jnp.sum((pred - target) ** 2)

    (g_p, g_a) = jax.grad(loss, argnums=(0, 1))(p0, ang)
    (r_p, r_a) = jax.grad(loss_ref, argnums=(0, 1))(p0, ang)
    np.testing.assert_allclose(g_p, r_p, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(g_a.cos_ln, r_a.cos_ln, rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(g_p)).all()


def test_small_and_unpadded_batches():
    for t in (1, 7, 128, 129):
        params, ang = make_case("blinn_phong", t=t, v=8, seed=t)
        got = shade_pallas("blinn_phong", params, ang)
        want = MODELS["blinn_phong"].fn(params, ang)
        np.testing.assert_allclose(got, want, rtol=3e-5, atol=1e-6)


def test_render_pixels_engine_parity():
    from brdf_tpu.pipeline.render import render_pixels

    rng = np.random.default_rng(9)
    n, c, l = 333, 3, 5
    pts = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm, jnp.float32)
    eye = jnp.asarray([0.0, 0.0, 8.0], jnp.float32)
    lights = jnp.asarray(rng.normal(size=(l, 3)) * 3 + np.array([0, 0, 6.0]), jnp.float32)
    params = jnp.asarray(rng.uniform(0.05, 0.9, (n, c, 3)), jnp.float32)
    a = render_pixels("cook_torrance", params, pts, nrm, eye, lights, engine="xla")
    b = render_pixels("cook_torrance", params, pts, nrm, eye, lights, engine="pallas")
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=1e-6)


def test_large_view_count_shrinks_block():
    """Hundreds of lights must auto-shrink the texel block to fit the VMEM
    budget instead of overflowing (CLAUDE.md kernel rule); result unchanged."""
    params, ang = make_case("cook_torrance", t=300, v=600, seed=21)
    got = shade_pallas("cook_torrance", params, ang)
    want = MODELS["cook_torrance"].fn(params, ang)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_render_pixels_rejects_unknown_engine():
    from brdf_tpu.pipeline.render import render_pixels

    with pytest.raises(ValueError, match="unknown shading engine"):
        render_pixels(
            "blinn_phong", jnp.zeros((4, 3, 3)), jnp.zeros((4, 3)),
            jnp.ones((4, 3)), jnp.ones(3), jnp.ones((2, 3)), engine="Pallas",
        )
