"""Shading-model correctness: float64 reference agreement, gradients, and the
reference-bug fixes (SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.models.brdf import (
    MODELS,
    ShadingAngles,
    angles_from_geometry,
    shading_angles,
    shading_geometry,
)


def _random_scene(rng, t=64, v=8, dtype=jnp.float64):
    pts = jnp.asarray(rng.normal(size=(t, 3)), dtype)
    n = rng.normal(size=(t, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    eye = jnp.asarray([0.0, 0.0, 10.0], dtype)
    lights = jnp.asarray(rng.normal(size=(v, 3)) * 5 + np.array([0, 0, 8.0]), dtype)
    return pts, jnp.asarray(n, dtype), eye, lights


def test_cos_rv_is_true_reflection_dot_view():
    """The reference's GetCosRV had two bugs (brdfdata.cpp:835,849); verify
    ours against a straightforward per-sample construction."""
    rng = np.random.default_rng(0)
    pts, n, eye, lights = _random_scene(rng, t=16, v=4)
    ang = shading_angles(pts, n, eye, lights)

    # naive reference computation
    for ti in range(4):
        for vi in range(4):
            p = np.asarray(pts[ti])
            nn = np.asarray(n[ti])
            l = np.asarray(lights[vi]) - p
            l /= np.linalg.norm(l)
            v = np.asarray(eye) - p
            v /= np.linalg.norm(v)
            r = 2 * np.dot(nn, l) * nn - l
            np.testing.assert_allclose(
                float(ang.cos_rv[ti, vi]), np.dot(r, v), rtol=1e-10, atol=1e-10
            )
            np.testing.assert_allclose(
                float(ang.cos_ln[ti, vi]), np.dot(nn, l), rtol=1e-10, atol=1e-10
            )
            h = (l + v) / np.linalg.norm(l + v)
            np.testing.assert_allclose(
                float(ang.cos_nh[ti, vi]), np.dot(nn, h), rtol=1e-10, atol=1e-10
            )


def test_phong_normalization_divides_by_2pi():
    """Fit path and render path share one lobe with the physically correct
    (n+2)/(2π) factor (the reference multiplied by π in BRDFFunc,
    brdfdata.cpp:981)."""
    ang = ShadingAngles(
        cos_ln=jnp.asarray([[1.0]]),
        cos_nh=jnp.asarray([[1.0]]),
        cos_rv=jnp.asarray([[1.0]]),
        cos_vn=jnp.asarray([[1.0]]),
    )
    p = jnp.asarray([[0.0, 1.0, 4.0]])  # pure specular, n=4, peak
    val = MODELS["phong"].fn(p, ang)
    np.testing.assert_allclose(float(val[0, 0]), (4.0 + 2.0) / (2.0 * np.pi), rtol=1e-12)


@pytest.mark.parametrize("model", list(MODELS))
def test_float32_matches_float64(model):
    """BASELINE acceptance: f32 evaluation allclose to the f64 reference."""
    rng = np.random.default_rng(1)
    pts, n, eye, lights = _random_scene(rng, t=128, v=16)
    ang64 = shading_angles(pts, n, eye, lights, tangent_frame=True)
    spec = MODELS[model]
    m = spec.n_params
    p64 = jnp.asarray(np.abs(rng.normal(size=(128, m))) * 0.5 + 0.2)
    p64 = jnp.clip(p64, jnp.asarray(spec.lower), jnp.asarray(spec.upper))
    i64 = spec.fn(p64, ang64)

    to32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    ang32 = jax.tree.map(to32, ang64)
    i32 = spec.fn(to32(p64), ang32)
    np.testing.assert_allclose(np.asarray(i32), np.asarray(i64), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("model", list(MODELS))
def test_gradients_finite_and_match_fd(model):
    """check_grads-style validation of the differentiated shading path."""
    rng = np.random.default_rng(2)
    pts, n, eye, lights = _random_scene(rng, t=8, v=8)
    ang = shading_angles(pts, n, eye, lights, tangent_frame=True)
    spec = MODELS[model]
    p = jnp.asarray(np.abs(rng.normal(size=(8, spec.n_params))) * 0.4 + 0.3)
    p = jnp.clip(p, jnp.asarray(spec.lower), jnp.asarray(spec.upper))

    def loss(pp):
        return jnp.sum(spec.fn(pp, ang) ** 2)

    g = jax.grad(loss)(p)
    assert np.isfinite(np.asarray(g)).all()
    # central finite differences
    eps = 1e-6
    g_np = np.zeros_like(np.asarray(p))
    for i in range(p.shape[0]):
        for j in range(spec.n_params):
            dp = np.zeros_like(np.asarray(p))
            dp[i, j] = eps
            g_np[i, j] = (float(loss(p + dp)) - float(loss(p - dp))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), g_np, rtol=1e-4, atol=1e-6)


def test_geometry_vs_angles_roundtrip():
    """angles_from_geometry(shading_geometry(...)) == shading_angles(...)"""
    rng = np.random.default_rng(3)
    pts, n, eye, lights = _random_scene(rng)
    a1 = shading_angles(pts, n, eye, lights, tangent_frame=True)
    a2 = angles_from_geometry(
        shading_geometry(pts, n, eye, lights), tangent_frame=True
    )
    for x, y in zip(a1, a2):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_numpy_geometry_twin_matches_jnp():
    """The host-side NumPy geometry path (shading_geometry_np /
    angles_from_geometry_np — used by the problem builders so preprocessing
    never touches the tunneled device) must match the jnp path channel for
    channel, including the tangent frame."""
    from brdf_tpu.models.brdf import angles_from_geometry_np, shading_geometry_np

    rng = np.random.default_rng(11)
    pts, n, eye, lights = _random_scene(rng)
    a_j = angles_from_geometry(
        shading_geometry(pts, n, eye, lights), tangent_frame=True
    )
    a_n = angles_from_geometry_np(
        shading_geometry_np(pts, n, eye, lights), tangent_frame=True,
        dtype=np.float64,
    )
    for name in a_j._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(a_j, name)), getattr(a_n, name),
            rtol=1e-6, atol=1e-7, err_msg=name,
        )


def test_lobe_nonnegative_below_horizon():
    """No lobe may emit negative light or light from below the horizon."""
    rng = np.random.default_rng(4)
    pts, n, eye, lights = _random_scene(rng, t=256, v=16)
    ang = shading_angles(pts, n, eye, lights, tangent_frame=True)
    for name, spec in MODELS.items():
        p = jnp.asarray(np.abs(rng.normal(size=(256, spec.n_params))) + 0.1)
        p = jnp.clip(p, jnp.asarray(spec.lower), jnp.asarray(spec.upper))
        vals = np.asarray(spec.fn(p, ang))
        dark = np.asarray(ang.cos_ln) <= 0
        assert vals[dark].max(initial=0.0) <= 1e-6, name


def test_render_pixel_gradients_f32_vs_f64():
    """BASELINE acceptance: *pixel* gradients of the render path (d image /
    d params) in float32 allclose to the float64 evaluation."""
    from brdf_tpu.pipeline.render import render_pixels

    rng = np.random.default_rng(9)
    t = 64
    pts64 = jnp.asarray(rng.normal(size=(t, 3)), jnp.float64)
    n64 = rng.normal(size=(t, 3))
    n64 /= np.linalg.norm(n64, axis=-1, keepdims=True)
    n64 = jnp.asarray(n64, jnp.float64)
    eye64 = jnp.asarray([0.0, 0.0, 10.0], jnp.float64)
    lights64 = jnp.asarray(rng.normal(size=(4, 3)) * 5 + np.array([0, 0, 8.0]), jnp.float64)
    p64 = jnp.asarray(rng.uniform(0.1, 0.9, (t, 3, 3)), jnp.float64)

    def image_sum(params, pts, nrm, eye, lights):
        return jnp.sum(render_pixels("cook_torrance", params, pts, nrm, eye, lights) ** 2)

    g64 = jax.grad(image_sum)(p64, pts64, n64, eye64, lights64)
    to32 = lambda x: jnp.asarray(np.asarray(x), jnp.float32)
    g32 = jax.grad(image_sum)(
        to32(p64), to32(pts64), to32(n64), to32(eye64), to32(lights64)
    )
    np.testing.assert_allclose(
        np.asarray(g32), np.asarray(g64), rtol=5e-4, atol=5e-5
    )
