"""Environment-map relighting: solid-angle bookkeeping, the Lambert furnace
closure, SH9 irradiance vs. brute-force quadrature, importance vs. uniform
sampling agreement, and the scene-level IBL render path.

The reference had no image-based lighting whatsoever (headlight/LED relights
only, ``/root/reference/glutcallbacks.cpp:346-445``); this subsystem is
validated analytically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.pipeline.envlight import (
    directional_angles,
    env_to_lights,
    latlong_directions,
    latlong_solid_angles,
    lookup_latlong,
    sh9_irradiance,
    sh9_project,
    shade_env_samples,
    _sh9_basis,
)
from brdf_tpu.models.brdf import MODELS


def test_solid_angles_sum_to_4pi():
    dw = latlong_solid_angles(64, 128)
    np.testing.assert_allclose(dw.sum(), 4 * np.pi, rtol=1e-6)
    d = latlong_directions(64, 128)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-12)
    # first moment of a constant env over the sphere vanishes
    np.testing.assert_allclose((d * dw[..., None]).sum((0, 1)), 0.0, atol=1e-9)


def _smooth_env(h=64, w=128, c=3, seed=0):
    """Band-limited (≤ SH2), strictly positive environment."""
    rng = np.random.default_rng(seed)
    coeffs = rng.normal(size=(9, c)) * 0.15
    coeffs[0] = 1.0
    dirs = latlong_directions(h, w)
    env = _sh9_basis(dirs) @ coeffs
    lo = env.min()
    if lo <= 0.05:  # lift the ambient term until strictly positive
        coeffs[0] += (0.1 - lo) / 0.282095
        env = _sh9_basis(dirs) @ coeffs
    assert env.min() > 0
    return env, coeffs


def test_furnace_lambert():
    """Constant environment of radiance L0: a Lambert surface must shade to
    exactly kd·L0 — via SH9 (closed form) and via both sampled paths."""
    L0 = 0.7
    env = np.full((64, 128, 3), L0, np.float64)
    kd = 0.55

    # SH9: E = πL0 for a constant env (up to the O(1/H²) projection
    # quadrature of the near-zero higher-band coefficients)
    e = sh9_irradiance(jnp.asarray([[0.0, 1.0, 0.0], [0.577, -0.577, 0.577]]),
                       sh9_project(env))
    np.testing.assert_allclose(np.asarray(e), np.pi * L0, rtol=1e-3)

    # sampled paths through the real lobe
    pts = jnp.zeros((4, 3))
    nrm = jnp.asarray(
        [[0, 1, 0], [1, 0, 0], [0, 0, -1], [0.577, 0.577, -0.577]], jnp.float32
    )
    eye = jnp.asarray([0.0, 0.0, 10.0], jnp.float32)
    params = jnp.full((4, 3, 1), kd, jnp.float32)
    for method, n, tol in (("uniform", 4096, 2e-2), ("importance", 8192, 2e-2)):
        dirs, rad = env_to_lights(env, n=n, method=method)
        out = shade_env_samples(
            "lambert", params, pts, nrm, eye,
            jnp.asarray(dirs), jnp.asarray(rad),
        )
        np.testing.assert_allclose(np.asarray(out), kd * L0, rtol=tol)


def test_sh9_irradiance_matches_quadrature():
    """For a band-limited environment the SH9 irradiance is exact (up to
    pixel quadrature): compare against brute-force ∫L⟨n·ω⟩dω."""
    env, _ = _smooth_env()
    h, w, c = env.shape
    coeffs = sh9_project(env)
    rng = np.random.default_rng(1)
    n = rng.normal(size=(32, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)

    dirs = latlong_directions(h, w).reshape(-1, 3)
    dw = latlong_solid_angles(h, w).reshape(-1)
    cosg = np.maximum(n @ dirs.T, 0.0)                       # (32, HW)
    brute = np.einsum("np,p,pc->nc", cosg, dw, env.reshape(-1, c))

    got = np.asarray(sh9_irradiance(jnp.asarray(n), coeffs))
    np.testing.assert_allclose(got, brute, rtol=5e-3, atol=5e-3)


def test_sh9_projection_roundtrip():
    """Projecting a band-limited env recovers its generating coefficients."""
    env, coeffs = _smooth_env(h=128, w=256, seed=2)
    got = sh9_project(env)
    np.testing.assert_allclose(got, coeffs, rtol=5e-3, atol=5e-4)


def test_single_pixel_env_equals_directional_light():
    """A one-hot environment behaves as a single directional light with
    radiance L·Δω — exact for importance sampling (all samples hit it)."""
    h, w = 32, 64
    env = np.zeros((h, w, 3))
    iy, ix = 10, 37
    env[iy, ix] = (4.0, 2.0, 1.0)
    dirs, rad = env_to_lights(env, n=16, method="importance")
    d0 = latlong_directions(h, w)[iy, ix]
    dw0 = latlong_solid_angles(h, w)[iy, ix]
    np.testing.assert_allclose(dirs, np.broadcast_to(d0, dirs.shape), atol=1e-12)
    np.testing.assert_allclose(rad.sum(0), env[iy, ix] * dw0, rtol=1e-6)

    # shading equals the lobe evaluated at that direction, weighted by L·Δω
    rng = np.random.default_rng(3)
    nrm = rng.normal(size=(8, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = jnp.asarray(nrm, jnp.float32)
    pts = jnp.zeros((8, 3), jnp.float32)
    eye = jnp.asarray([0.0, 0.0, 10.0], jnp.float32)
    params = jnp.asarray(
        np.abs(rng.normal(size=(8, 3, 3))).clip(0.1, 0.9), jnp.float32
    )
    out = shade_env_samples(
        "blinn_phong", params, pts, nrm, eye, jnp.asarray(dirs), jnp.asarray(rad)
    )
    ang = directional_angles(nrm, pts, eye, jnp.asarray(d0[None], jnp.float32))
    lobe = MODELS["blinn_phong"].fn(
        params, jax.tree_util.tree_map(lambda a: a[:, None, :], ang)
    )[..., 0]                                               # (8, 3)
    want = lobe * (env[iy, ix] * dw0)[None, :]
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-7)


def test_lookup_latlong_bilinear_consistency():
    """Looking up a pixel-center direction returns that pixel's value."""
    env, _ = _smooth_env(h=16, w=32, seed=4)
    d = latlong_directions(16, 32)
    got = lookup_latlong(env, d.reshape(-1, 3)).reshape(env.shape)
    np.testing.assert_allclose(got, env, rtol=1e-10)


def test_aniso_model_under_env():
    """IBL works through tangent-frame models too (shade_env_samples builds
    the extended channels when the spec demands them)."""
    env, _ = _smooth_env(seed=5)
    dirs, rad = env_to_lights(env, n=128, method="uniform")
    rng = np.random.default_rng(6)
    nrm = rng.normal(size=(8, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    params = np.stack(
        [
            rng.uniform(0.2, 0.8, (8, 3)), rng.uniform(0.2, 0.8, (8, 3)),
            rng.uniform(0.2, 0.6, (8, 3)), rng.uniform(0.2, 0.6, (8, 3)),
            rng.uniform(-1.0, 1.0, (8, 3)),
        ],
        axis=-1,
    )
    out = shade_env_samples(
        "cook_torrance_aniso",
        jnp.asarray(params, jnp.float32),
        jnp.zeros((8, 3), jnp.float32),
        jnp.asarray(nrm, jnp.float32),
        jnp.asarray([0.0, 0.0, 10.0], jnp.float32),
        jnp.asarray(dirs), jnp.asarray(rad),
    )
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()


def test_relight_env_scene():
    """Scene-level IBL render: covered pixels lit, background untouched, and
    a constant env reproduces the furnace value on a Lambert-ish fit."""
    from test_pipeline import _make_synthetic_scene

    scene, _ = _make_synthetic_scene()
    from brdf_tpu.pipeline.envlight import relight_env

    t = scene.mesh.num_faces
    kd = np.full((t, 3, 1), 0.5, np.float32)
    env = np.full((16, 32, 3), 1.0, np.float64)
    img = relight_env(
        "lambert", scene, kd, np.arange(t), env,
        view=0, n_samples=2048, method="uniform", background=-1.0,
    )
    rm = scene.raster_map(0)
    assert (img[~rm.coverage] == -1.0).all()
    lit = img[rm.coverage]
    # interior pixels integrate the full visible hemisphere → ≈ kd·L0;
    # allow slack for self-occlusion at silhouettes (no shadowing term)
    med = np.median(lit)
    assert abs(med - 0.5) < 0.05, med
