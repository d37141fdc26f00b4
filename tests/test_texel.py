"""Pixel-level texelization: reprojection sampling, visibility, and the
closed-loop pixel-granularity fit."""

import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.geometry.texel import pixel_texels, sample_views
from brdf_tpu.pipeline import build_pixel_problem, fit_per_texel

from test_pipeline import _make_synthetic_scene


@pytest.fixture(scope="module")
def synthetic():
    return _make_synthetic_scene(subdiv=3)


def test_pixel_texels_on_surface(synthetic):
    scene, _ = synthetic
    tex = pixel_texels(scene.mesh, scene.raster_map(0), stride=2)
    # every texel's position lies on the sphere (radius 30 around center)
    d = np.linalg.norm(tex.points - np.array([0.0, 150.0, 120.0]), axis=-1)
    np.testing.assert_allclose(d, 30.0, atol=0.5)
    assert np.allclose(np.linalg.norm(tex.normals, axis=-1), 1.0, atol=1e-5)


def test_sample_views_visibility(synthetic):
    scene, _ = synthetic
    tex = pixel_texels(scene.mesh, scene.raster_map(0), stride=2)
    intensity, weights = sample_views(tex, scene)
    assert intensity.shape == (len(tex.points), scene.num_views, 3)
    # single shared camera: every texel visible in (at least almost) all views
    assert weights.mean() > 0.95
    # sampled intensity at the reference view ≈ the image pixel (small
    # bilinear blend from f32 reprojection jitter at the half-pixel center)
    ref = scene.images[0][tex.pixels[:, 1], tex.pixels[:, 0]]
    err = np.abs(intensity[:, 0] - ref)
    assert np.median(err) < 1e-3
    assert err.max() < 0.05


def test_pixel_granularity_joint_fit(synthetic):
    """Config 4 at the reference's native granularity: a pixel-level problem
    built with geometry feeds the m=9 joint normal-map fit end-to-end (the
    per-PIXEL normal-map estimation path)."""
    from brdf_tpu.pipeline.fit import fit_joint_normalmap
    from brdf_tpu.solver.lm import LMOptions

    scene, _ = _make_synthetic_scene(subdiv=2, seed=5)
    prob = build_pixel_problem(scene, stride=4, smooth_normals=False,
                               with_geometry=True)
    res, jspec = fit_joint_normalmap(
        prob, "cook_torrance",
        opts=LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=10),
        engine="xla",
    )
    t = len(prob.face_ids)
    assert res.p.shape == (t, 9)
    assert bool(jnp.isfinite(res.chi2).all())
    # flat-shaded synthetic data with matching face normals: the fitted
    # tangent offsets should stay small
    off = np.abs(np.asarray(res.p[:, 7:9]))
    assert np.median(off) < 0.15


def test_pixel_problem_fit_quality(synthetic):
    """Pixel-granularity fit on the synthetic scene reaches the noise floor
    (flat-shaded generation; texels use face normals to match)."""
    scene, true_params = _make_synthetic_scene(subdiv=2, seed=5)
    prob = build_pixel_problem(scene, stride=3, smooth_normals=False)
    rep = fit_per_texel(prob, "blinn_phong")
    chi2 = np.asarray(rep.result.chi2)
    seen = np.asarray(prob.weights).sum(-1) >= 8
    sel = seen.nonzero()[0]
    assert np.median(chi2[sel]) < 1e-6
    # per-pixel params should match the generating per-face params
    kd_fit = rep.params[:, :, 0]
    kd_true = true_params[prob.face_ids][:, :, 0]
    assert np.median(np.abs(kd_fit - kd_true)[seen]) < 0.02
