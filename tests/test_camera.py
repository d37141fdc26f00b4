"""Camera model: jnp/NumPy projection agreement, distortion round trip,
frustum math."""

import jax.numpy as jnp
import numpy as np

from brdf_tpu.geometry import Camera
from brdf_tpu.geometry.camera import project_np
from brdf_tpu.io import load_cal


def _cup_cam(dtype=jnp.float64):
    cal = load_cal("/root/reference/img/cup/cup.cal")
    return Camera.from_calibration(cal, 800, 600, dtype=dtype)


def test_project_np_matches_jnp():
    cam = _cup_cam()
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3)) * 60 + np.array([80.0, 50.0, 60.0])
    uv_j, z_j = cam.project(jnp.asarray(pts))
    uv_n, z_n = project_np(cam, pts)
    np.testing.assert_allclose(np.asarray(uv_j), uv_n, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(z_j), z_n, rtol=1e-12)


def test_ray_projection_roundtrip():
    """pixel_rays inverts project: project(origin + t·ray) ≈ original pixel."""
    cam = _cup_cam()
    rng = np.random.default_rng(1)
    uv = jnp.asarray(
        np.stack([rng.uniform(50, 750, 64), rng.uniform(50, 550, 64)], -1)
    )
    rays = cam.pixel_rays(uv)
    pts = cam.position[None, :] + 300.0 * rays
    uv_back, z = cam.project(pts)
    assert np.all(np.asarray(z) > 0)
    np.testing.assert_allclose(np.asarray(uv_back), np.asarray(uv), atol=1e-3)


def test_distortion_affects_corners_more():
    cam = _cup_cam()
    center = jnp.asarray([[400.0, 300.0]])
    corner = jnp.asarray([[10.0, 10.0]])
    # rays with and without kappa1
    cam0 = cam._replace(kappa1=jnp.zeros_like(cam.kappa1))
    d_center = float(
        jnp.linalg.norm(cam.pixel_rays(center) - cam0.pixel_rays(center))
    )
    d_corner = float(
        jnp.linalg.norm(cam.pixel_rays(corner) - cam0.pixel_rays(corner))
    )
    assert d_corner > d_center


def test_frustum_params_match_intrinsics():
    cam = _cup_cam()
    l, r, b, t, n, f = (float(x) for x in cam.frustum_params(1.0, 1000.0))
    assert l < 0 < r and b < 0 < t
    # frustum width at the near plane spans the full sensor
    np.testing.assert_allclose(
        (r - l), cam.width / (cam.f * cam.sx), rtol=1e-6
    )
