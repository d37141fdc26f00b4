"""Anisotropic lobes: isotropic reduction, rotation symmetry/equivariance,
and synthetic round-trip recovery (the expfit.c pattern, SURVEY.md §4 item 4).

The reference had no anisotropic model at all (Phong family only,
``/root/reference/brdfdata.cpp:969-989``); these lobes are framework
extensions, so they are validated intrinsically: exact reduction to the
isotropic registry lobes, the period-π orientation symmetry, and equivariance
under a physical rotation of the tangent frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu import LMOptions, MODELS, levmar_bc, shading_angles
from brdf_tpu.models.brdf import ShadingAngles, angles_from_geometry, shading_geometry
from brdf_tpu.models.normalmap import tangent_basis
from brdf_tpu.solver.init import linear_grid_init

ANISO = {"ward_aniso": "ward", "cook_torrance_aniso": "cook_torrance"}


def _scene(rng, t=64, v=32, dtype=jnp.float64):
    pts = jnp.asarray(rng.normal(size=(t, 3)), dtype)
    n = rng.normal(size=(t, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    eye = jnp.asarray([0.0, 0.0, 10.0], dtype)
    lights = jnp.asarray(rng.normal(size=(v, 3)) * 5 + np.array([0, 0, 8.0]), dtype)
    return pts, jnp.asarray(n, dtype), eye, lights


@pytest.mark.parametrize("model,iso", sorted(ANISO.items()))
def test_reduces_to_isotropic(model, iso):
    """alpha_x == alpha_y must reproduce the isotropic lobe exactly, for any
    orientation phi (the distribution and visibility become rotation
    invariant)."""
    rng = np.random.default_rng(0)
    pts, n, eye, lights = _scene(rng)
    ang = shading_angles(pts, n, eye, lights, tangent_frame=True)
    t = pts.shape[0]
    kd = rng.uniform(0.1, 0.9, t)
    ks = rng.uniform(0.2, 1.0, t)
    a = rng.uniform(0.1, 0.9, t)
    phi = rng.uniform(-np.pi / 2, np.pi / 2, t)
    p_iso = jnp.asarray(np.stack([kd, ks, a], -1))
    p_ani = jnp.asarray(np.stack([kd, ks, a, a, phi], -1))
    want = np.asarray(MODELS[iso].fn(p_iso, ang))
    got = np.asarray(MODELS[model].fn(p_ani, ang))
    # exact agreement on the physical domain; outside it the aniso lobe is
    # strictly horizon-masked (pure diffuse) while the isotropic cosine
    # parameterization evaluates its clamped legacy form
    lit = (
        (np.asarray(ang.cos_ln) > 0)
        & (np.asarray(ang.cos_vn) > 0)
        & (np.asarray(ang.cos_nh) > 0)
    )
    assert lit.mean() > 0.25
    np.testing.assert_allclose(got[lit], want[lit], rtol=1e-12, atol=1e-12)
    diff_only = np.asarray(
        MODELS["lambert"].fn(jnp.asarray(kd[:, None]), ang)
    ) if iso == "cook_torrance" else None
    if diff_only is not None:
        np.testing.assert_allclose(got[~lit], diff_only[~lit], rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("model", sorted(ANISO))
def test_phi_has_period_pi(model):
    rng = np.random.default_rng(1)
    pts, n, eye, lights = _scene(rng)
    ang = shading_angles(pts, n, eye, lights, tangent_frame=True)
    t = pts.shape[0]
    p = np.stack(
        [
            rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t),
            rng.uniform(0.1, 0.9, t), rng.uniform(0.1, 0.9, t),
            rng.uniform(-0.5, 0.5, t),
        ],
        -1,
    )
    p_shift = p.copy()
    p_shift[:, 4] += np.pi
    a = MODELS[model].fn(jnp.asarray(p), ang)
    b = MODELS[model].fn(jnp.asarray(p_shift), ang)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("model", sorted(ANISO))
def test_rotation_equivariance(model):
    """Physically rotating the tangent frame by -phi around N and fitting
    phi=0 must equal the canonical frame with orientation parameter phi:
    the parameter is a true in-plane rotation, not an ad-hoc mixing."""
    rng = np.random.default_rng(2)
    pts, n, eye, lights = _scene(rng, t=16, v=8)
    geom = shading_geometry(pts, n, eye, lights)
    ang = angles_from_geometry(geom, tangent_frame=True)

    phi = 0.37
    tb, bb = tangent_basis(geom.n)
    c, s = np.cos(phi), np.sin(phi)
    t_rot = c * tb + s * bb          # frame rotated by +phi around n
    b_rot = -s * tb + c * bb

    h = geom.l + geom.v
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    rot = ang._replace(
        cos_th=jnp.sum(t_rot[..., None, :] * h, -1),
        cos_bh=jnp.sum(b_rot[..., None, :] * h, -1),
        cos_tl=jnp.sum(t_rot[..., None, :] * geom.l, -1),
        cos_bl=jnp.sum(b_rot[..., None, :] * geom.l, -1),
        cos_tv=jnp.sum(t_rot[..., None, :] * geom.v, -1),
        cos_bv=jnp.sum(b_rot[..., None, :] * geom.v, -1),
    )
    t_count = pts.shape[0]
    base = np.stack(
        [
            rng.uniform(0.1, 0.9, t_count), rng.uniform(0.2, 1.0, t_count),
            rng.uniform(0.1, 0.9, t_count), rng.uniform(0.1, 0.9, t_count),
            np.zeros(t_count),
        ],
        -1,
    )
    with_param = base.copy()
    with_param[:, 4] = phi
    got = MODELS[model].fn(jnp.asarray(with_param), ang)     # canonical + phi
    want = MODELS[model].fn(jnp.asarray(base), rot)          # rotated frame, phi=0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("model", sorted(ANISO))
def test_roundtrip_recovery(model):
    """Synthesize intensities from known anisotropic parameters and fit them
    back with grid init + box-constrained LM; assert the fit explains the
    data to solver precision (parameters can alias under the
    (swap αx↔αy, phi±π/2) symmetry, so the residual is the invariant)."""
    rng = np.random.default_rng(3)
    t, v = 128, 48
    pts, n, eye, lights = _scene(rng, t=t, v=v)
    ang = shading_angles(pts, n, eye, lights, tangent_frame=True)
    spec = MODELS[model]

    true_p = np.stack(
        [
            rng.uniform(0.2, 0.8, t), rng.uniform(0.3, 1.0, t),
            rng.uniform(0.15, 0.5, t), rng.uniform(0.3, 0.9, t),
            rng.uniform(-1.2, 1.2, t),
        ],
        -1,
    )
    target = spec.fn(jnp.asarray(true_p), ang)

    p0 = linear_grid_init(model, ang, target)

    def residual(p, data):
        a, y = data
        return spec.fn(p, a) - y

    res = levmar_bc(
        residual, p0, spec.lower, spec.upper, data=(ang, target),
        opts=LMOptions(eps1=1e-10, eps2=1e-12, eps3=1e-20, itmax=120),
    )
    rms = np.sqrt(np.asarray(res.chi2) / v)
    scale = np.sqrt(np.mean(np.asarray(target) ** 2, -1)) + 1e-9
    # at least 90% of texels explained to < 1% relative RMS
    frac = np.mean(rms / scale < 1e-2)
    assert frac > 0.9, f"only {frac:.2%} of texels fit (median rel-rms {np.median(rms/scale):.3g})"


def test_fit_per_texel_guard_message():
    """fit_per_texel must refuse tangent-less problems for aniso models with
    an actionable error (and upgrade silently when geometry is available)."""
    from brdf_tpu.pipeline.fit import TexelProblem, fit_per_texel

    rng = np.random.default_rng(4)
    pts, n, eye, lights = _scene(rng, t=8, v=4, dtype=jnp.float32)
    ang = shading_angles(pts, n, eye, lights)
    prob = TexelProblem(
        angles=ang,
        intensity=jnp.zeros((8, 4, 3), jnp.float32),
        weights=jnp.ones((8, 4), jnp.float32),
        face_ids=np.arange(8),
    )
    with pytest.raises(ValueError, match="tangent"):
        fit_per_texel(prob, model="ward_aniso")
