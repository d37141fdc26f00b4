"""Multi-device semantics on the virtual 8-device CPU mesh: the sharded fit
(psum'd normal equations over the view axis) must reproduce the single-device
result — a guarantee the reference never had (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu import LMOptions, MODELS, levmar_bc, shading_angles
from brdf_tpu.parallel import fit_texels_sharded, make_mesh
from brdf_tpu.solver.init import linear_grid_init


def _scene(t=256, v=16, dtype=jnp.float64, seed=0):
    rng = np.random.default_rng(seed)
    pts = jnp.asarray(rng.normal(size=(t, 3)), dtype)
    n = rng.normal(size=(t, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    eye = jnp.asarray([0.0, 0.0, 10.0], dtype)
    lights = jnp.asarray(rng.normal(size=(v, 3)) * 4 + np.array([0, 0, 8.0]), dtype)
    ang = shading_angles(pts, jnp.asarray(n, dtype), eye, lights)
    true_p = np.stack(
        [rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t), rng.uniform(2, 30, t)],
        -1,
    )
    target = MODELS["blinn_phong"].fn(jnp.asarray(true_p, dtype), ang)
    return ang, target, true_p


def test_eight_devices_available():
    assert jax.device_count() == 8


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_fit_matches_single_device(mesh_shape):
    """With a pinned starting point the sharded solve (psum'd reductions)
    must match the single-device solve tightly. (With a free start,
    non-identifiable texels may legitimately land in different equal-χ²
    optima from last-ulp reduction-order differences, so p0 is fixed here to
    isolate reduction equivalence.)"""
    ang, target, true_p = _scene()
    mesh = make_mesh(data=mesh_shape[0], view=mesh_shape[1])
    opts = LMOptions(eps1=1e-10, eps2=1e-10, eps3=1e-22, itmax=50)
    p0 = jnp.asarray(true_p * 1.05)

    res_sharded = fit_texels_sharded(
        "blinn_phong", ang, target, mesh, opts=opts, p0=p0
    )

    # single-device reference
    spec = MODELS["blinn_phong"]

    def residual(p, data):
        a, y = data
        return spec.fn(p, a) - y

    res_single = levmar_bc(
        residual, p0, spec.lower, spec.upper, data=(ang, target), opts=opts
    )

    assert np.median(np.asarray(res_single.chi2)) < 1e-22
    np.testing.assert_allclose(
        np.asarray(res_sharded.p), np.asarray(res_single.p), rtol=1e-6, atol=1e-8
    )


def test_sharded_fit_converges():
    ang, target, true_p = _scene(t=128)
    mesh = make_mesh(data=4, view=2)
    res = fit_texels_sharded("blinn_phong", ang, target, mesh)
    chi2 = np.asarray(res.chi2)
    assert np.median(chi2) < 1e-12


def test_weights_mask_measurements():
    """Zero-weighted views must not influence the fit (visibility masking).
    p0 is pinned near truth so every texel converges locally (see note on the
    matching test above)."""
    ang, target, true_p = _scene(t=64, v=16)
    mesh = make_mesh(data=8, view=1)
    p0 = jnp.asarray(true_p * 1.05)
    w = jnp.ones_like(target)
    # corrupt the last 4 views but mask them out
    bad_target = target.at[:, 12:].set(99.0)
    w = w.at[:, 12:].set(0.0)
    res_masked = fit_texels_sharded(
        "blinn_phong", ang, bad_target, mesh, weights=w, p0=p0
    )

    ang_trunc = jax.tree.map(lambda a: a[:, :12], ang)
    res_trunc = fit_texels_sharded(
        "blinn_phong", ang_trunc, target[:, :12], make_mesh(data=8, view=1), p0=p0
    )
    np.testing.assert_allclose(
        np.asarray(res_masked.p), np.asarray(res_trunc.p), rtol=1e-6, atol=1e-7
    )


def test_sharded_fit_covers_all_param_counts():
    """The sharded fit path must handle every registry parameter count
    (m=1,2,3,4) now that the fused tier is generic."""
    import numpy as np
    from brdf_tpu.models.brdf import MODELS, ShadingAngles
    from brdf_tpu.parallel.fit import fit_texels_sharded
    from brdf_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    t, v = 256, 16
    ang = ShadingAngles(
        *[jnp.asarray(rng.uniform(0.05, 1, (t, v)), jnp.float32) for _ in range(4)]
    )
    cases = {
        "lambert": [(0.2, 1.0)],
        "oren_nayar": [(0.2, 1.0), (0.2, 1.2)],
        "blinn_phong": [(0.1, 0.9), (0.2, 1.0), (2.0, 25.0)],
        "cook_torrance_fresnel": [(0.1, 0.9), (0.2, 1.0), (0.15, 0.9), (0.2, 0.9)],
    }
    mesh = make_mesh()
    for model, ranges in cases.items():
        tp = jnp.asarray(
            np.stack([rng.uniform(a, b, t) for a, b in ranges], -1), jnp.float32
        )
        y = MODELS[model].fn(tp, ang)
        res = fit_texels_sharded(model, ang, y, mesh)
        med = float(jnp.median(res.chi2))
        assert med < 1e-6, (model, med)


@pytest.mark.parametrize("mesh_shape", [(8, 1), (2, 4)])
def test_sharded_fit_with_production_initializer(mesh_shape):
    """The production path (linear grid init computed sharded + fit) vs the
    same pipeline on one device — coarse tolerance (VERDICT.md Weak #7):
    reduction-order last-ulp differences may flip a handful of
    non-identifiable texels between equal-χ² basins, but the overwhelming
    majority of fits and the χ² distribution must agree."""
    ang, target, true_p = _scene(t=256, seed=7)
    opts = LMOptions(eps1=1e-8, eps2=1e-9, eps3=1e-18, itmax=60)

    mesh = make_mesh(data=mesh_shape[0], view=mesh_shape[1])
    res_sharded = fit_texels_sharded("blinn_phong", ang, target, mesh, opts=opts)

    mesh1 = make_mesh(data=1, view=1, devices=jax.devices()[:1])
    res_single = fit_texels_sharded("blinn_phong", ang, target, mesh1, opts=opts)

    chi2_s = np.asarray(res_sharded.chi2)
    chi2_1 = np.asarray(res_single.chi2)
    assert np.median(chi2_s) < 1e-18 and np.median(chi2_1) < 1e-18
    close = (
        np.abs(np.asarray(res_sharded.p) - np.asarray(res_single.p))
        / np.maximum(np.abs(np.asarray(res_single.p)), 1e-3)
    ).max(-1) < 1e-3
    # view-sharded reductions reorder every Jacobian contraction, so more
    # flat-objective texels drift between equal-chi2 stationary points than
    # under data-only sharding; ~90% identical lanes with equal recovery
    # (asserted below) is the honest bar for the free-init production path
    assert close.mean() > 0.85
    # recovery quality itself must not degrade under sharding
    err_s = (np.abs(np.asarray(res_sharded.p) - true_p)
             / np.maximum(np.abs(true_p), 1e-3)).max(-1)
    err_1 = (np.abs(np.asarray(res_single.p) - true_p)
             / np.maximum(np.abs(true_p), 1e-3)).max(-1)
    assert abs((err_s < 1e-2).mean() - (err_1 < 1e-2).mean()) < 0.05
