"""Pallas fast tier for the m=9 joint normal-map fit (BASELINE config 4).

The chunked NE kernel evaluates angles + their (nu, nv) chain-rule partials
in-kernel from geometry (``ops/lm_pallas.py::_joint_ne_kernel``) — the
bounded/joint hard part SURVEY.md §7 names, previously XLA-only (VERDICT r2
missing #2). All kernels run in interpret mode on the CPU conftest platform;
reference is autodiff of the jnp joint model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brdf_tpu.models.brdf import shading_geometry
from brdf_tpu.models.normalmap import joint_eval, joint_residual, joint_spec
from brdf_tpu.ops.lm_pallas import (
    joint_value_and_grad_pallas,
    lm_fit_joint_pallas_chunked,
)
from brdf_tpu.solver.lm import LMOptions, levmar_bc


def _problem(t=96, v=16, seed=0, base="cook_torrance"):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(t, 3))
    n = rng.normal(size=(t, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    eye = np.array([0.0, 0.0, 10.0])
    lights = rng.normal(size=(v, 3)) * 4 + np.array([0, 0, 8.0])
    geom = shading_geometry(
        jnp.asarray(pts, jnp.float32), jnp.asarray(n, jnp.float32),
        jnp.asarray(eye, jnp.float32), jnp.asarray(lights, jnp.float32),
    )
    spec = joint_spec(base, max_tilt=0.6)
    true_p = np.zeros((t, 9), np.float32)
    true_p[:, 0:3] = rng.uniform(0.2, 0.8, (t, 3))
    true_p[:, 3:6] = rng.uniform(0.3, 0.9, (t, 3))
    true_p[:, 6] = rng.uniform(0.2, 0.7, t)
    true_p[:, 7] = rng.uniform(-0.3, 0.3, t)
    true_p[:, 8] = rng.uniform(-0.3, 0.3, t)
    target = joint_eval(spec, jnp.asarray(true_p), geom)   # (T, V, 3)
    return geom, spec, jnp.asarray(true_p), target, rng


@pytest.mark.parametrize("base", ["cook_torrance", "blinn_phong"])
def test_joint_value_and_grad_matches_autodiff(base):
    """One fused pass == value_and_grad of the jnp joint loss, INCLUDING the
    normal-offset columns (gradients through the angles)."""
    geom, spec, true_p, target, rng = _problem(t=70, v=5, base=base)
    params = jnp.asarray(
        np.asarray(true_p) * rng.uniform(0.85, 1.15, true_p.shape).astype(np.float32)
    )
    w = jnp.asarray(rng.uniform(0.2, 1.0, target.shape[:2]), jnp.float32)

    chi2, g = joint_value_and_grad_pallas(
        base, params, geom, target, weights=w,
        block_t=128, view_block=4, interpret=True,
    )

    def loss(p):
        r = (joint_eval(spec, p, geom) - target) * w[..., None]
        return 0.5 * jnp.sum(r * r), jnp.sum(r * r, axis=(1, 2))

    (_, ref_chi2), g_ref = jax.value_and_grad(loss, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(chi2), np.asarray(ref_chi2),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)


def test_joint_chunked_fit_recovers_truth():
    """The m=9 chunked engine solves config-4 synthetic problems: χ² → 0 and
    the recovered shading normal matches the truth (offsets are identifiable
    only through the normal they produce)."""
    geom, spec, true_p, target, rng = _problem(t=96, v=16, seed=2)
    p0 = jnp.broadcast_to(
        jnp.asarray([0.5] * 6 + [0.4, 0.0, 0.0], jnp.float32), (96, 9)
    )
    res = lm_fit_joint_pallas_chunked(
        "cook_torrance", geom, target, p0,
        opts=LMOptions(eps1=1e-9, eps2=1e-9, eps3=1e-18, itmax=120),
        lower=tuple(spec.lower), upper=tuple(spec.upper),
        block_t=128, view_block=8, interpret=True,
    )
    chi2 = np.asarray(res.chi2)
    assert np.median(chi2) < 1e-9

    from brdf_tpu.models.normalmap import tangent_basis

    def normals_of(p):
        t_, b_ = tangent_basis(geom.n)
        n_new = geom.n + p[:, 7, None] * t_ + p[:, 8, None] * b_
        return n_new / jnp.linalg.norm(n_new, axis=-1, keepdims=True)

    conv = chi2 < 1e-9
    assert conv.mean() > 0.7
    cos = (np.asarray(normals_of(true_p)) * np.asarray(normals_of(res.p))).sum(-1)
    assert np.median(np.degrees(np.arccos(np.clip(cos[conv], -1, 1)))) < 0.5
    kd_err = np.abs(np.asarray(res.p[:, 0:3]) - np.asarray(true_p[:, 0:3]))
    assert np.median(kd_err[conv]) < 0.02


def test_joint_chunked_matches_xla_tier():
    """Pallas joint tier vs vmapped levmar_bc on the identical problem: the
    two tiers land on the same fits (different damping schedules allowed —
    one-solve-per-iteration vs inner retry — but same minima)."""
    geom, spec, true_p, target, rng = _problem(t=64, v=16, seed=3)
    p0 = jnp.asarray(
        np.asarray(true_p)
        * rng.uniform(0.9, 1.1, true_p.shape).astype(np.float32)
    )
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=80)
    r_p = lm_fit_joint_pallas_chunked(
        "cook_torrance", geom, target, p0, opts=opts,
        lower=tuple(spec.lower), upper=tuple(spec.upper),
        block_t=128, view_block=8, interpret=True,
    )
    w = jnp.ones(target.shape[:2], jnp.float32)
    r_x = levmar_bc(
        joint_residual(spec), p0, spec.lower, spec.upper,
        data=(geom, target, w), opts=opts,
    )
    chi2_p = np.asarray(r_p.chi2)
    chi2_x = np.asarray(r_x.chi2)
    assert np.median(chi2_p) < 1e-9 and np.median(chi2_x) < 1e-9
    both = (chi2_p < 1e-9) & (chi2_x < 1e-9)
    assert both.mean() > 0.8
    np.testing.assert_allclose(
        np.asarray(r_p.p)[both], np.asarray(r_x.p)[both], rtol=5e-2, atol=5e-3
    )


def test_fit_joint_normalmap_engine_parity():
    """The driver-level entry: fit_joint_normalmap(engine='pallas') routes
    through the chunked tier and matches engine='xla'."""
    from brdf_tpu.pipeline.fit import TexelProblem, fit_joint_normalmap
    from brdf_tpu.models.brdf import angles_from_geometry

    geom, spec, true_p, target, rng = _problem(t=48, v=16, seed=4)
    problem = TexelProblem(
        angles=angles_from_geometry(geom),
        intensity=target,
        weights=jnp.ones(target.shape[:2], jnp.float32),
        face_ids=np.arange(48),
        geometry=geom,
    )
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=80)
    res_p, _ = fit_joint_normalmap(problem, opts=opts, engine="pallas")
    res_x, _ = fit_joint_normalmap(problem, opts=opts, engine="xla")
    chi2_p = np.asarray(res_p.chi2)
    chi2_x = np.asarray(res_x.chi2)
    assert np.median(chi2_p) < 1e-8 and np.median(chi2_x) < 1e-8
    # the engines must AGREE: same texels converge (hard grid-init starts
    # legitimately strand some — identically in both tiers)
    conv_p = chi2_p < 1e-8
    conv_x = chi2_x < 1e-8
    assert conv_p.mean() > 0.5
    assert (conv_p ^ conv_x).mean() <= 0.1


def test_fit_joint_normalmap_sharded_mesh():
    """Config 4 over a device mesh: the joint fit shard_maps over the texel
    axis (padded to the axis size) and matches the single-device solve."""
    from brdf_tpu.pipeline.fit import TexelProblem, fit_joint_normalmap
    from brdf_tpu.models.brdf import angles_from_geometry
    from brdf_tpu.parallel.mesh import make_mesh

    t = 50                                # deliberately not divisible by 8
    geom, spec, true_p, target, rng = _problem(t=t, v=16, seed=5)
    problem = TexelProblem(
        angles=angles_from_geometry(geom),
        intensity=target,
        weights=jnp.ones(target.shape[:2], jnp.float32),
        face_ids=np.arange(t),
        geometry=geom,
    )
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=60)
    mesh = make_mesh(data=8, view=1, devices=jax.devices()[:8])
    res_m, _ = fit_joint_normalmap(problem, opts=opts, engine="xla", mesh=mesh)
    res_1, _ = fit_joint_normalmap(problem, opts=opts, engine="xla")
    assert np.asarray(res_m.p).shape == (t, 9)
    np.testing.assert_allclose(np.asarray(res_m.p), np.asarray(res_1.p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(res_m.stop), np.asarray(res_1.stop))


# ---------------------------------------------------------------------------
# round 5: per-channel weights + IRLS through the joint tier (VERDICT r4 #1)
# ---------------------------------------------------------------------------


def _joint_problem_of(t, target, geom):
    from brdf_tpu.pipeline.fit import TexelProblem
    from brdf_tpu.models.brdf import angles_from_geometry

    return TexelProblem(
        angles=angles_from_geometry(geom),
        intensity=target,
        weights=jnp.ones(target.shape[:2], jnp.float32),
        face_ids=np.arange(t),
        geometry=geom,
    )


@pytest.mark.parametrize("engine", ["xla", "pallas"])
def test_joint_per_channel_saturation_mask(engine):
    """Saturated measurements are masked PER CHANNEL in the joint tier:
    poisoning channel-2 values that sit at the sensor ceiling changes
    nothing, while the other channels keep their (sub-ceiling) views."""
    from brdf_tpu.pipeline.fit import fit_joint_normalmap

    t = 48
    geom, spec, true_p, target, rng = _problem(t=t, v=16, seed=6)
    target = jnp.clip(target, 0.0, 0.95)
    # push channel 2 of views 10.. to the ceiling, then poison them harder
    sat = jnp.asarray(target).at[:, 10:, 2].set(0.99)
    poisoned = sat.at[:, 10:, 2].set(123.0)
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=40)
    kw = dict(opts=opts, engine=engine, mask_saturation=True)
    r_sat, _ = fit_joint_normalmap(_joint_problem_of(t, sat, geom), **kw)
    r_poi, _ = fit_joint_normalmap(_joint_problem_of(t, poisoned, geom), **kw)
    np.testing.assert_array_equal(np.asarray(r_sat.p), np.asarray(r_poi.p))

    # and with masking OFF the poison must change the fit (the mask is real)
    r_off, _ = fit_joint_normalmap(
        _joint_problem_of(t, poisoned, geom), opts=opts, engine=engine,
        mask_saturation=False,
    )
    assert not np.array_equal(np.asarray(r_off.p), np.asarray(r_poi.p))


def test_joint_irls_rejects_poisoned_view():
    """IRLS robust reweighting reaches the joint tier: a grossly wrong
    (sub-ceiling) view is downweighted and the joint fit recovers the
    truth far better than the non-robust fit."""
    from brdf_tpu.pipeline.fit import fit_joint_normalmap
    from brdf_tpu.models.normalmap import tangent_basis

    t = 48
    geom, spec, true_p, target, rng = _problem(t=t, v=16, seed=7)
    target = jnp.clip(target, 0.0, 0.9)
    poisoned = jnp.asarray(target).at[:, 5, :].set(0.93)   # below the ceiling
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=40)

    r_rob, _ = fit_joint_normalmap(
        _joint_problem_of(t, poisoned, geom), opts=opts, engine="xla",
        robust="tukey", robust_iters=2,
    )
    r_raw, _ = fit_joint_normalmap(
        _joint_problem_of(t, poisoned, geom), opts=opts, engine="xla",
    )

    def chi2_clean(p):
        pred = joint_eval(spec, jnp.asarray(p), geom)
        r = np.asarray(pred) - np.asarray(target)
        keep = np.ones(16, bool)
        keep[5] = False
        return (r[:, keep] ** 2).sum((1, 2))

    c_rob = chi2_clean(r_rob.p)
    c_raw = chi2_clean(r_raw.p)
    # the robust fit explains the CLEAN views far better
    assert np.median(c_rob) < np.median(c_raw) * 0.5


def test_joint_pallas_per_channel_weights_match_autodiff():
    """The m=9 NE kernel with a (T, V, 3) per-channel weight stack matches
    autodiff of the per-channel-weighted joint loss."""
    geom, spec, true_p, target, rng = _problem(t=70, v=5)
    params = jnp.asarray(
        np.asarray(true_p) * rng.uniform(0.85, 1.15, true_p.shape).astype(np.float32)
    )
    w3 = jnp.asarray(rng.uniform(0.2, 1.0, target.shape), jnp.float32)
    w3 = w3.at[:, 2, 1].set(0.0)

    chi2, g = joint_value_and_grad_pallas(
        "cook_torrance", params, geom, target, weights=w3,
        block_t=128, view_block=4, interpret=True,
    )

    def loss(p):
        r = (joint_eval(spec, p, geom) - target) * w3
        return 0.5 * jnp.sum(r * r), jnp.sum(r * r, axis=(1, 2))

    (_, ref_chi2), g_ref = jax.value_and_grad(loss, has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(chi2), np.asarray(ref_chi2),
                               rtol=5e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-4)


def test_joint_fit_with_view_gains_recovers_rig():
    """fit_joint_normalmap_with_gains recovers a known per-view gain
    pattern: synthetic measurements scaled by non-uniform 'LED intensities'
    fit better with gains than without, and the fitted gains match."""
    from brdf_tpu.pipeline.fit import (
        fit_joint_normalmap,
        fit_joint_normalmap_with_gains,
    )

    t = 192
    geom, spec, true_p, target, rng = _problem(t=t, v=16, seed=9)
    target = jnp.clip(target, 0.0, 0.9)
    true_g = np.asarray(rng.uniform(0.8, 1.25, 16), np.float32)
    true_g /= true_g.mean()
    scaled = jnp.asarray(np.asarray(target) * true_g[None, :, None])
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=40)

    res_g, jspec, gains = fit_joint_normalmap_with_gains(
        _joint_problem_of(t, scaled, geom), rounds=2, opts=opts, engine="xla",
    )
    # fitted gains track the true rig pattern (normalized, compare shape;
    # the bar is correlation, not equality — the joint model legitimately
    # absorbs part of a per-view gain into per-texel normals/kd, so the
    # nuisance estimate sharpens with texel count but never isolates
    # perfectly at test scale)
    corr = np.corrcoef(gains, true_g)[0, 1]
    assert corr > 0.8, (gains, true_g)

    def mae_against_scan(p, g):
        pred = np.asarray(joint_eval(jspec, jnp.asarray(p), geom))
        if g is not None:
            pred = pred * np.asarray(g)[None, :, None]
        return float(np.abs(pred - np.asarray(scaled)).mean())

    res_0, _ = fit_joint_normalmap(
        _joint_problem_of(t, scaled, geom), opts=opts, engine="xla",
    )
    assert mae_against_scan(res_g.p, gains) < mae_against_scan(res_0.p, None)


def test_fit_joint_normalmap_aniso_base():
    """The m=11 anisotropic joint tier through the driver entry (engine
    xla; pallas/varpro correctly refuse the non-m=9 layout)."""
    from brdf_tpu.pipeline.fit import fit_joint_normalmap
    from brdf_tpu.models.brdf import angles_from_geometry
    from brdf_tpu.models.normalmap import joint_eval as jeval, joint_spec
    from brdf_tpu.pipeline.fit import TexelProblem

    t = 32
    rng = np.random.default_rng(8)
    pts = rng.normal(size=(t, 3))
    n = rng.normal(size=(t, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    eye = np.array([0.0, 0.0, 10.0])
    lights = rng.normal(size=(16, 3)) * 4 + np.array([0, 0, 8.0])
    geom = shading_geometry(
        jnp.asarray(pts, jnp.float32), jnp.asarray(n, jnp.float32),
        jnp.asarray(eye, jnp.float32), jnp.asarray(lights, jnp.float32),
    )
    spec = joint_spec("cook_torrance_aniso", max_tilt=0.6)
    true_p = np.zeros((t, 11), np.float32)
    true_p[:, 0:3] = rng.uniform(0.2, 0.8, (t, 3))
    true_p[:, 3:6] = rng.uniform(0.3, 0.9, (t, 3))
    true_p[:, 6:8] = rng.uniform(0.3, 0.7, (t, 2))
    true_p[:, 8] = rng.uniform(-1.0, 1.0, t)
    true_p[:, 9:11] = rng.uniform(-0.2, 0.2, (t, 2))
    target = jnp.clip(jeval(spec, jnp.asarray(true_p), geom), 0.0, 0.95)
    from brdf_tpu.models.brdf import angles_from_geometry as afg

    problem = TexelProblem(
        angles=afg(geom, tangent_frame=True),
        intensity=target,
        weights=jnp.ones(target.shape[:2], jnp.float32),
        face_ids=np.arange(t),
        geometry=geom,
    )
    opts = LMOptions(eps1=1e-8, eps2=1e-8, eps3=1e-16, itmax=40)
    res, rspec = fit_joint_normalmap(
        problem, "cook_torrance_aniso", opts=opts, engine="xla",
    )
    assert rspec.n_params == 11
    assert np.asarray(res.p).shape == (t, 11)
    assert np.isfinite(np.asarray(res.chi2)).all()
    assert np.median(np.asarray(res.chi2)) < 1e-4

    with pytest.raises(ValueError, match="m=9"):
        fit_joint_normalmap(problem, "cook_torrance_aniso", opts=opts,
                            engine="pallas")
