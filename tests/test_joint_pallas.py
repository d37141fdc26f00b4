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
