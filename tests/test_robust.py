"""Robust fitting: saturation masking and IRLS outlier rejection."""

import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.solver.init import linear_grid_init
from brdf_tpu.solver.lm import LMOptions, levmar_bc
from brdf_tpu.solver.robust import robust_weights, saturation_weights


def test_saturation_weights():
    x = jnp.asarray([[0.1, 0.5, 0.99, 1.0]])
    w = saturation_weights(x)
    np.testing.assert_allclose(np.asarray(w), [[1, 1, 0, 0]])


def _problem(t=256, v=16, seed=0):
    rng = np.random.default_rng(seed)
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float64),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float64),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float64),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float64),
    )
    true_p = np.stack(
        [rng.uniform(0.2, 0.8, t), rng.uniform(0.3, 0.9, t), rng.uniform(3, 15, t)], -1
    )
    target = MODELS["blinn_phong"].fn(jnp.asarray(true_p), ang)
    return ang, target, true_p, rng


def test_irls_rejects_shadowed_views():
    """Zero out 3 views per texel (cast shadows); plain LS is biased, two
    Tukey IRLS rounds recover the unshadowed fit."""
    ang, clean, true_p, rng = _problem()
    t, v = clean.shape
    shadow = np.zeros((t, v), bool)
    for i in range(t):
        shadow[i, rng.choice(v, size=3, replace=False)] = True
    corrupted = jnp.where(jnp.asarray(shadow), 0.0, clean)

    spec = MODELS["blinn_phong"]

    def residual(p, data):
        a, y, w = data
        return (spec.fn(p, a) - y) * w

    opts = LMOptions(eps1=1e-10, eps2=1e-10, eps3=1e-20, itmax=60)
    w0 = jnp.ones_like(corrupted)
    p0 = linear_grid_init("blinn_phong", ang, corrupted)
    res = levmar_bc(residual, p0, spec.lower, spec.upper,
                    data=(ang, corrupted, w0), opts=opts)
    kd_err_ls = np.median(np.abs(np.asarray(res.p[:, 0]) - true_p[:, 0]))

    w = w0
    for _ in range(3):
        pred = spec.fn(res.p, ang)
        w = robust_weights(pred - corrupted, w0, kind="tukey")
        res = levmar_bc(residual, res.p, spec.lower, spec.upper,
                        data=(ang, corrupted, w), opts=opts)
    kd_err_irls = np.median(np.abs(np.asarray(res.p[:, 0]) - true_p[:, 0]))

    assert kd_err_irls < kd_err_ls * 0.5
    assert kd_err_irls < 0.02


def test_robust_weights_shapes_and_range():
    ang, target, _, rng = _problem(t=32)
    r = jnp.asarray(rng.normal(size=target.shape) * 0.01)
    base = jnp.ones_like(target)
    for kind in ("huber", "cauchy", "tukey"):
        w = robust_weights(r, base, kind=kind)
        w_np = np.asarray(w)
        assert w_np.shape == target.shape
        assert (w_np >= 0).all() and (w_np <= 1.0 + 1e-6).all()


def test_fused_irls_matches_manual_rounds():
    """The fori_loop-folded IRLS inside _fit_pipeline_program must be
    semantically identical to running the rounds as separate fits (the
    pre-fold implementation): same weights, same warm starts."""
    import numpy as np
    import jax.numpy as jnp
    from brdf_tpu.models.brdf import MODELS, ShadingAngles
    from brdf_tpu.parallel.fit import fit_texels_sharded
    from brdf_tpu.parallel.mesh import make_mesh
    from brdf_tpu.solver.lm import LMOptions
    from brdf_tpu.solver.robust import robust_weights

    rng = np.random.default_rng(5)
    t, v = 64, 16
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
    )
    spec = MODELS["blinn_phong"]
    true_p = jnp.asarray(
        np.stack([rng.uniform(.2, .8, t), rng.uniform(.3, .9, t),
                  rng.uniform(3, 20, t)], -1), jnp.float32)
    target = np.asarray(spec.fn(true_p, ang))
    # contaminate ~2 views per texel so IRLS actually reweights
    bad = rng.random((t, v)) < 0.12
    target = jnp.asarray(np.where(bad, target + 0.5, target), jnp.float32)

    mesh = make_mesh()
    opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=40)

    fused = fit_texels_sharded("blinn_phong", ang, target, mesh, opts=opts,
                               robust="huber", robust_iters=2)

    res = fit_texels_sharded("blinn_phong", ang, target, mesh, opts=opts)
    w0 = jnp.ones_like(target)
    for _ in range(2):
        w = robust_weights(spec.fn(res.p, ang) - target, w0, kind="huber")
        res = fit_texels_sharded("blinn_phong", ang, target, mesh, opts=opts,
                                 weights=w, p0=res.p)

    # one fused program vs three separate ones reorders f32 accumulations;
    # agreement is to roundoff (measured max rel diff ~7e-4), not bit-exact
    np.testing.assert_allclose(np.asarray(fused.p), np.asarray(res.p),
                               rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.chi2), np.asarray(res.chi2),
                               rtol=5e-3, atol=1e-6)
