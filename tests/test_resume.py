"""Mid-fit checkpoint/resume (SURVEY.md §5): warm solver state (p, μ, ν, stop)
round-trips through chunked fits and on-disk checkpoints.

The reference kept fit results only in memory (``brdfdata.h:49``); this is the
capability it lacked, validated against the single-shot solve."""

import numpy as np
import pytest

import jax.numpy as jnp

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.solver.lm import LMOptions, StopReason, levmar
from brdf_tpu.solver.problems import make_expfit_data


def _exp_residual(p, data):
    t, y = data
    return p[0] * jnp.exp(-p[1] * t) + p[2] - y


def _expfit_batch(b=6):
    t, _ = make_expfit_data()
    rng = np.random.default_rng(7)
    true = np.abs(rng.normal(size=(b, 3))) + np.array([1.0, 0.05, 0.5])
    ys = true[:, 0:1] * np.exp(-true[:, 1:2] * t[None]) + true[:, 2:3]
    data = (jnp.asarray(np.broadcast_to(t, ys.shape)), jnp.asarray(ys))
    p0 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (b, 3))
    return p0, data, true


def test_warm_state_resume_matches_single_shot():
    """Chunked solves (itmax=4 pieces, warm-started) must land where the
    single-shot solve lands: damping state carries over exactly."""
    p0, data, true = _expfit_batch()
    opts = LMOptions(itmax=60)

    full = levmar(_exp_residual, p0, data=data, opts=opts)

    res = levmar(_exp_residual, p0, data=data, opts=opts._replace(itmax=4))
    total_iters = np.asarray(res.iters).copy()
    for _ in range(20):
        warm = res.warm_state()
        if not bool((np.asarray(warm[2]) == 0).any()):
            break
        res = levmar(
            _exp_residual, res.p, data=data, opts=opts._replace(itmax=4),
            warm_state=warm,
        )
        total_iters += np.asarray(res.iters)

    np.testing.assert_allclose(np.asarray(res.p), np.asarray(full.p),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(res.p), true, rtol=1e-4, atol=1e-4)
    # terminated lanes short-circuit: a resumed chunk on a converged lane
    # spends zero iterations
    again = levmar(
        _exp_residual, res.p, data=data, opts=opts._replace(itmax=4),
        warm_state=res.warm_state(),
    )
    assert np.all(np.asarray(again.iters) == 0)
    np.testing.assert_array_equal(np.asarray(again.p), np.asarray(res.p))
    # cumulative chunked work is comparable to the single shot
    assert np.all(total_iters <= np.asarray(full.iters) + 4)


def test_fit_per_texel_checkpoint_resume(tmp_path):
    """Chunked fit writes full solver state; a second run restores it and does
    no further work; results match the unchunked fit."""
    from brdf_tpu.pipeline.fit import TexelProblem, fit_per_texel
    from brdf_tpu.utils.checkpoint import FitCheckpointer, latest_step

    rng = np.random.default_rng(3)
    t, v = 48, 16
    spec = MODELS["blinn_phong"]
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
    )
    true_p = jnp.asarray(
        np.stack([rng.uniform(0.2, 0.8, t), rng.uniform(0.2, 0.8, t),
                  rng.uniform(2, 10, t)], -1), jnp.float32)
    target = spec.fn(true_p, ang)                       # (T, V)
    intensity = jnp.repeat(target[:, :, None], 3, axis=2)
    problem = TexelProblem(
        angles=ang, intensity=intensity,
        weights=jnp.ones((t, v), jnp.float32),
        face_ids=np.arange(t),
    )
    opts = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=24)

    plain = fit_per_texel(problem, "blinn_phong", opts=opts, engine="xla")

    ckpt_dir = str(tmp_path / "ckpt")
    ck = FitCheckpointer(ckpt_dir, every=1, keep=2)
    chunked = fit_per_texel(
        problem, "blinn_phong", opts=opts, engine="xla",
        checkpointer=ck, chunk_iters=6,
    )
    assert latest_step(ckpt_dir) is not None
    np.testing.assert_allclose(chunked.params, plain.params,
                               rtol=1e-4, atol=1e-5)
    assert chunked.converged_fraction() > 0.95

    # resume from the finished checkpoint: restores, adds no iterations
    resumed = fit_per_texel(
        problem, "blinn_phong", opts=opts, engine="xla",
        checkpointer=FitCheckpointer(ckpt_dir, every=1, keep=2),
        chunk_iters=6,
    )
    np.testing.assert_array_equal(resumed.params, chunked.params)
    np.testing.assert_array_equal(
        np.asarray(resumed.result.iters), np.asarray(chunked.result.iters)
    )


def test_warm_state_reopens_only_maxiter_lanes():
    p0, data, _ = _expfit_batch(4)
    res = levmar(_exp_residual, p0, data=data, opts=LMOptions(itmax=2))
    stop = np.asarray(res.stop)
    warm_stop = np.asarray(res.warm_state()[2])
    for s, w in zip(stop, warm_stop):
        if s == StopReason.MAX_ITERATIONS:
            assert w == StopReason.RUNNING
        else:
            assert w == s
