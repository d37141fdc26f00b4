"""One-off tuning sweep: lm_fit_pallas / shade_pallas block sizes on the chip.

Informs the block_t defaults; results recorded in the commit message and
bench.py docstring. Uses bench.py's chained-digest timing protocol.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.ops.lm_pallas import lm_fit_pallas
from brdf_tpu.ops.shading_pallas import shade_pallas
from brdf_tpu.solver.init import linear_grid_init
from brdf_tpu.solver.lm import LMOptions

T, V = 131072, 16


def make_problem(rng, t, v):
    cos_ln = rng.uniform(0.0, 1.0, (t, v)).astype(np.float32)
    cos_nh = rng.uniform(0.0, 1.0, (t, v)).astype(np.float32)
    cos_rv = rng.uniform(-1.0, 1.0, (t, v)).astype(np.float32)
    cos_vn = rng.uniform(0.1, 1.0, (t, v)).astype(np.float32)
    ang = ShadingAngles(
        cos_ln=jnp.asarray(cos_ln), cos_nh=jnp.asarray(cos_nh),
        cos_rv=jnp.asarray(cos_rv), cos_vn=jnp.asarray(cos_vn))
    true_p = np.stack([rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t),
                       rng.uniform(2.0, 30.0, t)], -1).astype(np.float32)
    target = MODELS["blinn_phong"].fn(jnp.asarray(true_p), ang)
    return ang, target


def main():
    rng = np.random.default_rng(0)
    ang, target = make_problem(rng, T, V)
    opts = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=30)
    spec = MODELS["blinn_phong"]
    out = {"backend": jax.default_backend()}

    for bt in (512, 1024, 2048, 4096):
        @jax.jit
        def fit(ang, target, bt=bt):
            p0 = linear_grid_init("blinn_phong", ang, target)
            res = lm_fit_pallas("blinn_phong", ang, target, p0, opts=opts,
                                lower=tuple(spec.lower), upper=tuple(spec.upper),
                                block_t=bt)
            return res.p, jnp.sum(res.p[:1]) + jnp.sum(res.chi2[:1])

        p, dg = fit(ang, target)
        _ = np.asarray(dg)

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                p, dg = fit(ang, target)
            _ = np.asarray(dg)
            return time.perf_counter() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        t6 = min(timed(6) for _ in range(3))
        per = (t6 - t1) / 5
        out[f"fit_block{bt}_mfits_s"] = round(T / per / 1e6, 2)

    # shading kernel block sweep (cook_torrance fwd+bwd loss)
    t2 = 262144
    ang2, _ = make_problem(rng, t2, V)
    params = jnp.asarray(np.stack([rng.uniform(.1, .9, t2), rng.uniform(.2, 1, t2),
                                   rng.uniform(.1, .9, t2)], -1), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 1, (t2, V)), jnp.float32)
    for bt in (1024, 2048, 4096, 8192):
        @jax.jit
        def sfb(p, ang, y, bt=bt):
            def loss(pp):
                pred = shade_pallas("cook_torrance", pp, ang, block_t=bt,
                                    interpret=False)
                return 0.5 * jnp.sum((pred - y) ** 2)
            val, grad = jax.value_and_grad(loss)(p)
            return val, grad, val + jnp.sum(grad[:1])

        _, _, dg = sfb(params, ang2, y)
        _ = np.asarray(dg)

        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                _, _, dg = sfb(params, ang2, y)
            _ = np.asarray(dg)
            return time.perf_counter() - t0

        timed(1)
        t1 = min(timed(1) for _ in range(3))
        t6 = min(timed(6) for _ in range(3))
        per = (t6 - t1) / 5
        out[f"shade_block{bt}_grays_s"] = round(t2 * V * 2 / per / 1e9, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
