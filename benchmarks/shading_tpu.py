"""On-device check + throughput of the Pallas shading kernel vs XLA fusion.

Runs on whatever backend jax provides (the real v5e chip under the driver).
Times forward+backward of the fit-style loss through (a) the jnp lobe fused
by XLA and (b) ops/shading_pallas.py's hand kernel, using the chained-N
scalar-digest protocol from bench.py (block_until_ready does not block on
the tunneled runtime).
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
from brdf_tpu.ops.shading_pallas import shade_pallas

T, V = 262144, 16
MODEL = "cook_torrance"


def make(t, v, seed=0):
    rng = np.random.default_rng(seed)
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.05, 1, (t, v)), jnp.float32),
    )
    params = jnp.asarray(
        np.stack([rng.uniform(.1, .9, t), rng.uniform(.2, 1, t),
                  rng.uniform(.1, .9, t)], -1), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32)
    return params, ang, target


def loss_fns():
    spec = MODELS[MODEL]

    @jax.jit
    def xla(p, ang, y):
        def loss(pp):
            return 0.5 * jnp.sum((spec.fn(pp, ang) - y) ** 2)
        val, grad = jax.value_and_grad(loss)(p)
        return val, grad, val + jnp.sum(grad[:1])

    @jax.jit
    def pallas(p, ang, y):
        def loss(pp):
            return 0.5 * jnp.sum((shade_pallas(MODEL, pp, ang) - y) ** 2)
        val, grad = jax.value_and_grad(loss)(p)
        return val, grad, val + jnp.sum(grad[:1])

    return xla, pallas


def timed(fn, args, n):
    t0 = time.perf_counter()
    for _ in range(n):
        _, _, dg = fn(*args)
    _ = np.asarray(dg)
    return time.perf_counter() - t0


def main():
    xla, pallas = loss_fns()

    # correctness on-device, small batch
    pv, av, yv = make(4096, V, seed=1)
    v1, g1, _ = xla(pv, av, yv)
    v2, g2, _ = pallas(pv, av, yv)
    verr = abs(float(v1) - float(v2)) / max(abs(float(v1)), 1e-9)
    gerr = float(jnp.max(jnp.abs(g1 - g2) / (jnp.abs(g1) + 1e-4)))

    p, ang, y = make(T, V)
    out = {"backend": jax.default_backend(), "batch": [T, V],
           "loss_rel_err": verr, "grad_max_rel_err": gerr}
    for name, fn in (("xla", xla), ("pallas", pallas)):
        _, _, dg = fn(p, ang, y)      # compile + first exec
        _ = np.asarray(dg)
        timed(fn, (p, ang, y), 1)
        t1 = min(timed(fn, (p, ang, y), 1) for _ in range(3))
        t6 = min(timed(fn, (p, ang, y), 6) for _ in range(3))
        per = (t6 - t1) / 5
        out[f"{name}_mrays_fwd_bwd"] = round(T * V * 2 / per / 1e6, 1)
        out[f"{name}_secs"] = round(per, 6)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
