"""Scaling-efficiency harness: sharded fit throughput vs device count.

BASELINE's north star asks for >85% rays/s scaling efficiency from 1 chip to
a 2-host v5e-16. This harness measures the sharded per-texel fit on nested
sub-meshes of the available devices (1, 2, 4, …, N) and reports throughput
and efficiency relative to the single-device run.

On real hardware run it as-is; for mechanics validation without a pod run
with a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --platform cpu --texels 4096

Prints one JSON line per device count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--texels", type=int, default=131072,
                    help="texels per device (weak scaling)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    import jax.numpy as jnp

    from brdf_tpu.models.brdf import MODELS, ShadingAngles
    from brdf_tpu.parallel.fit import fit_texels_sharded
    from brdf_tpu.parallel.mesh import make_mesh
    from brdf_tpu.solver.lm import LMOptions

    n_dev = jax.device_count()
    counts = []
    c = 1
    while c <= n_dev:
        counts.append(c)
        c *= 2
    if counts[-1] != n_dev:
        counts.append(n_dev)

    opts = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=20)
    spec = MODELS["blinn_phong"]
    base_rate = None

    for ndev in counts:
        t = args.texels * ndev      # weak scaling: fixed work per device
        v = args.views
        rng = np.random.default_rng(0)
        ang = ShadingAngles(
            cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
            cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
            cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
            cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
        )
        true_p = np.stack(
            [rng.uniform(.1, .9, t), rng.uniform(.2, 1., t), rng.uniform(2, 30, t)],
            -1,
        ).astype(np.float32)
        target = spec.fn(jnp.asarray(true_p), ang)
        mesh = make_mesh(data=ndev, view=1, devices=jax.devices()[:ndev])

        def run():
            return fit_texels_sharded(
                "blinn_phong", ang, target, mesh, opts=opts, engine=args.engine
            )

        res = run()
        _ = np.asarray(res.chi2[:1])            # warm: compile + load

        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = run()
        _ = np.asarray(res.chi2[:1])
        secs = (time.perf_counter() - t0) / args.reps

        rate = t / secs
        if base_rate is None:
            base_rate = rate / ndev
        eff = rate / (base_rate * ndev)
        print(json.dumps({
            "devices": ndev,
            "texels": t,
            "fits_per_sec": round(rate, 1),
            "per_device": round(rate / ndev, 1),
            "efficiency_vs_1dev": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
