"""Round-5 on-chip evidence session G — roofline microbench ILP sweep.

The r5a chain microkernels used 2 independent dependence chains; if the
VPU can overlap more, the measured "bound" understates the machine and
the kernel's 90%-of-FMA-chain-rate claim overstates its efficiency.
Sweep 1/2/4/8 independent streams for both chain bodies and record the
saturation point — whichever plateau emerges is the honest issue-rate
bound for docs/PERF.md §7.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5g.py \
        > runs/evidence_r5g.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from benchmarks.evidence_r5a import log, stage  # noqa: E402


def main():
    summary = {"round": "5g"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    @stage(summary, "ilp_sweep")
    def run_sweep():
        v, tb, blocks = 64, 512, 64
        iters = 64

        def chain_kernel(x_ref, o_ref, *, kind, streams):
            x = x_ref[...]
            chains = [x * (1.0 + 0.003 * i) + 0.1 * i for i in range(streams)]

            def body(_, cs):
                outs = []
                for i, c in enumerate(cs):
                    if kind == "transc":
                        # 2 transcendentals + 1 FMA per stream per iter
                        outs.append(
                            jnp.exp((1.1 + 0.07 * i) * jnp.log(c)) * 0.5 + 0.75
                        )
                    else:
                        # 2 FMAs per stream per iter (same dependence depth)
                        outs.append(
                            (c * 1.0001 + 0.0003 * (i + 1)) * 0.9999 + 0.0001
                        )
                return tuple(outs)

            cs = jax.lax.fori_loop(0, iters, body, tuple(chains))
            acc = cs[0]
            for c in cs[1:]:
                acc = acc + c
            o_ref[...] = acc

        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.5, (v, tb * blocks)),
            jnp.float32,
        )
        rows = []
        for kind, ops_per_stream in (("transc", 2), ("muladd", 2)):
            for streams in (1, 2, 4, 8):
                call = pl.pallas_call(
                    functools.partial(chain_kernel, kind=kind,
                                      streams=streams),
                    grid=(blocks,),
                    in_specs=[pl.BlockSpec((v, tb), lambda i: (0, i),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((v, tb), lambda i: (0, i),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((v, tb * blocks),
                                                   jnp.float32),
                )

                @jax.jit
                def run(x):
                    return jnp.sum(call(x)[:1, :1])

                _ = np.asarray(run(x))

                def one(n):
                    t0 = time.perf_counter()
                    for _ in range(n):
                        dg = run(x)
                    _ = np.asarray(dg)
                    return time.perf_counter() - t0

                for _ in range(2):
                    one(4)
                t1 = sorted(one(1) for _ in range(5))[2]
                rs = sorted(one(32) for _ in range(7))
                per = (rs[3] - t1) / 31
                total = v * tb * blocks * iters * ops_per_stream * streams
                rows.append({
                    "kind": kind, "streams": streams,
                    "gops_per_sec": round(total / per / 1e9, 1),
                })
                log(f"{kind} streams={streams}: "
                    f"{rows[-1]['gops_per_sec']} Gops/s")
        summary["ilp_sweep"] = rows

    run_sweep()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5g_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
