"""Round-4 sweep v5 (quiet): cost of the GATHER-FREE parabolic init
refinement, and the final full bench.

v4 (evidence_r4d) found the first refinement implementation cost
+4.4 ms/batch on TPU — per-texel row gathers lower to generic gathers on
the scalar core. The rewrite selects via one-hot masked reductions over
the G axis (pure VPU). This session A/Bs the fixed version at the shipped
itmax and records the final full bench at the resulting default.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4e.py \
        > runs/evidence_r4e.log 2>&1 &
"""

from __future__ import annotations

import contextlib
import io
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def bench_run(first_itmax, refine, full=False):
    import bench

    os.environ["BENCH_FIRST_ITMAX"] = str(first_itmax)
    os.environ["BENCH_TAIL_FRAC"] = "0"
    os.environ["BENCH_SELECT_CHI2"] = "0"
    os.environ["BENCH_INIT_REFINE"] = "1" if refine else "0"
    os.environ["BENCH_SHADING"] = "1" if full else "0"
    os.environ["BENCH_JOINT"] = "1" if full else "0"
    buf = io.StringIO()
    code = 0
    try:
        with contextlib.redirect_stdout(buf):
            bench.main()
    except SystemExit as e:
        code = int(e.code or 0)
    row = json.loads(buf.getvalue().strip().splitlines()[-1])
    row["_rc"] = code
    return row


def main():
    summary = {"round": "4e"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = []
    for fi, refine in [(24, False), (24, True), (16, True), (12, True)]:
        row = bench_run(fi, refine)
        keep = {k: row.get(k) for k in (
            "value", "recovery_frac", "tail_active_frac",
            "fit_timing_spread", "secs_per_batch", "_rc")}
        keep["first_itmax"], keep["init_refine"] = fi, refine
        rows.append(keep)
        log(f"itmax={fi} refine={refine}: {row['value']/1e6:.1f}M "
            f"recovery={row['recovery_frac']:.4f} "
            f"spread={row['fit_timing_spread']}")
    summary["bench_sweep_v5"] = rows

    # default refine stays on iff it costs <2% at the shipped itmax=24
    base = next(r for r in rows if r["first_itmax"] == 24 and not r["init_refine"])
    ref = next(r for r in rows if r["first_itmax"] == 24 and r["init_refine"])
    refine_cost = 1.0 - ref["value"] / base["value"]
    summary["refine_cost_frac"] = round(refine_cost, 4)
    refine_default = refine_cost < 0.02
    summary["refine_default"] = refine_default
    log(f"refine cost {refine_cost:.1%} -> default refine={refine_default}")

    full = bench_run(24, refine_default, full=True)
    summary["bench_full"] = full
    log(f"FULL BENCH: {json.dumps(full)}")

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4e_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
