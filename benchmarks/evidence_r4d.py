"""Round-4 sweep v4 (quiet): the flat ladder with the PARABOLIC-REFINED
grid init (solver/init.py::_parabolic_refine, new in r4).

The r4c sweep located the recovery tail in lanes slowly polishing the
exponent direction from a start up to ±20% off (the 16-point geometric
grid's half-spacing). The refinement cuts the initial exponent error ~6×
at the median (CPU-measured: rel err 0.098 → 0.016); this sweep measures
how far that moves the throughput/recovery frontier, then runs the full
bench at the new best point.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4d.py \
        > runs/evidence_r4d.log 2>&1 &
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


def bench_run(first_itmax, full=False):
    import bench

    os.environ["BENCH_FIRST_ITMAX"] = str(first_itmax)
    os.environ["BENCH_TAIL_FRAC"] = "0"
    os.environ["BENCH_SELECT_CHI2"] = "0"
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
    summary = {"round": "4d", "init": "parabolic-refined grid"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = []
    for fi in (10, 12, 14, 16, 20, 24):
        row = bench_run(fi)
        keep = {k: row.get(k) for k in (
            "value", "recovery_frac", "recovery_per_param",
            "tail_active_frac", "fit_timing_spread", "secs_per_batch", "_rc")}
        keep["first_itmax"] = fi
        rows.append(keep)
        log(f"flat itmax={fi}: {row['value']/1e6:.1f}M "
            f"recovery={row['recovery_frac']:.4f} "
            f"tail_active={row['tail_active_frac']:.4f} "
            f"spread={row['fit_timing_spread']}")
    summary["bench_sweep_v4"] = rows

    ok = [r for r in rows if r["recovery_frac"] >= 0.98 and r["_rc"] == 0]
    pick = max(ok or rows, key=lambda r: r["value"])
    summary["bench_pick"] = pick["first_itmax"]
    log(f"picked flat itmax={pick['first_itmax']}")

    full = bench_run(pick["first_itmax"], full=True)
    summary["bench_full"] = full
    log(f"FULL BENCH: {json.dumps(full)}")

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4d_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
