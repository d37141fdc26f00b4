"""Round-4 sweep v3 (quiet): locate the throughput/recovery frontier.

r4b measured: flat-12 52.0M@0.9712, flat-16 43.8M@0.9770,
stop-selected compaction (16,16) 22.3M@0.9814 — phase 2's cost is
dominated by a ~2ms fixed glue/launch overhead (consistent with this
runtime's measured pallas-launch cost, SCALING_r3 overlap_ab), not by
block-iterations. This sweep asks two questions before pinning the bench
default:

1. Where does the FLAT ladder cross recovery 0.98 (itmax 20/24/28)?
   If flat-24 reaches it, a single-phase schedule beats all compaction.
2. Does χ²-based tail selection (polish only genuinely-unfit lanes)
   retain the compaction recovery gain at lower cost?

    cd /root/repo && setsid nohup python benchmarks/evidence_r4c.py \
        > runs/evidence_r4c.log 2>&1 &
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


def bench_run(first_itmax, tail_frac, select_chi2=0.0, full=False):
    import bench

    os.environ["BENCH_FIRST_ITMAX"] = str(first_itmax)
    os.environ["BENCH_TAIL_FRAC"] = str(tail_frac)
    os.environ["BENCH_SELECT_CHI2"] = repr(select_chi2)
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
    summary = {"round": "4c"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = []
    for fi, tf, sc in [
        (20, 0, 0.0), (24, 0, 0.0), (28, 0, 0.0),          # flat ladder
        (16, 32, 1e-9), (16, 16, 1e-9), (16, 32, 1e-8),    # chi2-selected
        (12, 16, 1e-9),                                     # short+chi2
    ]:
        row = bench_run(fi, tf, sc)
        keep = {k: row.get(k) for k in (
            "value", "recovery_frac", "recovery_per_param",
            "tail_active_frac", "fit_timing_spread", "secs_per_batch", "_rc")}
        keep.update(first_itmax=fi, tail_frac=tf, select_chi2=sc)
        rows.append(keep)
        log(f"fi={fi} tf={tf} sc={sc}: {row['value']/1e6:.1f}M "
            f"recovery={row['recovery_frac']:.4f} "
            f"tail_active={row['tail_active_frac']:.4f} "
            f"spread={row['fit_timing_spread']}")
    summary["bench_sweep_v3"] = rows

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4c_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
