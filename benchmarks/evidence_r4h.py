"""Round-4 session 8 (quiet): fused Pallas VarPro vs the XLA VarPro tier.

The XLA tier re-reads the angle stacks from HBM per grid point / Newton
step; ops/varpro_pallas.py keeps a texel block VMEM-resident for the
whole solve (grid init + k steps). Interpret-mode parity is test-pinned;
this session prices both on the chip and runs the full bench at the
winner.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4h.py \
        > runs/evidence_r4h.log 2>&1 &
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


def bench_run(engine, varpro_iters=6, full=False):
    import bench

    os.environ["BENCH_ENGINE"] = engine
    os.environ["BENCH_VARPRO_ITERS"] = str(varpro_iters)
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
    summary = {"round": "4h"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = []
    for engine, k in [("varpro", 6), ("varpro_pallas", 4),
                      ("varpro_pallas", 6), ("varpro_pallas", 8)]:
        row = bench_run(engine, varpro_iters=k)
        keep = {kk: row.get(kk) for kk in (
            "value", "recovery_frac", "recovery_per_param",
            "fit_timing_spread", "secs_per_batch", "chi2_median",
            "chi2_p99", "_rc")}
        keep["engine"], keep["varpro_iters"] = engine, k
        rows.append(keep)
        log(f"{engine} k={k}: {row['value']/1e6:.1f}M "
            f"recovery={row['recovery_frac']:.4f} "
            f"chi2_med={row['chi2_median']:.1e} "
            f"spread={row['fit_timing_spread']}")
    summary["bench_sweep_v7"] = rows

    ok = [r for r in rows if r["recovery_frac"] >= 0.98 and r["_rc"] == 0]
    pick = max(ok or rows, key=lambda r: r["value"])
    summary["bench_pick"] = {"engine": pick["engine"],
                             "varpro_iters": pick["varpro_iters"]}
    log(f"picked {summary['bench_pick']}")

    full = bench_run(pick["engine"], varpro_iters=pick["varpro_iters"],
                     full=True)
    summary["bench_full"] = full
    log(f"FULL BENCH: {json.dumps(full)}")

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4h_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
