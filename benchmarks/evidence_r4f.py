"""Round-4 sweep v6 (quiet): the VarPro engine vs the fused-LM frontier.

solver/varpro.py profiles out the linear (kd, ks) pair in closed form and
runs safeguarded 1-D Newton on the shape parameter with Kaufman's
projected curvature — CPU-measured recovery 0.980/0.985/0.987/0.989 at
4/6/8/12 FIXED iterations (χ² medians ~2e-14, four orders below the LM
floor), i.e. better quality than flat-24 LM at a fraction of the model
evaluations and with NO slowest-lane tail (every lane costs exactly k).
This session prices it on the chip against the r4 LM frontier
(33.4 M fits/s @ 0.9816) and runs the full bench at the winner.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4f.py \
        > runs/evidence_r4f.log 2>&1 &
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


def bench_run(engine, varpro_iters=6, first_itmax=24, full=False):
    import bench

    os.environ["BENCH_ENGINE"] = engine
    os.environ["BENCH_VARPRO_ITERS"] = str(varpro_iters)
    os.environ["BENCH_FIRST_ITMAX"] = str(first_itmax)
    os.environ["BENCH_TAIL_FRAC"] = "0"
    os.environ["BENCH_SELECT_CHI2"] = "0"
    os.environ["BENCH_INIT_REFINE"] = "0"
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
    summary = {"round": "4f"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = []
    for engine, k in [("lm", 0), ("varpro", 4), ("varpro", 6),
                      ("varpro", 8), ("varpro", 12)]:
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
    summary["bench_sweep_v6"] = rows

    vp = [r for r in rows if r["engine"] == "varpro"
          and r["recovery_frac"] >= 0.98 and r["_rc"] == 0]
    lm = [r for r in rows if r["engine"] == "lm"]
    best_vp = max(vp, key=lambda r: r["value"]) if vp else None
    pick = best_vp if best_vp and best_vp["value"] > lm[0]["value"] else lm[0]
    summary["bench_pick"] = {"engine": pick["engine"],
                             "varpro_iters": pick.get("varpro_iters", 0)}
    log(f"picked {summary['bench_pick']}")

    full = bench_run(pick["engine"], varpro_iters=pick.get("varpro_iters", 6),
                     full=True)
    summary["bench_full"] = full
    log(f"FULL BENCH: {json.dumps(full)}")

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4f_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
