"""Round-5 on-chip evidence session D — the fused d-D VarPro kernel ladder.

Measures varpro_fit_pallas_nd (ONE analytic evaluation per Newton step,
whole solve VMEM-resident) against the r5a-measured frontier points
(fused-LM itmax24 = 9.9 M fits/s, XLA 3-D VarPro k=12 = 14.7 M) on the
identical m=5 cook_torrance_aniso distribution, plus a block-size point
check. Ends with a FULL bench run (final in-session gate validation).

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5d.py \
        > runs/evidence_r5d.log 2>&1 &
"""

from __future__ import annotations

import contextlib
import functools
import io
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from benchmarks.evidence_r5a import _aniso_problem, log, stage, timed_fit  # noqa: E402


def main():
    summary = {"round": "5d"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    # ---- fused nd kernel ladder ------------------------------------------
    @stage(summary, "fused_nd_ladder")
    def run_ladder():
        from brdf_tpu.models.brdf import MODELS
        from brdf_tpu.ops.varpro_pallas import varpro_fit_pallas_nd

        model = "cook_torrance_aniso"
        spec = MODELS[model]
        t5, v5 = 65536, 16
        ang, target, true_p = _aniso_problem(t5, v5)

        def kd_rec(p):
            rel = np.abs(np.asarray(p)[:, 0] - true_p[:, 0]) / np.maximum(
                np.abs(true_p[:, 0]), 1e-3)
            return float((rel < 1e-2).mean())

        rows = []
        for iters, block in ((8, 512), (12, 512), (24, 512),
                             (12, 256), (12, 1024)):
            @jax.jit
            def fit(a, y):
                r = varpro_fit_pallas_nd(
                    model, a, y, iters=iters, block_t=block,
                    lower=tuple(spec.lower), upper=tuple(spec.upper),
                )
                return r.p, r.chi2, jnp.sum(r.p[:1]) + jnp.sum(r.chi2[:1])

            p, chi2, _ = fit(ang, target)
            per, spread = timed_fit(fit, ang, target)
            c = np.asarray(chi2)
            rows.append({
                "engine": "varpro_pallas_nd", "iters": iters, "block": block,
                "fits_per_sec": round(t5 / per, 1), "spread": round(spread, 3),
                "kd_recovery": kd_rec(p),
                "chi2_med": float(np.median(c)),
                "chi2_p99": float(np.percentile(c, 99)),
            })
            log(f"fused-nd k={iters} block={block}: {rows[-1]}")
        summary["fused_nd_ladder"] = rows
        summary["r5a_frontier"] = {
            "lm_pallas_itmax24": 9.9e6, "varpro_xla_k12": 14.7e6,
        }

    run_ladder()

    # ---- full bench (final gate validation) ------------------------------
    @stage(summary, "bench_full")
    def run_bench():
        import bench

        buf = io.StringIO()
        code = 0
        try:
            with contextlib.redirect_stdout(buf):
                bench.main()
        except SystemExit as e:
            code = int(e.code or 0)
        row = json.loads(buf.getvalue().strip().splitlines()[-1])
        row["_rc"] = code
        summary["bench_full"] = row
        log(f"FULL BENCH rc={code}: value={row['value']/1e6:.1f}M "
            f"gates={'GREEN' if code == 0 else row.get('gate_failed')}")

    run_bench()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5d_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
