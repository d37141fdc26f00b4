"""Round-5 on-chip evidence session A — ONE process, ONE device claim.

1. FULL bench.py run at the shipped default (validates every gate including
   the NEW fused-LM general-lobe row, VERDICT r4 #3, and records its
   measured levels as in-session evidence for the gate constants).
2. Anisotropic-lobe engine ladder (VERDICT #4): m=5 cook_torrance_aniso on
   the bench-style synthetic distribution through (a) the fused Pallas LM
   kernel at itmax 16/24, (b) the 3-D profiled VarPro tier at iters 8/12/24
   — fits/s + kd-recovery + χ² for the committed A/B.
3. VarPro-kernel roofline (VERDICT #7): a VMEM-resident Pallas microkernel
   measures the chip's achievable transcendental throughput (exp/log
   chains) and the FMA throughput on identical shapes; with the analytic
   count of the fused kernel's transcendentals per solve this yields
   "X% of the pow bound" + the measured poly-pow verdict for docs/PERF.md.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5a.py \
        > runs/evidence_r5a.log 2>&1 &
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


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage(summary, key):
    def deco(fn):
        @functools.wraps(fn)
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception:
                tb = traceback.format_exc()
                log(f"STAGE {key} FAILED:\n{tb}")
                summary.setdefault("failures", {})[key] = tb.splitlines()[-1]
                return None
        return run
    return deco


def _aniso_problem(t, v, seed=5):
    """Same distribution as bench._lm_general_row (host-NumPy build)."""
    from brdf_tpu.models.brdf import (
        MODELS, angles_from_geometry_np, shading_geometry_np,
    )

    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(t, 3)).astype(np.float32) * 0.1
    nrm = rng.normal(size=(t, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    d = rng.normal(size=(v, 3))
    lights = d / np.linalg.norm(d, axis=-1, keepdims=True) * 8.0
    geom = shading_geometry_np(pts, nrm, np.array([0.0, 0.0, 10.0]), lights)
    ang_np = angles_from_geometry_np(geom, tangent_frame=True)
    ang = jax.tree.map(
        lambda a: None if a is None else jnp.asarray(a), ang_np,
        is_leaf=lambda a: a is None,
    )
    true_p = np.stack(
        [rng.uniform(0.1, 0.9, t), rng.uniform(0.3, 1.0, t),
         rng.uniform(0.15, 0.9, t), rng.uniform(0.15, 0.9, t),
         rng.uniform(-1.2, 1.2, t)], -1,
    ).astype(np.float32)
    target = MODELS["cook_torrance_aniso"].fn(jnp.asarray(true_p), ang)
    return ang, target, true_p


def timed_fit(fit, ang, target, chains=16, reps=7):
    """Chained-slope timing with scalar digest readback (CLAUDE.md)."""
    *_, dg = fit(ang, target)
    _ = np.asarray(dg)

    def one(n):
        t0 = time.perf_counter()
        for _ in range(n):
            *_x, dg = fit(ang, target)
        _ = np.asarray(dg)
        return time.perf_counter() - t0

    for _ in range(2):
        one(4)
    t1 = sorted(one(1) for _ in range(5))[2]
    rs = sorted(one(chains) for _ in range(reps))
    per = (rs[reps // 2] - t1) / (chains - 1)
    spread = (rs[reps // 2 + 1] - rs[reps // 2 - 1]) / rs[reps // 2]
    return per, spread


def main():
    summary = {"round": "5a"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    # ---- 1. full bench at the shipped default -----------------------------
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
            f"recovery={row['recovery_frac']:.4f} "
            f"lm_row={row.get('fit_lm_pallas_fits_per_sec')} fits/s "
            f"lm_kd={row.get('fit_lm_pallas_recovery_kd')} "
            f"lm_p99={row.get('fit_lm_pallas_chi2_p99'):.2e}")

    run_bench()

    # ---- 2. aniso engine ladder ------------------------------------------
    @stage(summary, "aniso_ladder")
    def run_ladder():
        from brdf_tpu.models.brdf import MODELS
        from brdf_tpu.ops.lm_pallas import lm_fit_pallas
        from brdf_tpu.solver.init import linear_grid_init
        from brdf_tpu.solver.lm import LMOptions
        from brdf_tpu.solver.varpro import varpro_fit_nd

        model = "cook_torrance_aniso"
        spec = MODELS[model]
        t5, v5 = 65536, 16
        ang, target, true_p = _aniso_problem(t5, v5)

        def kd_rec(p):
            rel = np.abs(np.asarray(p)[:, 0] - true_p[:, 0]) / np.maximum(
                np.abs(true_p[:, 0]), 1e-3)
            return float((rel < 1e-2).mean())

        rows = []
        for itmax in (16, 24):
            opts = LMOptions(eps1=1e-9, eps2=1e-9, eps3=1e-14,
                             itmax=itmax, tau=1e-10)

            @jax.jit
            def fit_lm(a, y):
                p0 = linear_grid_init(model, a, y)
                r = lm_fit_pallas(model, a, y, p0, opts=opts,
                                  lower=tuple(spec.lower),
                                  upper=tuple(spec.upper))
                return r.p, r.chi2, jnp.sum(r.p[:1]) + jnp.sum(r.chi2[:1])

            p, chi2, _ = fit_lm(ang, target)
            per, spread = timed_fit(fit_lm, ang, target)
            c = np.asarray(chi2)
            rows.append({
                "engine": "lm_pallas", "sched": itmax,
                "fits_per_sec": round(t5 / per, 1), "spread": round(spread, 3),
                "kd_recovery": kd_rec(p),
                "chi2_med": float(np.median(c)),
                "chi2_p99": float(np.percentile(c, 99)),
            })
            log(f"lm itmax={itmax}: {rows[-1]}")

        for iters in (8, 12, 24):
            @jax.jit
            def fit_vp(a, y):
                r = varpro_fit_nd(model, a, y, iters=iters,
                                  lower=tuple(spec.lower),
                                  upper=tuple(spec.upper))
                return r.p, r.chi2, jnp.sum(r.p[:1]) + jnp.sum(r.chi2[:1])

            p, chi2, _ = fit_vp(ang, target)
            per, spread = timed_fit(fit_vp, ang, target)
            c = np.asarray(chi2)
            rows.append({
                "engine": "varpro_nd", "sched": iters,
                "fits_per_sec": round(t5 / per, 1), "spread": round(spread, 3),
                "kd_recovery": kd_rec(p),
                "chi2_med": float(np.median(c)),
                "chi2_p99": float(np.percentile(c, 99)),
            })
            log(f"varpro iters={iters}: {rows[-1]}")
        summary["aniso_ladder"] = rows

    run_ladder()

    # ---- 3. transcendental roofline microbench ---------------------------
    @stage(summary, "roofline")
    def run_roofline():
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        v, tb, blocks = 64, 512, 64
        iters = 64

        def chain_kernel(x_ref, o_ref, *, kind):
            a = x_ref[...]
            b = a * 1.01 + 0.1

            def body(_, carry):
                a, b = carry
                if kind == "transc":
                    # 2 independent pow chains = 4 transcendentals/elem/iter
                    a = jnp.exp(1.37 * jnp.log(a)) * 0.5 + 0.75
                    b = jnp.exp(0.73 * jnp.log(b)) * 0.5 + 0.75
                else:
                    # 4 mul-adds/elem/iter on the same dependence structure
                    a = (a * 1.0001 + 0.0003) * 0.9999 + 0.0001
                    b = (b * 0.9997 + 0.0002) * 1.0002 + 0.0004
                return a, b

            a, b = jax.lax.fori_loop(0, iters, body, (a, b))
            o_ref[...] = a + b

        x = jnp.asarray(
            np.random.default_rng(0).uniform(0.5, 1.5, (v, tb * blocks)),
            jnp.float32,
        )
        out = {}
        for kind, ops_per in (("transc", 4), ("muladd", 8)):
            call = pl.pallas_call(
                functools.partial(chain_kernel, kind=kind),
                grid=(blocks,),
                in_specs=[pl.BlockSpec((v, tb), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((v, tb), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((v, tb * blocks), jnp.float32),
            )

            @jax.jit
            def run(x):
                o = call(x)
                return jnp.sum(o[:1, :1])

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
            total_ops = v * tb * blocks * iters * ops_per
            out[kind] = {
                "secs": per,
                "gops_per_sec": round(total_ops / per / 1e9, 1),
            }
            log(f"{kind}: {out[kind]['gops_per_sec']} Gops/s")
        summary["roofline_micro"] = out

        # achieved transcendental rate of the fused VarPro kernel at the
        # bench default (grid 8, k=6, blinn: 3 transc/eval, 16 evals/view)
        bf = summary.get("bench_full") or {}
        if bf.get("value"):
            transc_per_fit = 16 * (1 + 8 + 1 + 6) * 3   # V·evals·transc/eval
            achieved = bf["value"] * transc_per_fit
            bound = out["transc"]["gops_per_sec"] * 1e9
            summary["varpro_roofline"] = {
                "transc_per_fit": transc_per_fit,
                "achieved_gtransc_per_sec": round(achieved / 1e9, 1),
                "measured_bound_gtransc_per_sec": round(bound / 1e9, 1),
                "fraction_of_bound": round(achieved / bound, 3),
                # identical chain structure, transcendental vs FMA body:
                # how many FMA-iterations one transc-iteration buys — the
                # poly-pow breakeven (a polynomial exp+log pair needs ~20+
                # FMAs; worthwhile only if this ratio exceeds that)
                "transc_vs_fma_chain_time_ratio": round(
                    out["transc"]["secs"] / out["muladd"]["secs"], 2
                ),
            }
            log(f"varpro roofline: {summary['varpro_roofline']}")

    run_roofline()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5a_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
