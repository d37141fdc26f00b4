"""Round-4 on-chip evidence session — ONE process, ONE device claim.

Batches every TPU-touching measurement of the round into a single process
(CLAUDE.md TPU-access discipline: the tunnel grants device claims serially
per process, and claim waits grow with process churn):

1. Bench fit-row schedule sweep: (first_itmax, tail_frac) candidates for the
   two-phase compaction schedule, measuring fits/s + recovery + tail size —
   picks the shipped default (VERDICT r3 #1/#5).
2. A FULL bench.py run at the final configuration (in-session evidence the
   driver artifact should reproduce).
3. Shadow-weight A/B on complexScene + cup (VERDICT #2).
4. Anisotropic lobes on timber: ward (iso) vs ward_aniso vs
   cook_torrance_aniso (VERDICT #3).
5. Saturation-mask A/B on cup + timber (VERDICT #9).
6. Joint fits for cup + complexScene with quality metrics — the
   fraction-at-bounds evidence for the joint-default story (VERDICT #4).

Each scene fit goes through the real CLI entry (fit → export --stats
--coverage), so the committed runs/* artifacts are exactly what a user
would produce. Writes runs/evidence_r4_summary.json at the end.

Launch DETACHED and poll the log (no shell timeout may kill a TPU process):

    cd /root/repo && setsid nohup python benchmarks/evidence_r4.py \
        > runs/evidence_r4.log 2>&1 &
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


def bench_run(first_itmax, tail_frac, full=False):
    """One bench.py main() in-process; returns the parsed JSON row."""
    import bench

    os.environ["BENCH_FIRST_ITMAX"] = str(first_itmax)
    os.environ["BENCH_TAIL_FRAC"] = str(tail_frac)
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


def cli(args):
    from brdf_tpu.cli import main

    log(f"cli: {' '.join(args)}")
    rc = main(args)
    assert rc == 0, f"cli {args} rc={rc}"


def fit_and_audit(name, cfg, view=0):
    """fit + export --stats --coverage into runs/<name>; returns metrics."""
    out = os.path.join(ROOT, "runs", name)
    cfg_path = os.path.join("/tmp", f"cfg_{name}.json")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    cli(["fit", "--config", cfg_path, "--out", out])
    cli(["export", "--run", out, "--stats", "--coverage",
         "--view", str(view)])
    with open(os.path.join(out, "maps", "metrics.json")) as fh:
        return json.load(fh)


def stage(summary, key):
    """Per-stage guard: a failing stage records its traceback and lets the
    rest of the session keep the (already-claimed) device productive."""
    import functools
    import traceback

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


def main():
    from brdf_tpu.configs import (
        PRESETS, FitConfig, ModelConfig, SceneConfig, SolverConfig,
    )

    summary = {"round": 4, "backend": None}
    t_start = time.time()

    # -- claim the device once, up front, and record the wait ---------------
    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    # ---- 1+2. bench schedule sweep + full bench ---------------------------
    @stage(summary, "bench")
    def run_bench():
        sweep = []
        for fi, tf in [(12, 8), (12, 16), (14, 16), (16, 16)]:
            row = bench_run(fi, tf)
            keep = {k: row.get(k) for k in (
                "value", "recovery_frac", "recovery_per_param",
                "tail_active_frac", "fit_timing_spread", "secs_per_batch",
                "_rc")}
            keep["first_itmax"], keep["tail_frac"] = fi, tf
            sweep.append(keep)
            log(f"sweep first_itmax={fi} tail_frac={tf}: "
                f"{row['value']/1e6:.1f}M fits/s "
                f"recovery={row['recovery_frac']:.4f} "
                f"tail_active={row['tail_active_frac']:.4f} "
                f"spread={row['fit_timing_spread']}")
        summary["bench_sweep"] = sweep

        # pick: highest fits/s among rows with recovery ≥ 0.98, gates green
        ok = [r for r in sweep if r["recovery_frac"] >= 0.98 and r["_rc"] == 0]
        pick = max(ok or sweep, key=lambda r: r["value"])
        summary["bench_pick"] = {k: pick[k] for k in ("first_itmax", "tail_frac")}
        log(f"picked schedule: {summary['bench_pick']}")

        full = bench_run(pick["first_itmax"], pick["tail_frac"], full=True)
        summary["bench_full"] = full
        log(f"FULL BENCH: {json.dumps(full)}")

    run_bench()

    # ---- 3. shadow-weight A/B (complexScene + cup) ------------------------
    @stage(summary, "shadow_ab")
    def run_shadow():
        import dataclasses as dc

        shadow_ab = {}
        for scene, base in (
            ("complex", PRESETS["complex-relight"]),
            ("cup", FitConfig(
                name="cup-ct",
                scene=SceneConfig(scene_dir="/root/reference/img/cup"),
                model=ModelConfig(model="cook_torrance"),
                solver=SolverConfig(robust="huber",
                                    lower=[0.0, 0.0, 1e-3],
                                    upper=[2.0, 2.0, 1.0]),
            )),
        ):
            rows = {}
            for tag, shadow in (("off", False), ("on", True)):
                cfg = dc.replace(base, solver=dc.replace(
                    base.solver, shadow_weights=shadow),
                    name=f"{scene}_shadow_{tag}")
                m = fit_and_audit(f"{scene}_shadow_{tag}", cfg)
                rows[tag] = {"mae": m["reprojection_mae"],
                             "rmse": m["reprojection_rmse"],
                             "at_bounds": m["fraction_at_bounds"],
                             "warnings": m["warnings"]}
                log(f"shadow A/B {scene} {tag}: mae={m['reprojection_mae']}")
            shadow_ab[scene] = rows
        summary["shadow_ab"] = shadow_ab

    run_shadow()

    # ---- 4. anisotropic lobes on timber -----------------------------------
    @stage(summary, "timber_aniso")
    def run_aniso():
        aniso = {}
        base_scene = SceneConfig(scene_dir="/root/reference/img/timber")
        for name, model, lo, hi in (
            ("timber_ward", "ward", [0.0, 0.0, 1e-3], [2.0, 2.0, 1.0]),
            ("timber_aniso", "ward_aniso",
             [0.0, 0.0, 1e-3, 1e-3, -1.5707963],
             [2.0, 2.0, 1.0, 1.0, 1.5707963]),
            ("timber_ct_aniso", "cook_torrance_aniso",
             [0.0, 0.0, 1e-3, 1e-3, -1.5707963],
             [2.0, 2.0, 1.0, 1.0, 1.5707963]),
        ):
            cfg = FitConfig(
                name=name, scene=base_scene,
                model=ModelConfig(model=model),
                solver=SolverConfig(robust="huber", lower=lo, upper=hi),
            )
            m = fit_and_audit(name, cfg)
            aniso[name] = {"model": model, "mae": m["reprojection_mae"],
                           "rmse": m["reprojection_rmse"],
                           "at_bounds": m["fraction_at_bounds"]}
            log(f"aniso {name}: mae={m['reprojection_mae']}")
        summary["timber_aniso"] = aniso

    run_aniso()

    # ---- 5. saturation-mask A/B (cup + timber) ----------------------------
    @stage(summary, "saturation_ab")
    def run_sat():
        sat_ab = {}
        for scene, model, rob in (("cup", "cook_torrance", "huber"),
                                  ("timber", "blinn_phong", "huber")):
            rows = {}
            for tag, mask in (("on", True), ("off", False)):
                cfg = FitConfig(
                    name=f"{scene}_sat_{tag}",
                    scene=SceneConfig(scene_dir=f"/root/reference/img/{scene}"),
                    model=ModelConfig(model=model),
                    solver=SolverConfig(robust=rob, mask_saturation=mask,
                                        lower=[0.0, 0.0, 1e-3],
                                        upper=[2.0, 2.0, 1.0]),
                )
                m = fit_and_audit(f"{scene}_sat_{tag}", cfg)
                rows[tag] = {"mae": m["reprojection_mae"],
                             "rmse": m["reprojection_rmse"],
                             "saturated_fraction": m["saturated_fraction"]}
                log(f"sat A/B {scene} mask={tag}: mae={m['reprojection_mae']}")
            sat_ab[scene] = rows
        summary["saturation_ab"] = sat_ab

    run_sat()

    # ---- 6. joint fits: cup + complexScene (bounds story) -----------------
    @stage(summary, "joint_fits")
    def run_joint():
        joint = {}
        for preset in ("cup-joint", "complex-joint"):
            name = preset.replace("-", "_")
            m = fit_and_audit(name, PRESETS[preset])
            joint[name] = {"mae": m["reprojection_mae"],
                           "at_bounds": m["fraction_at_bounds"],
                           "warnings": m["warnings"]}
            log(f"joint {preset}: mae={m['reprojection_mae']} "
                f"bounds={m['fraction_at_bounds']}")
        summary["joint_fits"] = joint

    run_joint()

    # ---- coverage overlay for the committed bunny run ---------------------
    @stage(summary, "bunny_coverage")
    def run_bunny_cov():
        run_dir = os.path.join(ROOT, "runs", "bunny_tpu")
        if os.path.isdir(run_dir):
            cli(["export", "--run", run_dir, "--coverage"])

    run_bunny_cov()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s — wrote runs/evidence_r4_summary.json")


if __name__ == "__main__":
    main()
