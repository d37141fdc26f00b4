"""One-process on-chip evidence generator (round 3).

The tunneled TPU runtime grants device claims serially per process and
punishes process churn (CLAUDE.md TPU-access discipline), so every round-3
on-chip artifact that can share a process is produced from THIS one:

1. Per-texel fits + the new fit-quality audit (``export --stats`` →
   ``metrics.json``) for ALL FOUR reference scenes (VERDICT r2 next-round
   #6): bunny (config 3, plausible-reflectance box), timber (config 2), cup
   (per-texel CT), complexScene (config 5 preset);
2. ``runs/bunny_joint`` — config 4 through the NEW m=9 joint Pallas tier
   (``lm_fit_joint_pallas_chunked``; engine resolves to pallas on TPU);
3. the on-chip overlap-slicing timing rows appended to SCALING_r3.json
   (VERDICT r2 next-round #7 — the A/B's structure half runs on the CPU
   mesh, the cost half needs the real chip);
4. ``runs/profile/phase_timings.json`` REGENERATED post-r2-fix so the
   committed artifact agrees with the docs (VERDICT r2 weak #2), including
   the same-run shading A/B and the new joint A/B.

A separate SECOND process (the driver of the <1-min config-3 evidence,
VERDICT r2 next-round #3) reruns the bunny fit cold with the compile cache
this process populates:

    python benchmarks/evidence_r3.py          # process A (this file)
    # ... let the tunnel idle several minutes ...
    python -m brdf_tpu fit --preset bunny-ct --out runs/bunny_cold  # process B
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from brdf_tpu.cli import main as cli_main


def fit_and_audit(timings, name, fit_args, out):
    t0 = time.perf_counter()
    rc = cli_main(["fit"] + fit_args + ["--out", out])
    assert rc == 0, (name, rc)
    timings[f"{name}_fit_wall_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    rc = cli_main(["export", "--run", out, "--stats"])
    assert rc == 0, (name, "export", rc)
    timings[f"{name}_export_wall_s"] = round(time.perf_counter() - t0, 2)
    with open(os.path.join(out, "maps", "metrics.json")) as fh:
        m = json.load(fh)
    timings[f"{name}_reprojection_mae"] = m["reprojection_mae"]
    timings[f"{name}_warnings"] = m["warnings"]


def main():
    timings = {"backend": jax.default_backend(), "round": 3}

    # 1. Four reference scenes, fit + audit (metrics.json committed per run)
    fit_and_audit(timings, "bunny_ct", ["--preset", "bunny-ct"], "runs/bunny_tpu")
    fit_and_audit(timings, "timber", ["--preset", "timber-blinn"], "runs/timber")
    fit_and_audit(
        timings, "cup",
        ["--scene", "/root/reference/img/cup", "--model", "cook_torrance"],
        "runs/cup",
    )
    fit_and_audit(
        timings, "complex", ["--preset", "complex-relight"], "runs/complex_relight"
    )

    # 2. Config 4 through the joint Pallas tier (engine auto → pallas on TPU)
    t0 = time.perf_counter()
    rc = cli_main(["fit", "--preset", "bunny-joint", "--out", "runs/bunny_joint"])
    assert rc == 0
    timings["bunny_joint_fit_wall_s"] = round(time.perf_counter() - t0, 2)

    # 3. On-chip overlap-slicing cost (appends TPU rows to SCALING_r3.json)
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import scaling as scaling_mod
        import contextlib
        import io

        ns = argparse.Namespace(texels=131072, views=16)
        buf = io.StringIO()
        from brdf_tpu.solver.lm import LMOptions

        opts = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=20)
        with contextlib.redirect_stdout(buf):
            scaling_mod._overlap_ab(ns, 1, jax.devices(), opts, [])
        row = json.loads(buf.getvalue().strip().splitlines()[-1])
        timings["overlap_onchip"] = row
        if os.path.exists("SCALING_r3.json"):
            art = json.load(open("SCALING_r3.json"))
            art["overlap_onchip_timing"] = row
            json.dump(art, open("SCALING_r3.json", "w"), indent=1)
    except Exception as e:
        timings["overlap_onchip"] = f"failed: {type(e).__name__}: {e}"

    # 4. Warm refit + profiler trace + same-run shading/joint A/Bs →
    #    regenerated phase_timings.json (replaces the stale r2 artifact)
    from brdf_tpu.pipeline.fit import build_face_problem, fit_per_texel
    from brdf_tpu.pipeline.scene import load_reference_scene
    from brdf_tpu.utils.profiling import profiler_trace

    scene = load_reference_scene("/root/reference/img/bunny")
    prob = build_face_problem(scene)
    t0 = time.perf_counter()
    fit_per_texel(prob, "cook_torrance", robust="huber",
                  lower=(0.0, 0.0, 1e-3), upper=(2.0, 2.0, 1.0))
    timings["warm_refit_1_s"] = round(time.perf_counter() - t0, 2)
    os.makedirs("runs/profile", exist_ok=True)
    t0 = time.perf_counter()
    try:
        with profiler_trace("runs/profile/trace"):
            fit_per_texel(prob, "cook_torrance", robust="huber",
                          lower=(0.0, 0.0, 1e-3), upper=(2.0, 2.0, 1.0))
        timings["profiler_trace"] = "ok"
    except Exception as e:
        timings["profiler_trace"] = f"unsupported: {type(e).__name__}: {e}"
    timings["warm_refit_2_s"] = round(time.perf_counter() - t0, 2)

    try:
        import bench

        timings["shading"] = {
            k: v for k, v in bench._shading_mrays().items()
            if not isinstance(v, list)
        }
        timings["joint"] = {
            k: v for k, v in bench._joint_mrays().items()
            if not isinstance(v, list)
        }
    except Exception as e:
        timings["shading"] = f"failed: {type(e).__name__}: {e}"

    with open("runs/profile/phase_timings.json", "w") as fh:
        json.dump(timings, fh, indent=1)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
