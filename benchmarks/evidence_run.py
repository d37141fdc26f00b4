"""One-process on-chip evidence generator (round 2).

The tunneled TPU runtime grants device claims serially per process and
punishes process churn (CLAUDE.md TPU-access discipline), so every on-chip
evidence artifact is produced from THIS single process:

1. ``runs/bunny_tpu``     — config-3 preset fit (BASELINE.md row 3) + a
   rendered view, with per-phase timings in events.jsonl;
2. ``runs/bunny_fresnel`` — 4-parameter Cook-Torrance+Fresnel per-texel fit
   through the m=4 fused Pallas tier (BASELINE.md row 4);
3. ``runs/profile``       — a ``jax.profiler`` trace of one warm refit
   (SURVEY.md §5 tracing row; VERDICT r1 Weak #8 asked for a committed
   profiler artifact) plus ``phase_timings.json`` separating cold-process
   costs (compile/upload) from the warm in-process solve, which on this
   runtime differ by two orders of magnitude (docs/DESIGN.md §6).

    python benchmarks/evidence_run.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import logging

logging.basicConfig(level=logging.INFO)
logging.getLogger("jax._src.compilation_cache").setLevel(logging.DEBUG)
logging.getLogger("jax._src.compiler").setLevel(logging.DEBUG)

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from brdf_tpu.cli import main as cli_main


def main():
    timings = {"backend": jax.default_backend()}

    t0 = time.perf_counter()
    rc = cli_main(["fit", "--preset", "bunny-ct", "--out", "runs/bunny_tpu"])
    assert rc == 0
    timings["bunny_ct_fit_wall_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rc = cli_main(["render", "--run", "runs/bunny_tpu", "--view", "0"])
    assert rc == 0
    timings["bunny_render_wall_s"] = round(time.perf_counter() - t0, 2)

    # 4-param fresnel fit exercising the m=4 fused tier end-to-end
    t0 = time.perf_counter()
    rc = cli_main([
        "fit", "--scene", "/root/reference/img/bunny",
        "--model", "cook_torrance_fresnel", "--out", "runs/bunny_fresnel",
    ])
    assert rc == 0
    timings["bunny_fresnel_fit_wall_s"] = round(time.perf_counter() - t0, 2)

    # Warm in-process refit under a profiler trace: programs are compiled and
    # uploaded by now, so this measures the actual solve the way a resident
    # service would see it.
    from brdf_tpu.pipeline.scene import load_reference_scene
    from brdf_tpu.pipeline.fit import build_face_problem, fit_per_texel
    from brdf_tpu.utils.profiling import profiler_trace

    scene = load_reference_scene("/root/reference/img/bunny")
    prob = build_face_problem(scene)
    t0 = time.perf_counter()
    fit_per_texel(prob, "cook_torrance", robust="huber")   # ensure warm
    timings["warm_refit_1_s"] = round(time.perf_counter() - t0, 2)
    os.makedirs("runs/profile", exist_ok=True)
    t0 = time.perf_counter()
    try:
        with profiler_trace("runs/profile/trace"):
            fit_per_texel(prob, "cook_torrance", robust="huber")
        timings["profiler_trace"] = "ok"
    except Exception as e:   # tunnel runtimes may not support device tracing
        timings["profiler_trace"] = f"unsupported: {type(e).__name__}: {e}"
    timings["warm_refit_2_s"] = round(time.perf_counter() - t0, 2)

    # shading Pallas-vs-XLA A/B on the bench's own distribution, so the
    # bench gate (ratio >= 1.0) is validated before the driver's run
    try:
        import bench

        timings["shading"] = {
            k: v for k, v in bench._shading_mrays().items()
            if not isinstance(v, list)
        }
    except Exception as e:
        timings["shading"] = f"failed: {type(e).__name__}: {e}"

    with open("runs/profile/phase_timings.json", "w") as fh:
        json.dump(timings, fh, indent=1)
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
