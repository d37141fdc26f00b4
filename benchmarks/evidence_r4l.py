"""Round-4 session 11 (quiet): m=4 Fresnel engine A/B on the real bunny.

Completes the real-data evidence chain for the VarPro family: the
cook_torrance_fresnel lobe fit through engine="auto" (the fused m=4
Pallas LM tier) vs engine="varpro" (the 2-D profiled Newton tier,
solver/varpro.py::varpro_fit_fresnel), identical everything-else.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4l.py \
        > runs/evidence_r4l.log 2>&1 &
"""

from __future__ import annotations

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


def main():
    from brdf_tpu.cli import main as cli_main
    from brdf_tpu.configs import FitConfig, ModelConfig, SceneConfig, SolverConfig

    summary = {"round": "4l"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    rows = {}
    for eng in ("auto", "varpro"):
        name = f"bunny_fresnel_eng_{eng}"
        cfg = FitConfig(
            name=name,
            scene=SceneConfig(scene_dir="/root/reference/img/bunny"),
            model=ModelConfig(model="cook_torrance_fresnel"),
            solver=SolverConfig(
                robust="huber", engine=eng,
                lower=[0.0, 0.0, 1e-3, 0.0], upper=[2.0, 2.0, 1.0, 1.0],
            ),
        )
        cfg_path = f"/tmp/cfg_{name}.json"
        with open(cfg_path, "w") as fh:
            fh.write(cfg.to_json())
        out = os.path.join(ROOT, "runs", name)
        assert cli_main(["fit", "--config", cfg_path, "--out", out]) == 0
        assert cli_main(["export", "--run", out, "--stats"]) == 0
        with open(os.path.join(out, "maps", "metrics.json")) as fh:
            m = json.load(fh)
        with open(os.path.join(out, "events.jsonl")) as fh:
            events = [json.loads(l) for l in fh]
        fit_secs = next(e["secs"] for e in events if e["kind"] == "fit_done")
        rows[eng] = {"mae": m["reprojection_mae"],
                     "rmse": m["reprojection_rmse"],
                     "at_bounds": m["fraction_at_bounds"],
                     "fit_secs": fit_secs}
        log(f"bunny fresnel {eng}: mae={m['reprojection_mae']} "
            f"fit_secs={fit_secs}")
    summary["bunny_fresnel_ab"] = rows

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4l_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
