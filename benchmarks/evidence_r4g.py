"""Round-4 session 7 (quiet): VarPro vs the Pallas LM engine on REAL scenes.

The synthetic bench crowned VarPro (2× throughput at better recovery);
this session asks whether it also earns the real-scene presets: identical
fits (same scenes, IRLS, masks, boxes) through engine="auto" (the fused
Pallas LM tier) and engine="varpro", comparing reprojection quality and
in-process fit wall time.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4g.py \
        > runs/evidence_r4g.log 2>&1 &
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
    import dataclasses as dc

    from brdf_tpu.cli import main as cli_main
    from brdf_tpu.configs import (
        PRESETS, FitConfig, ModelConfig, SceneConfig, SolverConfig,
    )

    summary = {"round": "4g"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    bases = {
        "bunny": PRESETS["bunny-ct"],
        "timber": PRESETS["timber-blinn"],
        "cup": FitConfig(
            name="cup-ct",
            scene=SceneConfig(scene_dir="/root/reference/img/cup"),
            model=ModelConfig(model="cook_torrance"),
            solver=SolverConfig(robust="huber",
                                lower=[0.0, 0.0, 1e-3],
                                upper=[2.0, 2.0, 1.0]),
        ),
    }
    rows = {}
    for scene, base in bases.items():
        rows[scene] = {}
        for eng in ("auto", "varpro"):
            name = f"{scene}_eng_{eng}"
            cfg = dc.replace(base, solver=dc.replace(base.solver, engine=eng),
                             name=name)
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
            rows[scene][eng] = {
                "mae": m["reprojection_mae"],
                "rmse": m["reprojection_rmse"],
                "converged_fraction": m.get("converged_fraction"),
                "chi2": m.get("chi2"),
                "fit_secs": fit_secs,
            }
            log(f"{scene} {eng}: mae={m['reprojection_mae']} "
                f"fit_secs={fit_secs}")
    summary["real_scene_ab"] = rows

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4g_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
