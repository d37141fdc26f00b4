"""Round-4 session 9 (quiet): joint VarPro vs the chunked Pallas LM tier
on the real bunny (config 4).

solver/varpro_joint.py profiles the six RGB kd/ks params out of the m=9
joint fit, leaving 3-D Newton over (σ, ou, ov) with a 9-point offset
multi-start. Synthetic verdict: superb medians at 12 fixed iterations,
LM-120 still wins the identifiability-limited tail. This session measures
the real-data consequence: bunny joint fit quality (reprojection MAE,
bounds) + wall time through both engines.

    cd /root/repo && setsid nohup python benchmarks/evidence_r4i.py \
        > runs/evidence_r4i.log 2>&1 &
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
    from brdf_tpu.configs import PRESETS

    summary = {"round": "4i"}
    t_start = time.time()

    import jax.numpy as jnp

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready in {summary['device_claim_secs']}s")

    base = PRESETS["bunny-joint"]
    rows = {}
    for eng in ("auto", "varpro"):
        name = f"bunny_joint_eng_{eng}"
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
        rows[eng] = {
            "mae": m["reprojection_mae"],
            "rmse": m["reprojection_rmse"],
            "at_bounds": m["fraction_at_bounds"],
            "fit_secs": fit_secs,
        }
        log(f"bunny joint {eng}: mae={m['reprojection_mae']} "
            f"fit_secs={fit_secs}")
    summary["bunny_joint_ab"] = rows

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open(os.path.join(ROOT, "runs", "evidence_r4i_summary.json"), "w") as fh:
        json.dump(summary, fh, indent=1)
    log(f"DONE in {summary['total_secs']}s")


if __name__ == "__main__":
    main()
