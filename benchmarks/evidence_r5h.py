"""Round-5 on-chip evidence session H — do the fitted rig gains generalize?

The cup study attributed ~7-9%/channel of residual to per-view rig gain
non-uniformity. All three scans used the same LED rig, so if the fitted
gains are REAL rig properties the other scenes should (a) recover a
correlated gain vector and (b) improve. A/B timber-joint-aniso and
complex-joint with fit_view_gains on, against this round's committed
no-gain runs.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5h.py \
        > runs/evidence_r5h.log 2>&1 &
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

import jax.numpy as jnp  # noqa: E402

from benchmarks.evidence_r5a import log, stage  # noqa: E402
from benchmarks.evidence_r5b import cli  # noqa: E402


def fit_and_audit(name, cfg):
    out = os.path.join(ROOT, "runs", name)
    cfg_path = os.path.join("/tmp", f"cfg_{name}.json")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    cli(["fit", "--config", cfg_path, "--out", out])
    cli(["export", "--run", out, "--stats", "--view", "0"])
    with open(os.path.join(out, "maps", "metrics.json")) as fh:
        return json.load(fh)


def main():
    from brdf_tpu.configs import FitConfig, ModelConfig, SceneConfig, SolverConfig

    summary = {"round": "5h"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    REF = "/root/reference/img"
    with open(os.path.join(ROOT, "runs", "cup_joint_gains", "maps",
                           "metrics.json")) as fh:
        cup_gains = np.asarray(json.load(fh)["view_gains"])

    @stage(summary, "timber_gains")
    def run_timber():
        m = fit_and_audit(
            "timber_joint_aniso_gains",
            FitConfig(
                name="timber-joint-aniso-gains",
                scene=SceneConfig(scene_dir=f"{REF}/timber"),
                model=ModelConfig(model="cook_torrance_aniso",
                                  joint_normalmap=True),
                solver=SolverConfig(itmax=40, engine="xla",
                                    fit_view_gains=True),
            ),
        )
        g = np.asarray(m["view_gains"])
        summary["timber_gains"] = {
            "mae": [round(x, 4) for x in m["reprojection_mae"]],
            "no_gain_baseline": [0.1008, 0.1006, 0.1092],
            "gains": [round(float(x), 4) for x in g],
            "corr_with_cup_gains": round(
                float(np.corrcoef(g, cup_gains)[0, 1]), 3
            ),
        }
        log(f"timber joint-aniso + gains: {summary['timber_gains']['mae']} "
            f"corr(cup)={summary['timber_gains']['corr_with_cup_gains']}")

    run_timber()

    @stage(summary, "complex_gains")
    def run_complex():
        m = fit_and_audit(
            "complex_joint_gains",
            FitConfig(
                name="complex-joint-gains",
                scene=SceneConfig(scene_dir=f"{REF}/complexScene",
                                  cal_name="ipod.cal"),
                model=ModelConfig(model="cook_torrance",
                                  joint_normalmap=True),
                solver=SolverConfig(itmax=40, engine="auto",
                                    fit_view_gains=True),
            ),
        )
        g = np.asarray(m["view_gains"])
        summary["complex_gains"] = {
            "mae": [round(x, 4) for x in m["reprojection_mae"]],
            "no_gain_baseline": [0.0997, 0.0923, 0.079],
            "gains": [round(float(x), 4) for x in g],
            "corr_with_cup_gains": round(
                float(np.corrcoef(g, cup_gains)[0, 1]), 3
            ),
        }
        log(f"complex joint + gains: {summary['complex_gains']['mae']} "
            f"corr(cup)={summary['complex_gains']['corr_with_cup_gains']}")

    run_complex()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5h_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
