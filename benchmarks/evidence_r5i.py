"""Round-5 on-chip evidence session I — per-texel preset regression sweep.

The round changed the separable-lobe engine dispatch (p0 threading, the
fresnel-lin tier, the fused d-D kernel) under the per-texel presets; this
session re-runs every per-texel ladder preset at HEAD and compares the
reprojection MAE to the r4-committed runs — the "user runs preset X"
experience must not have regressed.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5i.py \
        > runs/evidence_r5i.log 2>&1 &
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

# committed r4 references (runs/* maps/metrics.json of the same presets)
BASELINES = {
    "bunny-ct": [0.0898, 0.0728, 0.0746],        # runs/bunny_eng_varpro
    "timber-blinn": [0.0661, 0.0782, 0.113],      # runs/timber (4-view)
    "complex-relight": [0.1304, 0.1186, 0.0972],  # runs/complex_shadow_off
    "cup-single": None,                           # single-material demo
}


def main():
    summary = {"round": "5i"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    for preset in ("bunny-ct", "timber-blinn", "complex-relight",
                   "cup-single"):
        @stage(summary, preset)
        def run_one(preset=preset):
            name = f"r5i_{preset.replace('-', '_')}"
            out = os.path.join(ROOT, "runs", name)
            cli(["fit", "--preset", preset, "--out", out])
            cli(["export", "--run", out, "--stats", "--view", "0"])
            with open(os.path.join(out, "maps", "metrics.json")) as fh:
                m = json.load(fh)
            row = {
                "mae": [round(x, 4) for x in m["reprojection_mae"]],
                "r4_baseline": BASELINES.get(preset),
            }
            summary[preset] = row
            log(f"{preset}: MAE {row['mae']} (r4 {row['r4_baseline']})")

        run_one()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5i_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
