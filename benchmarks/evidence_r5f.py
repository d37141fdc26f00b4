"""Round-5 on-chip evidence session F — final HEAD-state validation.

1. bunny-joint re-run under the CURRENT defaults (per-channel saturation
   now reaches the joint tier; bunny's committed r3/r4 joint artifact
   predates it) → runs/bunny_joint_r5 with full metrics, closing the
   per-scene coverage of the new default (cup/complex/timber measured in
   r5b/r5e).
2. ONE final full bench at HEAD (the driver's artifact of record should
   reproduce this row).
3. Multichip-style dryrun of the production entry on the REAL chip is the
   driver's job; entry() Mosaic execution was validated in r5c.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5f.py \
        > runs/evidence_r5f.log 2>&1 &
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

import jax.numpy as jnp  # noqa: E402

from benchmarks.evidence_r5a import log, stage  # noqa: E402
from benchmarks.evidence_r5b import cli  # noqa: E402


def main():
    summary = {"round": "5f"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    @stage(summary, "bunny_joint_r5")
    def run_bunny():
        out = os.path.join(ROOT, "runs", "bunny_joint_r5")
        cli(["fit", "--preset", "bunny-joint", "--out", out])
        cli(["export", "--run", out, "--stats", "--residual", "--view", "0"])
        with open(os.path.join(out, "maps", "metrics.json")) as fh:
            m = json.load(fh)
        summary["bunny_joint_r5"] = {
            "mae": [round(x, 4) for x in m["reprojection_mae"]],
            "r3_r4_baseline": [0.054, 0.043, 0.052],
            "saturated_fraction": m.get("saturated_fraction"),
        }
        log(f"bunny-joint (current defaults) MAE "
            f"{summary['bunny_joint_r5']['mae']}")

    run_bunny()

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
    with open("runs/evidence_r5f_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
