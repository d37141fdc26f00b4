"""Bundle the round-3 scaling evidence into SCALING_r3.json.

Runs benchmarks/scaling.py as subprocesses on the virtual 8-device CPU mesh
(one fresh interpreter per mode so XLA_FLAGS apply cleanly):

- overhead sweeps (data- and view-oriented) — the sharding-machinery cost
  curves, same protocol as SCALING_r2.json;
- hlo mode — collective structure of the sharded fit;
- overlap mode — the r3 addition (VERDICT r2 next-round #7): the A/B of the
  chunked engine's reduction-overlap slicing, recording the compiled
  all-reduce structure with slices=1 vs slices=4. The on-chip slicing-cost
  timing rows are appended by the TPU evidence session
  (benchmarks/evidence_r3.py) when it runs on the real chip.

    python benchmarks/make_scaling_r3.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALING = os.path.join(ROOT, "benchmarks", "scaling.py")


def run(args, views=16, texels=16384):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, SCALING, "--platform", "cpu",
         "--texels", str(texels), "--views", str(views)] + args,
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]


def main():
    artifact = {
        "round": 3,
        "harness": "benchmarks/scaling.py",
        "host": {
            "physical_cores": os.cpu_count(),
            "virtual_devices": 8,
            "note": "virtual CPU mesh; only fixed-total-work 'overhead' "
                    "efficiency is meaningful here — weak scaling requires "
                    "real chips (see SCALING_r2.json for the definition)",
        },
        "overhead_data": run(["--mode", "overhead", "--orient", "data"]),
        "overhead_view_v256": run(
            ["--mode", "overhead", "--orient", "view"], views=256, texels=16384
        ),
        "hlo_view": run(["--mode", "hlo", "--orient", "view"]),
        "overlap_ab": run(
            ["--mode", "overlap"], views=64, texels=8192
        ),
    }
    path = os.path.join(ROOT, "SCALING_r3.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
