"""Bundle the round-5 scaling evidence into SCALING_r5.json.

Same harness, SAME PINNED SHAPES AND SEEDS as rounds 2/3/4 (texels=16384,
seed 0 inside benchmarks/scaling.py::_problem, V=16 for the data-orient
sweep and V=256 for the view-orient sweep, 8 virtual CPU devices), so the
efficiency numbers are comparable round over round — plus a ``trend`` block
that extracts the like-for-like 8-device overhead efficiencies from the
committed SCALING_r2/r3/r4.json next to this round's, with the
physical-core count recorded beside every number (VERDICT r3 #8: the
view-axis figure drifted 0.726 → 0.602 across rounds with nothing tracking
whether that was environment noise or a real regression).

    python benchmarks/make_scaling_r5.py
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


def _eff_at_8(rows):
    for r in rows:
        if r.get("devices") == 8:
            return r.get("overhead_efficiency")
    return None


def _prior_effs():
    """8-device overhead efficiencies from the committed r2/r3 artifacts."""
    out = {}
    with open(os.path.join(ROOT, "SCALING_r2.json")) as fh:
        r2 = json.load(fh)
    out["r2"] = {
        "data_orient_v16": _eff_at_8(r2["overhead_mode"]["data_sharded_texels_v16"]),
        "view_orient_v256": _eff_at_8(r2["overhead_mode"]["view_sharded_v256"]),
        "physical_cores": r2["host"]["physical_cores"],
    }
    for key, fname in (("r3", "SCALING_r3.json"), ("r4", "SCALING_r4.json")):
        with open(os.path.join(ROOT, fname)) as fh:
            rn = json.load(fh)
        out[key] = {
            "data_orient_v16": _eff_at_8(rn["overhead_data"]),
            "view_orient_v256": _eff_at_8(rn["overhead_view_v256"]),
            "physical_cores": rn["host"]["physical_cores"],
        }
    return out


def main():
    overhead_data = run(["--mode", "overhead", "--orient", "data"])
    overhead_view = run(
        ["--mode", "overhead", "--orient", "view"], views=256, texels=16384
    )
    trend = _prior_effs()
    trend["r5"] = {
        "data_orient_v16": _eff_at_8(overhead_data),
        "view_orient_v256": _eff_at_8(overhead_view),
        "physical_cores": os.cpu_count(),
    }
    artifact = {
        "round": 5,
        "harness": "benchmarks/scaling.py",
        "host": {
            "physical_cores": os.cpu_count(),
            "virtual_devices": 8,
            "note": "virtual CPU mesh; only fixed-total-work 'overhead' "
                    "efficiency is meaningful here — weak scaling requires "
                    "real chips (see SCALING_r2.json for the definition)",
        },
        "pinned": {
            "texels": 16384, "seed": 0, "data_orient_views": 16,
            "view_orient_views": 256, "devices": 8,
            "note": "identical shapes/seeds to SCALING_r2/r3/r4",
        },
        "overhead_data": overhead_data,
        "overhead_view_v256": overhead_view,
        "hlo_view": run(["--mode", "hlo", "--orient", "view"]),
        "overlap_ab": run(["--mode", "overlap"], views=64, texels=8192),
        "trend": {
            "definition": "overhead_efficiency at 8 virtual devices, fixed "
                          "total work (t(1 dev)/t(8 dev)); all rounds ran "
                          "the same shapes and seed on a shared-core host, "
                          "so cross-round deltas bound BOTH sharding-"
                          "machinery changes and host noise — the "
                          "physical-core count is recorded per round",
            **trend,
        },
    }
    path = os.path.join(ROOT, "SCALING_r5.json")
    with open(path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print("wrote", path)
    print(json.dumps(artifact["trend"], indent=1))


if __name__ == "__main__":
    main()
