"""Round-5 on-chip evidence session C — gate validation + fixed gain study.

1. FULL bench.py at the shipped default with the RECALIBRATED fused-LM-row
   gates (kd ≥ 0.62, χ²p99 ≤ 0.12 — set from the r5a on-chip measurement):
   must be rc=0 end to end.
2. Driver-entry compile check on the real chip: entry() now routes through
   the Mosaic-compiled fused loss+grad kernel — run it once.
3. Cup per-view gain study, FIXED (r5b's alternation diverged because
   scaling the intensity corrupted the in-fit saturation mask and gains
   were unclamped): per-channel masks are computed against the ORIGINAL
   measurements and passed as (T, V, 3) problem weights with
   mask_saturation=False; gains are clamped to [0.5, 2]. Reports the
   apply-only delta (gains on the base fit, no refit) and the
   refit-under-gains delta.

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5c.py \
        > runs/evidence_r5c.log 2>&1 &
"""

from __future__ import annotations

import contextlib
import functools
import io
import json
import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.chdir(ROOT)

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage(summary, key):
    def deco(fn):
        @functools.wraps(fn)
        def run(*a, **k):
            try:
                return fn(*a, **k)
            except Exception:
                tb = traceback.format_exc()
                log(f"STAGE {key} FAILED:\n{tb}")
                summary.setdefault("failures", {})[key] = tb.splitlines()[-1]
                return None
        return run
    return deco


def main():
    summary = {"round": "5c"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    # ---- 1. full bench with recalibrated gates ---------------------------
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
            f"recovery={row['recovery_frac']:.4f} "
            f"gates={'GREEN' if code == 0 else row.get('gate_failed')}")

    run_bench()

    # ---- 2. entry() on the real chip (Mosaic path) -----------------------
    @stage(summary, "entry_mosaic")
    def run_entry():
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        loss = float(out[0])
        summary["entry_mosaic"] = {"loss": loss, "ok": bool(np.isfinite(loss))}
        log(f"entry (Mosaic fused kernel) loss={loss:.4f}")

    run_entry()

    # ---- 3. cup per-view gains, fixed ------------------------------------
    @stage(summary, "cup_view_gains")
    def run_gains():
        from brdf_tpu.pipeline.diagnostics import estimate_view_gains
        from brdf_tpu.pipeline.fit import build_face_problem, fit_joint_normalmap
        from brdf_tpu.pipeline.scene import load_reference_scene
        from brdf_tpu.io.rig import led_rig_positions
        from brdf_tpu.models.normalmap import joint_eval, joint_spec
        from brdf_tpu.solver.lm import LMOptions

        scene = load_reference_scene("/root/reference/img/cup")
        scene.lights = led_rig_positions("cylinder")[: scene.num_views]
        problem = build_face_problem(scene, with_geometry=True)
        jspec = joint_spec("cook_torrance")
        opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=40)
        intensity = np.asarray(problem.intensity)
        # per-channel mask from the ORIGINAL measurements, frozen across
        # the alternation (the refit sees scaled targets but the mask must
        # not move)
        w_sat = (np.asarray(problem.weights)[..., None]
                 * (intensity < 0.98)).astype(np.float32)

        def fit_once(y):
            prob = problem._replace(
                intensity=y.astype(np.float32), weights=w_sat
            )
            res, _ = fit_joint_normalmap(prob, opts=opts, engine="auto",
                                         mask_saturation=False)
            return np.asarray(res.p)

        def predict(p):
            return np.asarray(
                joint_eval(jspec, jnp.asarray(p), problem.geometry)
            )

        def mae_of(pred, gains=None):
            pr = pred if gains is None else pred * gains[None, :, None]
            err = np.abs(pr - intensity)
            n = np.maximum(w_sat.sum((0, 1)), 1e-9)
            return [round(float(x), 4) for x in (w_sat * err).sum((0, 1)) / n]

        p0 = fit_once(intensity)
        pred0 = predict(p0)
        base_mae = mae_of(pred0)
        gains0 = estimate_view_gains(pred0, intensity, w_sat)
        apply_only_mae = mae_of(pred0, gains0)
        log(f"base {base_mae} apply-only {apply_only_mae} "
            f"gains {np.round(gains0, 3).tolist()}")

        gains = gains0
        p_cur = p0
        for r in range(2):
            p_cur = fit_once(intensity / np.maximum(gains[:, None], 1e-3))
            pred = predict(p_cur)
            gains = estimate_view_gains(pred, intensity, w_sat)
            log(f"round {r}: gains {gains.min():.3f}..{gains.max():.3f} "
                f"mae {mae_of(pred, gains)}")
        final_mae = mae_of(predict(p_cur), gains)
        summary["cup_view_gains"] = {
            "baseline_mae": base_mae,
            "apply_only_mae": apply_only_mae,
            "gains_round0": [round(float(g), 4) for g in gains0],
            "gains_final": [round(float(g), 4) for g in gains],
            "gain_spread_final": round(float(gains.max() - gains.min()), 4),
            "refit_with_gains_mae": final_mae,
        }
        log(f"cup gains FIXED: base {base_mae} -> refit+gains {final_mae}")

    run_gains()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5c_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
