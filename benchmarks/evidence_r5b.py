"""Round-5 on-chip evidence session B — real-scene quality A/Bs.

ONE process, one device claim (CLAUDE.md TPU-access discipline):

1. Cup joint-tier A/B (VERDICT r4 #1): per-channel saturation masking OFF
   (the r4 behavior) vs ON (the new default) vs ON + per-channel IRLS —
   the two proven quality levers finally reaching the documented
   real-scene default tier. Committed runs: runs/cup_joint_{nosat,sat,
   sat_irls} with full metrics.
2. Timber joint-aniso (VERDICT #2): the m=11 anisotropic joint fit vs the
   per-texel cook_torrance_aniso fit re-run under identical current code —
   MAE + pinning fractions decide the timber default.
3. complexScene joint under the new default (the remaining joint preset).
4. Cup residual-floor diagnosis (VERDICT #8), hypothesis per experiment:
   (a) per-view gain scalars (the rig's LEDs need not be equal-intensity;
       closed-form alternation, brdf_tpu/pipeline/diagnostics.py),
   (b) kappa1 on/off in the projection (raster maps rebuilt),
   (c) signed photo-vs-render residual maps (export --residual artifact).

Launch DETACHED and poll the log:

    cd /root/repo && setsid nohup python benchmarks/evidence_r5b.py \
        > runs/evidence_r5b.log 2>&1 &
"""

from __future__ import annotations

import functools
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


def cli(args):
    from brdf_tpu.cli import main

    log(f"cli: {' '.join(args)}")
    rc = main(args)
    assert rc == 0, f"cli {args} rc={rc}"


def fit_and_audit(name, cfg, view=0, residual=False):
    out = os.path.join(ROOT, "runs", name)
    cfg_path = os.path.join("/tmp", f"cfg_{name}.json")
    with open(cfg_path, "w") as fh:
        fh.write(cfg.to_json())
    cli(["fit", "--config", cfg_path, "--out", out])
    ex = ["export", "--run", out, "--stats", "--view", str(view)]
    if residual:
        ex.append("--residual")
    cli(ex)
    with open(os.path.join(out, "maps", "metrics.json")) as fh:
        return json.load(fh)


def mae_row(m):
    return [round(x, 4) for x in m["reprojection_mae"]]


def main():
    from brdf_tpu.configs import FitConfig, ModelConfig, SceneConfig, SolverConfig

    summary = {"round": "5b"}
    t_start = time.time()

    t0 = time.time()
    np.asarray(jax.jit(lambda: jnp.zeros((1,), jnp.float32))())
    summary["backend"] = jax.default_backend()
    summary["device_claim_secs"] = round(time.time() - t0, 1)
    log(f"device ready ({summary['backend']}) in {summary['device_claim_secs']}s")

    REF = "/root/reference/img"

    def cup_joint_cfg(mask, robust):
        return FitConfig(
            name="cup-joint-ab",
            scene=SceneConfig(scene_dir=f"{REF}/cup"),
            model=ModelConfig(model="cook_torrance", joint_normalmap=True),
            solver=SolverConfig(itmax=40, engine="auto",
                                mask_saturation=mask, robust=robust),
        )

    # ---- 1. cup joint A/B -------------------------------------------------
    @stage(summary, "cup_joint_ab")
    def run_cup():
        ab = {}
        ab["nosat"] = mae_row(fit_and_audit(
            "cup_joint_nosat", cup_joint_cfg(False, None)))
        log(f"cup joint nosat MAE {ab['nosat']}")
        m_sat = fit_and_audit("cup_joint_sat", cup_joint_cfg(True, None),
                              residual=True)
        ab["sat"] = mae_row(m_sat)
        ab["sat_bounds"] = m_sat["fraction_at_bounds"]
        log(f"cup joint sat MAE {ab['sat']}")
        ab["sat_irls"] = mae_row(fit_and_audit(
            "cup_joint_sat_irls", cup_joint_cfg(True, "huber")))
        log(f"cup joint sat+irls MAE {ab['sat_irls']}")
        ab["r4_baseline"] = [0.103, 0.105, 0.107]
        summary["cup_joint_ab"] = ab

    run_cup()

    # ---- 2. timber joint-aniso vs per-texel aniso -------------------------
    @stage(summary, "timber_joint_aniso")
    def run_timber():
        ab = {}
        m_j = fit_and_audit(
            "timber_joint_aniso",
            FitConfig(
                name="timber-joint-aniso",
                scene=SceneConfig(scene_dir=f"{REF}/timber"),
                model=ModelConfig(model="cook_torrance_aniso",
                                  joint_normalmap=True),
                solver=SolverConfig(itmax=40, engine="xla"),
            ),
            residual=True,
        )
        ab["joint_aniso_mae"] = mae_row(m_j)
        ab["joint_aniso_bounds"] = m_j["fraction_at_bounds"]
        log(f"timber joint-aniso MAE {ab['joint_aniso_mae']}")
        m_t = fit_and_audit(
            "timber_ct_aniso_r5",
            FitConfig(
                name="timber-ct-aniso-r5",
                scene=SceneConfig(scene_dir=f"{REF}/timber"),
                model=ModelConfig(model="cook_torrance_aniso"),
                solver=SolverConfig(
                    robust="huber",
                    lower=[0.0, 0.0, 1e-3, 1e-3, -1.5707963],
                    upper=[2.0, 2.0, 1.0, 1.0, 1.5707963],
                ),
            ),
        )
        ab["per_texel_mae"] = mae_row(m_t)
        ab["per_texel_bounds"] = m_t["fraction_at_bounds"]
        log(f"timber per-texel aniso MAE {ab['per_texel_mae']}")
        # 3-D VarPro on the same real data (the engine that BEAT the fused
        # LM kernel on the synthetic aniso ladder, evidence_r5a)
        m_v = fit_and_audit(
            "timber_ct_aniso_vp",
            FitConfig(
                name="timber-ct-aniso-vp",
                scene=SceneConfig(scene_dir=f"{REF}/timber"),
                model=ModelConfig(model="cook_torrance_aniso"),
                solver=SolverConfig(
                    robust="huber", engine="varpro",
                    lower=[0.0, 0.0, 1e-3, 1e-3, -1.5707963],
                    upper=[2.0, 2.0, 1.0, 1.0, 1.5707963],
                ),
            ),
        )
        ab["per_texel_varpro_mae"] = mae_row(m_v)
        ab["per_texel_varpro_bounds"] = m_v["fraction_at_bounds"]
        log(f"timber per-texel aniso VARPRO MAE {ab['per_texel_varpro_mae']}")
        summary["timber_joint_aniso"] = ab

    run_timber()

    # ---- 3. complexScene joint under the new default ----------------------
    @stage(summary, "complex_joint_sat")
    def run_complex():
        m = fit_and_audit(
            "complex_joint_sat",
            FitConfig(
                name="complex-joint-sat",
                scene=SceneConfig(scene_dir=f"{REF}/complexScene",
                                  cal_name="ipod.cal"),
                model=ModelConfig(model="cook_torrance",
                                  joint_normalmap=True),
                solver=SolverConfig(itmax=40, engine="auto"),
            ),
        )
        summary["complex_joint_sat"] = {
            "mae": mae_row(m), "r4_baseline": [0.103, 0.096, 0.081],
        }
        log(f"complex joint sat MAE {mae_row(m)}")

    run_complex()

    # ---- 4a. cup per-view gains ------------------------------------------
    @stage(summary, "cup_view_gains")
    def run_gains():
        from brdf_tpu.configs import PRESETS
        from brdf_tpu.pipeline.diagnostics import estimate_view_gains
        from brdf_tpu.pipeline.fit import build_face_problem, fit_joint_normalmap
        from brdf_tpu.pipeline.scene import load_reference_scene
        from brdf_tpu.io.rig import led_rig_positions
        from brdf_tpu.models.normalmap import joint_eval, joint_spec
        from brdf_tpu.solver.lm import LMOptions

        scene = load_reference_scene(f"{REF}/cup")
        scene.lights = led_rig_positions("cylinder")[: scene.num_views]
        problem = build_face_problem(scene, with_geometry=True)
        jspec = joint_spec("cook_torrance")
        opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=40)
        intensity = np.asarray(problem.intensity)
        w_sat = (np.asarray(problem.weights)[..., None]
                 * (intensity < 0.98)).astype(np.float32)

        def fit_once(y):
            prob = problem._replace(intensity=y.astype(np.float32))
            res, _ = fit_joint_normalmap(prob, opts=opts, engine="auto",
                                         mask_saturation=True)
            return np.asarray(res.p)

        def predict(p):
            return np.asarray(joint_eval(jspec, jnp.asarray(p), problem.geometry))

        def mae_of(pred, gains=None):
            pr = pred if gains is None else pred * gains[None, :, None]
            err = np.abs(pr - intensity)
            n = np.maximum(w_sat.sum((0, 1)), 1e-9)
            return [round(float(x), 4) for x in
                    (w_sat * err).sum((0, 1)) / n]

        p0 = fit_once(intensity)
        pred0 = predict(p0)
        base_mae = mae_of(pred0)
        gains = None
        p_cur = p0
        for r in range(2):
            pred = predict(p_cur)
            gains = estimate_view_gains(pred, intensity, w_sat)
            p_cur = fit_once(intensity / np.maximum(gains[:, None], 1e-6))
            log(f"gain round {r}: spread {gains.min():.3f}..{gains.max():.3f}")
        final_mae = mae_of(predict(p_cur), gains)
        summary["cup_view_gains"] = {
            "baseline_mae": base_mae,
            "gains": [round(float(g), 4) for g in gains],
            "gain_spread": round(float(gains.max() - gains.min()), 4),
            "with_gains_mae": final_mae,
        }
        log(f"cup gains: base {base_mae} -> gains {final_mae} "
            f"(spread {summary['cup_view_gains']['gain_spread']})")

    run_gains()

    # ---- 4b. kappa1 on/off ------------------------------------------------
    @stage(summary, "cup_kappa1_ab")
    def run_kappa():
        from brdf_tpu.pipeline.fit import build_face_problem, fit_per_texel
        from brdf_tpu.pipeline.fit import fit_quality_metrics
        from brdf_tpu.pipeline.scene import load_reference_scene
        from brdf_tpu.io.rig import led_rig_positions
        from brdf_tpu.solver.lm import LMOptions

        out = {}
        for tag, zero_kappa in (("kappa1_on", False), ("kappa1_off", True)):
            scene = load_reference_scene(f"{REF}/cup")
            scene.lights = led_rig_positions("cylinder")[: scene.num_views]
            if zero_kappa:
                scene.cameras = [
                    c._replace(kappa1=np.asarray(0.0, np.float64))
                    for c in scene.cameras
                ]
                scene._raster_cache.clear()
            problem = build_face_problem(scene)
            rep = fit_per_texel(
                problem, "cook_torrance",
                opts=LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=40),
                engine="varpro",
                lower=(0.0, 0.0, 1e-3), upper=(2.0, 2.0, 1.0),
            )
            m = fit_quality_metrics(problem, rep.params, "cook_torrance",
                                    lower=(0.0, 0.0, 1e-3),
                                    upper=(2.0, 2.0, 1.0))
            out[tag] = mae_row(m)
            log(f"{tag}: MAE {out[tag]}")
        summary["cup_kappa1_ab"] = out

    run_kappa()

    summary["total_secs"] = round(time.time() - t_start, 1)
    with open("runs/evidence_r5b_summary.json", "w") as fh:
        json.dump(summary, fh, indent=1)
    log("DONE")


if __name__ == "__main__":
    main()
