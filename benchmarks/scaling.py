"""Scaling harness: sharding overhead, weak scaling, and collective structure.

BASELINE's north star asks for >85% scaling efficiency to a 2-host v5e-16.
Real multi-chip hardware is not reachable from this environment (one chip
through a serial tunnel), so this harness separates what is measurable where:

- ``--mode overhead`` (default; meaningful on the virtual CPU mesh): fixed
  TOTAL work, growing mesh. All virtual devices share the same physical
  cores, so ideal sharding costs nothing: ``t(N dev) ≈ t(1 dev)``. The
  efficiency column is ``t(1)/t(N)`` — it isolates the cost of the sharding
  machinery itself (collectives, padding, partitioned compilation) from
  compute scaling, which a shared-core host cannot measure.
- ``--mode weak`` (meaningful only on real chips): fixed work per device.
  On an M-core host running N>M virtual devices this *must* collapse like
  M/N — run it on a pod, not the CPU mesh.
- ``--mode hlo``: compile the sharded fit and report the collective ops XLA
  inserted (all-reduces for the χ²/JᵀJ/Jᵀe view reductions), plus whether
  the TPU latency-hiding scheduler flags are active. This is the committable
  evidence of the reduction structure that rides ICI on a pod.

Mesh orientation: ``--orient data`` shards texels (embarrassingly parallel,
no per-iteration collectives), ``--orient view`` shards the measurement axis
(psum of the normal equations every iteration — the axis whose overlap
matters), ``--orient both`` uses data×view.

On a real pod, set the latency-hiding flags BEFORE the first jax import
(sitecustomize imports jax at startup, so they must come from the
environment):

    XLA_FLAGS="--xla_tpu_enable_async_collective_fusion=true \
               --xla_tpu_enable_async_collective_fusion_fuse_all_gather=true \
               --xla_tpu_overlap_compute_collective_tc=true" \
    python benchmarks/scaling.py --mode weak --orient view

Prints one JSON line per measurement; `make_scaling_artifact.py` bundles a
full sweep into SCALING_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LATENCY_HIDING_FLAGS = (
    "--xla_tpu_enable_async_collective_fusion=true",
    "--xla_tpu_enable_async_collective_fusion_fuse_all_gather=true",
    "--xla_tpu_overlap_compute_collective_tc=true",
)


def _problem(t, v, seed=0):
    import jax.numpy as jnp

    from brdf_tpu.models.brdf import MODELS, ShadingAngles

    rng = np.random.default_rng(seed)
    ang = ShadingAngles(
        cos_ln=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_nh=jnp.asarray(rng.uniform(0, 1, (t, v)), jnp.float32),
        cos_rv=jnp.asarray(rng.uniform(-1, 1, (t, v)), jnp.float32),
        cos_vn=jnp.asarray(rng.uniform(0.1, 1, (t, v)), jnp.float32),
    )
    true_p = np.stack(
        [rng.uniform(.1, .9, t), rng.uniform(.2, 1., t), rng.uniform(2, 30, t)],
        -1,
    ).astype(np.float32)
    target = MODELS["blinn_phong"].fn(jnp.asarray(true_p), ang)
    return ang, target


def _mesh_for(ndev, orient, devices):
    from brdf_tpu.parallel.mesh import make_mesh

    if orient == "data":
        return make_mesh(data=ndev, view=1, devices=devices[:ndev])
    if orient == "view":
        return make_mesh(data=1, view=ndev, devices=devices[:ndev])
    # both: squarest data×view split
    d = 1
    while d * d <= ndev:
        if ndev % d == 0:
            dd = d
        d += 1
    return make_mesh(data=ndev // dd, view=dd, devices=devices[:ndev])


def _timed_fit(ang, target, mesh, opts, engine, reps):
    from brdf_tpu.parallel.fit import fit_texels_sharded

    def run():
        return fit_texels_sharded(
            "blinn_phong", ang, target, mesh, opts=opts, engine=engine
        )

    res = run()
    _ = np.asarray(res.chi2[:1])            # warm: compile + load
    t0 = time.perf_counter()
    for _ in range(reps):
        res = run()
    _ = np.asarray(res.chi2[:1])
    return (time.perf_counter() - t0) / reps


def _device_counts(n_dev):
    counts, c = [], 1
    while c <= n_dev:
        counts.append(c)
        c *= 2
    if counts[-1] != n_dev:
        counts.append(n_dev)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="overhead",
                    choices=["overhead", "weak", "hlo", "overlap"])
    ap.add_argument("--orient", default="data",
                    choices=["data", "view", "both"])
    ap.add_argument("--texels", type=int, default=16384,
                    help="total texels (overhead/hlo) or per-device (weak)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--engine", default="auto")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")

    from brdf_tpu.solver.lm import LMOptions

    n_dev = jax.device_count()
    devices = jax.devices()
    opts = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=20)
    flags = os.environ.get("XLA_FLAGS", "")
    lh_active = [f for f in LATENCY_HIDING_FLAGS if f in flags]

    if args.mode == "hlo":
        ang, target = _problem(args.texels, args.views)
        mesh = _mesh_for(n_dev, args.orient, devices)
        import jax.numpy as jnp
        from brdf_tpu.models.brdf import MODELS
        from brdf_tpu.parallel.fit import _result_structure
        from brdf_tpu.solver.lm import levmar_bc
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        spec = MODELS["blinn_phong"]

        def residual(p, data):
            a, y = data
            return spec.fn(p, a) - y

        opts_v = opts._replace(axis_name="view")
        fit = shard_map(
            lambda p0, a, y: levmar_bc(
                residual, p0, spec.lower, spec.upper, data=(a, y), opts=opts_v
            ),
            mesh=mesh,
            in_specs=(P("data"), jax.tree.map(lambda _: P("data", "view"), ang),
                      P("data", "view")),
            out_specs=jax.tree.map(lambda _: P("data"), _result_structure()),
            check_vma=False,
        )
        p0 = jnp.zeros((args.texels, 3), jnp.float32) + jnp.asarray([0.5, 1.0, 1.0])
        lowered = jax.jit(fit).lower(p0, ang, target)
        hlo = lowered.compile().as_text()
        counts = {
            op: hlo.count(op)
            for op in ("all-reduce", "all-gather", "reduce-scatter",
                       "collective-permute", "all-reduce-start")
        }
        print(json.dumps({
            "mode": "hlo", "orient": args.orient, "devices": n_dev,
            "mesh": dict(mesh.shape),
            "collectives": counts,
            "async_all_reduce": counts.get("all-reduce-start", 0) > 0,
            "latency_hiding_flags_active": lh_active,
            "backend": jax.default_backend(),
        }))
        return

    if args.mode == "overlap":
        _overlap_ab(args, n_dev, devices, opts, lh_active)
        return

    counts = _device_counts(n_dev)
    base = None
    for ndev in counts:
        t_total = args.texels * (ndev if args.mode == "weak" else 1)
        ang, target = _problem(t_total, args.views)
        mesh = _mesh_for(ndev, args.orient, devices)
        secs = _timed_fit(ang, target, mesh, opts, args.engine, args.reps)
        rate = t_total / secs
        row = {
            "mode": args.mode, "orient": args.orient, "devices": ndev,
            "mesh": dict(mesh.shape), "texels": t_total,
            "fits_per_sec": round(rate, 1),
            "secs": round(secs, 4),
            "backend": jax.default_backend(),
        }
        if args.mode == "overhead":
            if base is None:
                base = secs
            row["overhead_efficiency"] = round(base / secs, 3)
        else:
            if base is None:
                base = rate / ndev
            row["weak_efficiency"] = round(rate / (base * ndev), 3)
        if lh_active:
            row["latency_hiding_flags_active"] = lh_active
        print(json.dumps(row), flush=True)


def _overlap_ab(args, n_dev, devices, opts, lh_active):
    """A/B the chunked engine's reduction-overlap slicing (VERDICT r2 #7):

    - **HLO structure** (virtual CPU mesh, view-sharded): overlap_slices=4
      must emit 4 INDEPENDENT (kernel → all-reduce) chains per reduction
      site where slices=1 emits one — the independence XLA's latency-hiding
      scheduler needs to overlap slice k's all-reduce with slice k+1's
      kernel. Counted from the compiled HLO.
    - **Timing** (real TPU chip, mesh 1×1 so the psum is trivial): the
      slicing itself must cost ≈ nothing — the mechanism is free to leave on.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from brdf_tpu.ops.lm_pallas import PallasFitResult, lm_fit_pallas_chunked
    from brdf_tpu.parallel.mesh import VIEW_AXIS, make_mesh

    t, v = args.texels, args.views
    ang, target = _problem(t, v)
    p0 = jnp.zeros((t, 3), jnp.float32) + jnp.asarray([0.5, 1.0, 1.0])
    on_tpu = jax.default_backend() == "tpu"
    view_dev = 1 if on_tpu else n_dev
    mesh = make_mesh(data=1, view=view_dev, devices=devices[:view_dev])
    z = jnp.zeros(())
    res_tpl = PallasFitResult(p=z, chi2=z, iters=z, stop=z, g_inf=z, mu=z, nu=z)

    out = {
        "mode": "overlap", "devices": view_dev, "texels": t, "views": v,
        "backend": jax.default_backend(),
        "latency_hiding_flags_active": lh_active,
    }
    for slices in (1, 4):
        def fit(p0_, a_, y_, slices=slices):
            return lm_fit_pallas_chunked(
                "blinn_phong", a_, y_, p0_, opts=opts,
                lower=(0.0, 0.0, 0.0), upper=(100.0, 100.0, 100.0),
                axis_name=VIEW_AXIS, overlap_slices=slices,
                view_block=16, block_t=1024, interpret=not on_tpu,
            )

        wrapped = jax.jit(shard_map(
            fit, mesh=mesh,
            in_specs=(P(), jax.tree.map(lambda _: P(None, VIEW_AXIS), ang),
                      P(None, VIEW_AXIS)),
            out_specs=jax.tree.map(lambda _: P(), res_tpl),
            check_vma=False,
        ))
        lowered = wrapped.lower(p0, ang, target)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        ar_lines = [l for l in hlo.splitlines() if " all-reduce(" in l]
        # XLA's all-reduce COMBINER may re-merge the per-slice reductions
        # into one VARIADIC all-reduce per site (a tuple of N operands) —
        # same payload, one collective launch; the per-slice independence
        # survives as the tuple arity, which is what the TPU latency-hiding
        # scheduler schedules against. Record both the op count and the
        # max arity so the artifact captures the real compiled structure.
        max_arity = 1
        for l in ar_lines:
            if "= (" in l:
                max_arity = max(max_arity, l.split(" all-reduce(")[0].count("f32["))
        out[f"slices{slices}_all_reduce_ops"] = len(ar_lines)
        out[f"slices{slices}_max_combined_arity"] = max_arity
        out[f"slices{slices}_all_reduce_start"] = hlo.count("all-reduce-start")
        if on_tpu:
            res = wrapped(p0, ang, target)
            _ = np.asarray(res.chi2[:1])
            def timed(n):
                t0 = time.perf_counter()
                for _ in range(n):
                    r = wrapped(p0, ang, target)
                _ = np.asarray(r.chi2[:1])
                return time.perf_counter() - t0
            timed(1)
            t1 = sorted(timed(1) for _ in range(5))[2]
            tn = sorted(timed(11) for _ in range(5))[2]
            out[f"slices{slices}_secs"] = round((tn - t1) / 10, 5)
    if on_tpu and out.get("slices1_secs"):
        out["slicing_cost_ratio"] = round(
            out["slices4_secs"] / out["slices1_secs"], 3
        )
    print(json.dumps(out), flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


if __name__ == "__main__":
    main()
