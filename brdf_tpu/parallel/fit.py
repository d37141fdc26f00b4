"""Sharded per-texel BRDF fitting: texels × views over a device mesh.

The fit step is a ``shard_map`` over the ``(data, view)`` mesh: each device
holds a block of texels and a chunk of views; inside, the batched LM solver
runs with ``axis_name="view"`` so its χ²/JᵀJ/Jᵀe contractions psum over the
view axis (the m×m solves and damping control are then replicated and
bit-identical across view shards). This replaces the reference's serial
per-pixel loop + levmar call chain (``brdfdata.cpp:1195-1221`` →
``dlevmar_bc_dif``) with one compiled, collective-parallel program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.parallel.mesh import DATA_AXIS, VIEW_AXIS
from brdf_tpu.solver.init import linear_grid_init
from brdf_tpu.solver.lm import LMOptions, LMResult, levmar_bc


def _resolve_engine(engine: str, mesh_platform: str, model: str) -> str:
    """Key off the mesh's own platform, not ``jax.default_backend()``: a
    virtual-CPU validation mesh must pick the lax engine even when a real TPU
    is this process's default backend (and vice versa)."""
    if engine != "auto":
        return engine
    from brdf_tpu.ops.lm_pallas import PALLAS_MODELS

    return "pallas" if mesh_platform == "tpu" and model in PALLAS_MODELS else "xla"


@functools.lru_cache(maxsize=None)
def _make_fit_block(
    model: str, mesh: Mesh, opts: LMOptions, lower: tuple, upper: tuple,
    engine: str, use_p0: bool = True,
):
    """The shard_map'ped per-block fit step, cached per static config.

    Caching matters twice over on the tunneled TPU runtime: (a) a fresh
    closure per call would re-trace and re-lower every time, and (b) every
    *distinct jitted program* pays a large one-time first-execution (upload)
    cost, so the same block function must be reused — and traced *inline*
    into larger programs (see :func:`_fit_pipeline_program`) rather than
    jitted per stage.
    """
    spec = MODELS[model]
    mesh_platform = mesh.devices.flat[0].platform
    opts_sharded = opts._replace(axis_name=VIEW_AXIS)

    def residual(p, data):
        ang, y, w = data
        return (spec.fn(p, ang) - y) * w

    tv_spec = P(DATA_AXIS, VIEW_AXIS)
    t_spec = P(DATA_AXIS)

    def fit_block_inner(p0_blk, angles_blk, target_blk, weights_blk, warm_blk):
        if engine == "varpro":
            # Variable-projection engine: separable lobes only. Fixed
            # per-lane iteration count (no slowest-lane tail). Warm (μ, ν)
            # state has no meaning here — VarPro's entire continuation
            # state is the parameter start, honored by EVERY tier when the
            # caller supplied one (``use_p0``: chunked resume / explicit
            # p0; the pipeline's own grid init stays in-kernel on the
            # fused tier, where it is measured cheaper than an HBM-level
            # init). On an unsharded-view TPU mesh the FUSED kernel runs
            # (ops/varpro_pallas.py, whole solve VMEM-resident — measured
            # 2.6× the XLA tier; its in-kernel re-init under each IRLS
            # round's new weights is interpret-parity-tested against the
            # XLA tier); view-sharded or non-TPU meshes take the XLA
            # tier, which psums its Gram/χ²/derivative reductions like
            # the LM engines.
            k = min(opts.itmax, 16)
            if model == "cook_torrance_fresnel":
                # Scale-profiled tier (solver/varpro.py::
                # varpro_fit_fresnel_lin): the lobe is LINEAR in
                # (kd, ks·f0, ks·(1−f0)), so the ks·F0 degeneracy the 2-D
                # Newton tier fights is eliminated in closed form —
                # measured synthetic recovery 0.78 vs 0.63 (2-D Newton) vs
                # 0.54 (LM) at a deeper χ² floor. p0 honored like the
                # fused kernel (roughness carries the state); the
                # pipeline's own init is replaced by the in-function
                # 3-var-NNLS roughness grid.
                from brdf_tpu.solver.varpro import varpro_fit_fresnel_lin

                r = varpro_fit_fresnel_lin(
                    angles_blk, target_blk, weights=weights_blk,
                    p0=p0_blk if use_p0 else None,
                    iters=k, lower=lower, upper=upper,
                    axis_name=VIEW_AXIS if mesh.shape[VIEW_AXIS] > 1 else None,
                )
            elif model in ("ward_aniso", "cook_torrance_aniso"):
                # 3-D shape space (rough_x, rough_y, phi). On an
                # unsharded-view TPU mesh the FUSED d-D kernel runs
                # (varpro_fit_pallas_nd: one analytic evaluation per Newton
                # step — the shading kernel returns b and all ∂b/∂shape_j
                # in a single VMEM-resident pass, vs the XLA tier's 1 + d
                # HBM passes); view-sharded or non-TPU meshes take the XLA
                # tier, which psums its reductions like the LM engines.
                if mesh_platform == "tpu" and mesh.shape[VIEW_AXIS] == 1:
                    from brdf_tpu.ops.varpro_pallas import varpro_fit_pallas_nd

                    r = varpro_fit_pallas_nd(
                        model, angles_blk, target_blk, weights=weights_blk,
                        p0=p0_blk if use_p0 else None,
                        iters=k, lower=lower, upper=upper,
                    )
                else:
                    from brdf_tpu.solver.varpro import varpro_fit_nd

                    r = varpro_fit_nd(
                        model, angles_blk, target_blk, weights=weights_blk,
                        p0=p0_blk, iters=k, lower=lower, upper=upper,
                        axis_name=VIEW_AXIS if mesh.shape[VIEW_AXIS] > 1
                        else None,
                    )
            elif mesh_platform == "tpu" and mesh.shape[VIEW_AXIS] == 1:
                from brdf_tpu.ops.varpro_pallas import varpro_fit_pallas

                r = varpro_fit_pallas(
                    model, angles_blk, target_blk, weights=weights_blk,
                    p0=p0_blk if use_p0 else None,
                    iters=k, lower=lower, upper=upper,
                )
            else:
                from brdf_tpu.solver.varpro import varpro_fit

                r = varpro_fit(
                    model, angles_blk, target_blk, weights=weights_blk,
                    p0=p0_blk, iters=k,
                    lower=lower, upper=upper,
                    axis_name=VIEW_AXIS if mesh.shape[VIEW_AXIS] > 1 else None,
                )
            z = jnp.zeros_like(r.chi2)
            k_full = jnp.full_like(r.iters, k)
            return LMResult(
                p=r.p, chi2=r.chi2, chi2_init=z, g_inf=r.g_abs,
                iters=r.iters, stop=r.stop,
                # every iteration evaluates once regardless of acceptance,
                # so the work counters report the FIXED schedule (k+1 basis
                # evaluations, k closed-form solves), not accepted steps
                # (ADVICE r4)
                nfev=k_full + 1, njev=k_full,
                mu=z, nu=z, nlss=k_full,
                constraint_violation=z,
            )
        if engine == "pallas":
            from brdf_tpu.ops.lm_pallas import (
                SHADING_KERNELS,
                lm_fit_pallas,
                lm_fit_pallas_chunked,
            )

            bounds = dict(lower=lower, upper=upper)
            # Interpret mode keeps the pallas path testable on CPU meshes
            # (glacial — only for correctness runs, never the bench).
            interpret = mesh_platform != "tpu"
            v_local = target_blk.shape[1]
            a = len(SHADING_KERNELS[model].angle_names)
            # Fused tier holds (A+2)·V lanes of angle/target data + ~48 rows
            # of state per lane in VMEM (double-buffered); once the texel
            # block that fits shrinks below 256 lanes, the chunked engine's
            # view streaming wins. A sharded view axis always takes the
            # chunked engine (its normal equations psum over the mesh; the
            # fused kernel's reductions are VMEM-local by construction).
            lane_bytes = 4 * ((a + 2) * v_local + 48)
            fused_block = (10 << 20) // (2 * lane_bytes) // 128 * 128
            # Both engines carry the warm (μ, ν, stop) continuation state, so
            # IRLS rounds and chunked resumes keep their damping trajectory on
            # the Pallas tier exactly as on the XLA tier.
            warm_f = (warm_blk[0], warm_blk[1], warm_blk[2].astype(jnp.float32))
            if mesh.shape[VIEW_AXIS] == 1 and fused_block >= 256:
                r = lm_fit_pallas(
                    model, angles_blk, target_blk, p0_blk, weights=weights_blk,
                    opts=opts._replace(axis_name=None),
                    block_t=min(1024, fused_block),
                    interpret=interpret, warm=warm_f,
                    **bounds,
                )
            else:
                r = lm_fit_pallas_chunked(
                    model, angles_blk, target_blk, p0_blk, weights=weights_blk,
                    opts=opts._replace(axis_name=None),
                    axis_name=VIEW_AXIS if mesh.shape[VIEW_AXIS] > 1 else None,
                    interpret=interpret, warm=warm_f,
                    **bounds,
                )
            z = jnp.zeros_like(r.chi2)
            return LMResult(
                p=r.p, chi2=r.chi2, chi2_init=z, g_inf=r.g_inf,
                iters=r.iters.astype(jnp.int32), stop=r.stop,
                nfev=(2.0 * r.iters + 1).astype(jnp.int32),
                njev=r.iters.astype(jnp.int32),
                mu=r.mu, nu=r.nu,
                nlss=r.iters.astype(jnp.int32),   # one solve per iteration
                constraint_violation=z,
            )
        return levmar_bc(
            residual,
            p0_blk,
            lower,
            upper,
            data=(angles_blk, target_blk, weights_blk),
            opts=opts_sharded,
            warm_state=warm_blk,
        )

    def fit_block(p0, angles, target, weights, warm):
        wrapped = shard_map(
            fit_block_inner,
            mesh=mesh,
            in_specs=(
                t_spec,
                jax.tree.map(lambda _: tv_spec, angles),
                tv_spec,
                tv_spec,
                (t_spec, t_spec, t_spec),
            ),
            out_specs=jax.tree.map(lambda _: t_spec, _result_structure()),
            check_vma=False,
        )
        return wrapped(p0, angles, target, weights, warm)

    return fit_block


@functools.lru_cache(maxsize=None)
def _fit_pipeline_program(
    model: str, mesh: Mesh, opts: LMOptions, lower: tuple, upper: tuple,
    engine: str, robust: str | None, robust_iters: int,
    with_init: bool, dtype_name: str,
):
    """ONE jitted program for the whole fit pipeline: (optional) linear grid
    init → LM fit → ``robust_iters`` IRLS rounds of reweight + warm refit.

    On the tunneled TPU runtime every distinct program pays a large one-time
    first-execution cost, so the CLI-visible wall time of a fit is dominated
    by the *number of programs*, not FLOPs. Fusing the pipeline keeps it at
    exactly one (measured: the same bunny config-3 fit dropped from ~5
    programs × O(30 s) uploads to one).
    """
    spec = MODELS[model]
    # use_p0 = the caller supplied a start (chunked resume / warm refit):
    # every engine tier must honor it. When the pipeline computes its own
    # init (with_init), the fused VarPro tier instead keeps its (cheaper)
    # in-kernel grid init and XLA dead-code-eliminates the outer one.
    fit_block = _make_fit_block(model, mesh, opts, lower, upper, engine,
                                use_p0=not with_init)
    from brdf_tpu.solver.robust import robust_weights

    def run(p0, angles, target, weights, warm):
        t = target.shape[0]
        dt = target.dtype
        warm0 = (
            jnp.zeros((t,), dt),
            jnp.full((t,), 2.0, dt),
            jnp.zeros((t,), jnp.int32),
        )
        if warm is None:
            # cold start synthesized in-program (no host array to assemble —
            # this is what lets the multi-process entry stay local-blocks-only)
            warm = warm0
        if with_init:
            p0 = linear_grid_init(model, angles, target, weights=weights)
        if robust is None or robust_iters == 0:
            return fit_block(p0, angles, target, weights, warm)

        # IRLS rounds as a fori_loop over ONE fit_block instance: round 0
        # selects the caller's weights/start/warm, later rounds the robust
        # reweighting of the previous round's fit. One instance keeps the
        # (remote) compile cost flat in the round count.

        def round_body(i, res):
            first = i == 0
            w_irls = robust_weights(
                spec.fn(res.p, angles) - target, weights, kind=robust
            )
            w_i = jnp.where(first, weights, w_irls)
            p_i = jnp.where(first, p0, res.p)
            warm_i = jax.tree.map(
                lambda a, b: jnp.where(first, a, b), warm, warm0
            )
            return fit_block(p_i, angles, target, w_i, warm_i)

        shapes = jax.eval_shape(fit_block, p0, angles, target, weights, warm)
        res0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
        return jax.lax.fori_loop(0, robust_iters + 1, round_body, res0)

    return jax.jit(run)


def _to_global(x, sharding: NamedSharding):
    """Place ``x`` on the mesh. Single-process: a plain ``device_put``. On a
    multi-process runtime (``jax.process_count() > 1``) the caller provides
    its PROCESS-LOCAL block and the global array is assembled via
    ``jax.make_array_from_process_local_data`` — the mechanism SURVEY.md §2.3
    names for multi-host execution (a ``device_put`` of a host-global array
    cannot work there: each process only holds its addressable shards)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def fit_texels_sharded(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,
    mesh: Mesh,
    opts: LMOptions | None = None,
    p0: jnp.ndarray | None = None,
    weights: jnp.ndarray | None = None,
    lower=None,
    upper=None,
    engine: str = "auto",
    warm_state=None,
    robust: str | None = None,
    robust_iters: int = 0,
) -> LMResult:
    """Fit per-texel BRDF parameters over a ``(data, view)`` device mesh.

    Args:
      model: registered model name.
      angles: (T, V) cosine pytree; T must divide the ``data`` axis size and
        V the ``view`` axis size (use :func:`brdf_tpu.parallel.pad_to_multiple`).
        **Multi-process runtimes** (``jax.process_count() > 1``, e.g. one
        process per pod-slice host): every array argument is this process's
        LOCAL block of the globally-sharded array (the block covered by this
        process's addressable devices under the mesh sharding); the returned
        :class:`LMResult` holds global arrays — read this process's part back
        with :func:`brdf_tpu.parallel.mesh.local_block`.
      target: (T, V) measured intensities.
      mesh: mesh with axes ``(data, view)``.
      p0: optional (T, m) start; default = linear grid init, traced into the
        same program as the fit (sharded inputs, so XLA partitions it too).
      weights: optional (T, V) residual weights (0 masks a measurement).
      engine: "xla" (lax while_loop solver — any model, views shardable),
        "pallas" (fused VMEM kernel when the local view axis fits, else the
        chunked normal-equation kernel that streams view blocks through VMEM
        and psums the per-shard normal equations when views are sharded),
        "varpro" (profiled variable projection, separable m=3 lobes only —
        measured 2× the fused-LM frontier at better recovery on the bench
        distribution, solver/varpro.py), or "auto" (pallas on TPU, xla
        elsewhere).
      warm_state: optional (μ, ν, stop) triple of (T,) arrays (e.g.
        ``prev.warm_state()``) resuming a chunked fit with ``p0=prev.p``;
        terminated lanes short-circuit. Carried by both engines.
      robust/robust_iters: optional IRLS reweighting rounds
        ("huber"/"cauchy"/"tukey"), traced into the same program: each round
        recomputes residual-based weights and refits warm-started from the
        previous round's parameters.

    Returns:
      A per-texel :class:`LMResult`, sharded over ``data``.

    The whole pipeline (init + fit + IRLS) executes as ONE jitted program,
    cached per static configuration — see :func:`_fit_pipeline_program`.
    """
    spec = MODELS[model]
    if opts is None:
        opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=60)
    lower_t = tuple(float(x) for x in np.ravel(np.asarray(
        spec.lower if lower is None else lower)))
    upper_t = tuple(float(x) for x in np.ravel(np.asarray(
        spec.upper if upper is None else upper)))
    if weights is None:
        weights = jnp.ones_like(target)

    tv_sharding = NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))
    t_sharding = NamedSharding(mesh, P(DATA_AXIS))
    angles = jax.tree.map(lambda a: _to_global(a, tv_sharding), angles)
    target = _to_global(target, tv_sharding)
    weights = _to_global(weights, tv_sharding)

    engine = _resolve_engine(engine, mesh.devices.flat[0].platform, model)

    with_init = p0 is None
    if not with_init:
        p0 = _to_global(p0, t_sharding)
    # (p0 stays None under with_init: jit treats None as an empty pytree and
    # the program computes the init itself, sharded like everything else.
    # Same for warm: the cold-start state is synthesized inside the program,
    # so no host array needs assembling.)

    if warm_state is None:
        warm = None
    else:
        warm = tuple(
            _to_global(np.asarray(w), t_sharding) for w in warm_state
        )

    run = _fit_pipeline_program(
        model, mesh, opts, lower_t, upper_t, engine,
        robust, int(robust_iters), with_init, str(np.dtype(target.dtype)),
    )
    return run(p0, angles, target, weights, warm)


def _result_structure() -> LMResult:
    """A template pytree with the same structure as LMResult (for out_specs)."""
    z = jnp.zeros(())
    return LMResult(
        p=z, chi2=z, chi2_init=z, g_inf=z, iters=z, stop=z, nfev=z, njev=z,
        mu=z, nu=z, nlss=z, constraint_violation=z,
    )
