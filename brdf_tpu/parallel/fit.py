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
) -> LMResult:
    """Fit per-texel BRDF parameters over a ``(data, view)`` device mesh.

    Args:
      model: registered model name.
      angles: (T, V) cosine pytree; T must divide the ``data`` axis size and
        V the ``view`` axis size (use :func:`brdf_tpu.parallel.pad_to_multiple`).
      target: (T, V) measured intensities.
      mesh: mesh with axes ``(data, view)``.
      p0: optional (T, m) start; default = linear grid init (computed under
        jit with sharded inputs, so XLA partitions it across the mesh too).
      weights: optional (T, V) residual weights (0 masks a measurement).
      engine: "xla" (lax while_loop solver — any model, views shardable),
        "pallas" (fused VMEM kernel when the local view axis fits, else the
        chunked normal-equation kernel that streams view blocks through VMEM
        and psums the per-shard normal equations when views are sharded),
        or "auto" (pallas on TPU, xla elsewhere).
      warm_state: optional (μ, ν, stop) triple of (T,) arrays (e.g.
        ``prev.warm_state()``) resuming a chunked fit with ``p0=prev.p``;
        terminated lanes short-circuit. XLA engine only.

    Returns:
      A per-texel :class:`LMResult`, sharded over ``data``.
    """
    spec = MODELS[model]
    if opts is None:
        opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=60)
    if lower is None:
        lower = spec.lower
    if upper is None:
        upper = spec.upper
    if weights is None:
        weights = jnp.ones_like(target)

    tv_sharding = NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))
    t_sharding = NamedSharding(mesh, P(DATA_AXIS))
    angles = jax.tree.map(lambda a: jax.device_put(a, tv_sharding), angles)
    target = jax.device_put(target, tv_sharding)
    weights = jax.device_put(weights, tv_sharding)

    if p0 is None:
        # The initializer is elementwise over texels with view reductions —
        # plain jit over sharded inputs lets XLA insert the (tiny) psums.
        p0 = jax.jit(
            functools.partial(linear_grid_init, model),
            out_shardings=t_sharding,
        )(angles, target, weights=weights)
    else:
        p0 = jax.device_put(p0, t_sharding)

    # Key off the mesh's own platform, not jax.default_backend(): a
    # virtual-CPU validation mesh must pick the lax engine even when a
    # real TPU is this process's default backend (and vice versa).
    mesh_platform = mesh.devices.flat[0].platform
    if engine == "auto":
        from brdf_tpu.ops.lm_pallas import PALLAS_MODELS

        engine = (
            "pallas"
            if mesh_platform == "tpu" and model in PALLAS_MODELS
            else "xla"
        )
    if warm_state is not None and engine == "pallas":
        raise ValueError("warm_state resume requires the xla engine")

    if warm_state is None:
        t = target.shape[0]
        warm = (
            jnp.zeros((t,), target.dtype),
            jnp.full((t,), 2.0, target.dtype),
            jnp.zeros((t,), jnp.int32),
        )
    else:
        warm = tuple(jnp.asarray(w) for w in warm_state)
    warm = tuple(jax.device_put(w, t_sharding) for w in warm)

    opts_sharded = opts._replace(axis_name=VIEW_AXIS)

    def residual(p, data):
        ang, y, w = data
        return (spec.fn(p, ang) - y) * w

    tv_spec = P(DATA_AXIS, VIEW_AXIS)
    t_spec = P(DATA_AXIS)

    @functools.partial(
        shard_map,
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
    def fit_block(p0_blk, angles_blk, target_blk, weights_blk, warm_blk):
        if engine == "pallas":
            from brdf_tpu.ops.lm_pallas import (
                SHADING_KERNELS,
                lm_fit_pallas,
                lm_fit_pallas_chunked,
            )

            bounds = dict(
                lower=tuple(float(x) for x in np.asarray(lower)),
                upper=tuple(float(x) for x in np.asarray(upper)),
            )
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
            if mesh.shape[VIEW_AXIS] == 1 and fused_block >= 256:
                r = lm_fit_pallas(
                    model, angles_blk, target_blk, p0_blk, weights=weights_blk,
                    opts=opts._replace(axis_name=None),
                    block_t=min(1024, fused_block),
                    interpret=interpret,
                    **bounds,
                )
            else:
                r = lm_fit_pallas_chunked(
                    model, angles_blk, target_blk, p0_blk, weights=weights_blk,
                    opts=opts._replace(axis_name=None),
                    axis_name=VIEW_AXIS if mesh.shape[VIEW_AXIS] > 1 else None,
                    interpret=interpret,
                    **bounds,
                )
            z = jnp.zeros_like(r.chi2)
            return LMResult(
                p=r.p, chi2=r.chi2, chi2_init=z, g_inf=r.g_inf,
                iters=r.iters.astype(jnp.int32), stop=r.stop,
                nfev=(2.0 * r.iters + 1).astype(jnp.int32),
                njev=r.iters.astype(jnp.int32),
                mu=r.mu, nu=jnp.full_like(r.mu, 2.0),
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

    return jax.jit(fit_block)(p0, angles, target, weights, warm)


def _result_structure() -> LMResult:
    """A template pytree with the same structure as LMResult (for out_specs)."""
    z = jnp.zeros(())
    return LMResult(
        p=z, chi2=z, chi2_init=z, g_inf=z, iters=z, stop=z, nfev=z, njev=z,
        mu=z, nu=z, nlss=z, constraint_violation=z,
    )
