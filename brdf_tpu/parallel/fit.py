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
        "pallas" (fused VMEM kernel — 3-param lobes, view axis must be
        unsharded since the kernel reduces its views locally), or "auto"
        (pallas on TPU when eligible).
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

    if engine == "auto":
        from brdf_tpu.ops.lm_pallas import PALLAS_MODELS

        # Key off the mesh's own platform, not jax.default_backend(): a
        # virtual-CPU validation mesh must pick the lax engine even when a
        # real TPU is this process's default backend (and vice versa).
        mesh_platform = mesh.devices.flat[0].platform
        pallas_ok = (
            mesh_platform == "tpu"
            and model in PALLAS_MODELS
            and mesh.shape[VIEW_AXIS] == 1
        )
        engine = "pallas" if pallas_ok else "xla"
    if engine == "pallas" and mesh.shape[VIEW_AXIS] != 1:
        raise ValueError("pallas engine requires the view axis unsharded")
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
            from brdf_tpu.ops.lm_pallas import lm_fit_pallas

            r = lm_fit_pallas(
                model, angles_blk, target_blk, p0_blk, weights=weights_blk,
                opts=opts._replace(axis_name=None),
                lower=tuple(float(x) for x in np.asarray(lower)),
                upper=tuple(float(x) for x in np.asarray(upper)),
            )
            z = jnp.zeros_like(r.chi2)
            return LMResult(
                p=r.p, chi2=r.chi2, chi2_init=z, g_inf=r.g_inf,
                iters=r.iters.astype(jnp.int32), stop=r.stop,
                nfev=(2.0 * r.iters + 1).astype(jnp.int32),
                njev=r.iters.astype(jnp.int32),
                mu=r.mu, nu=jnp.full_like(r.mu, 2.0),
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
        mu=z, nu=z,
    )
