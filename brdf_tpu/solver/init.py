"""Linearized grid initialization for lobe fits.

The reference starts every per-pixel fit at the fixed point ``{0.5, 1, 1}``
(``/root/reference/brdfdata.cpp:1085``), which strands many texels in a
well-known trap of Phong-family objectives: once ``ks`` reaches its 0 bound,
the shininess has zero Jacobian (it only appears multiplied by ``ks``) and the
fit deadlocks at a spurious stationary point.

This module removes the trap structurally instead of imitating it: every
registered lobe is *linear in its leading parameters given its shape
parameters* (``ModelSpec.linear``: (kd, ks) for specular lobes, kd alone for
the diffuse-only family), so for a small grid of shape values we can solve
the 1- or 2-variable nonnegative least-squares per texel in closed form,
score each grid point by its χ², and start LM from the best — a fully
vectorized, TPU-friendly initializer (a (G, T, V) elementwise pass + tiny
closed-form solves; no iteration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import MODELS, ShadingAngles


def default_shape_grid(model: str, num: int = 16) -> np.ndarray:
    """Grid over the model's nonlinear shape parameters, shaped (G, k)."""
    if model in ("phong", "blinn_phong"):
        # shininess exponent: log-spaced 1 .. ~300
        return np.geomspace(1.0, 300.0, num)[:, None]
    if model == "cook_torrance":
        return np.linspace(0.03, 1.0, num)[:, None]
    if model == "cook_torrance_fresnel":
        r = np.linspace(0.03, 1.0, max(num // 4, 2))
        f = np.linspace(0.05, 1.0, 4)
        rr, ff = np.meshgrid(r, f, indexing="ij")
        return np.stack([rr.ravel(), ff.ravel()], axis=-1)
    if model == "ward":
        return np.linspace(0.05, 1.0, num)[:, None]
    if model == "oren_nayar":
        return np.linspace(0.0, 1.5, num)[:, None]
    if model == "minnaert":
        return np.linspace(0.3, 3.0, num)[:, None]
    if model == "lambert":
        return np.zeros((1, 0))      # no shape parameters: one closed-form solve
    if model in ("ward_aniso", "cook_torrance_aniso"):
        # (rough_x, rough_y, phi): coarse roughness pairs × two orientations.
        # phi has period π and the solver refines it quickly once the
        # roughness pair is in the right basin, so the grid stays small.
        r = np.geomspace(0.05, 1.0, max(num // 4, 3))
        rx, ry = np.meshgrid(r, r, indexing="ij")
        out = []
        for phi in (0.0, np.pi / 4):
            out.append(
                np.stack([rx.ravel(), ry.ravel(), np.full(rx.size, phi)], axis=-1)
            )
        return np.concatenate(out, axis=0)
    raise ValueError(f"no default shape grid for model {model!r}")


def _nnls2(aa, ab, bb, ay, by):
    """Closed-form 2-variable nonnegative least squares
    ``min ‖x₀·A + x₁·B − y‖², x ≥ 0`` from the Gram entries.

    Solve unconstrained 2×2; if a coefficient is negative, fall back to the
    better of the two single-variable clamped solutions (exact for 2 vars).
    All inputs broadcast elementwise.
    """
    det = aa * bb - ab * ab
    det_safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    x0 = (bb * ay - ab * by) / det_safe
    x1 = (aa * by - ab * ay) / det_safe
    interior_ok = (jnp.abs(det) > 1e-30) & (x0 >= 0) & (x1 >= 0)

    # single-variable solutions (the other clamped to 0)
    a_only = jnp.maximum(ay / jnp.maximum(aa, 1e-30), 0.0)
    b_only = jnp.maximum(by / jnp.maximum(bb, 1e-30), 0.0)
    # χ² (up to the constant yᵀy): ‖xA+yB‖² − 2 xᵀ(A,B)ᵀy
    cost_a = a_only * a_only * aa - 2.0 * a_only * ay
    cost_b = b_only * b_only * bb - 2.0 * b_only * by
    pick_a = cost_a <= cost_b
    edge0 = jnp.where(pick_a, a_only, 0.0)
    edge1 = jnp.where(pick_a, 0.0, b_only)

    out0 = jnp.where(interior_ok, x0, edge0)
    out1 = jnp.where(interior_ok, x1, edge1)
    return out0, out1


def linear_grid_init(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,
    shape_grid: np.ndarray | None = None,
    weights: jnp.ndarray | None = None,
    refine: bool = False,
) -> jnp.ndarray:
    """Best (kd, ks, shape…) start per texel from a shape-parameter grid.

    Args:
      model: registered model name (must be linear in its leading
        ``ModelSpec.linear`` params — 2 for specular lobes, 1 for diffuse-only).
      angles: per-(texel, view) cosines, leading shape ``(..., V)``.
      target: measured intensities ``(..., V)``.
      shape_grid: ``(G, k)`` nonlinear-parameter grid (default per model).
      weights: optional per-(texel, view) weights (e.g. visibility masks).
      refine: for single-shape-parameter models, parabolically interpolate
        the χ²(shape) minimum between the best grid point and its neighbors
        (in the grid's own spacing — log for the exponent, linear for
        roughness) and re-solve the NNLS at the refined per-texel shape.
        Measured r4 (runs/evidence_r4{d,e}_summary.json, one v5e chip):
        cuts the MEDIAN initial exponent error ~6× (0.098 → 0.016) but
        leaves fused-LM recovery UNCHANGED at every itmax — the recovery
        tail is non-convex/ill-conditioned lanes whose init error the
        parabola cannot fix (init p99 unchanged) — while costing ~10% of a
        131k-texel itmax-24 fit even in its gather-free form. Off by
        default; the block-until-slowest-lane cost model means a median-
        only improvement buys nothing here. Opt in for workloads billed
        per ITERATION rather than per block (e.g. the vmapped XLA tier).

    Returns:
      ``(..., n_params)`` initial parameters (= linear + k shape columns).
    """
    spec = MODELS[model]
    n_lin = spec.linear              # 2 for (kd, ks) lobes, 1 for diffuse-only
    k = spec.n_params - n_lin
    if shape_grid is None:
        shape_grid = default_shape_grid(model)
    shape_grid = (
        np.asarray(shape_grid, dtype=np.float64).reshape(-1, k)
        if k else np.zeros((1, 0))     # shape-free lobe: one closed-form solve
    )
    g_count = shape_grid.shape[0]
    dtype = target.dtype

    if weights is None:
        weights = jnp.ones_like(target)
    weights = weights.astype(dtype)   # caller-supplied f64 weights must not
                                      # promote the f32 scan carry under x64

    ty = target * weights
    grid = jnp.asarray(shape_grid, dtype)         # (G, k)

    def score(shape_vals):
        """One grid point → (params (..., m), cost (...))."""
        if n_lin == 1:
            unit_kd = jnp.concatenate([jnp.asarray([1.0], dtype), shape_vals])
            a = spec.fn(unit_kd, angles)          # diffuse basis (..., V)
            aw = a * weights
            aa = jnp.sum(aw * a, axis=-1)
            ay = jnp.sum(a * ty, axis=-1)
            kd = jnp.maximum(ay / jnp.maximum(aa, 1e-30), 0.0)
            cost = kd * kd * aa - 2.0 * kd * ay
            p_gi = jnp.concatenate(
                [kd[..., None], jnp.broadcast_to(shape_vals, kd.shape + (k,))],
                axis=-1,
            )
            return p_gi, cost
        unit_kd = jnp.concatenate([jnp.asarray([1.0, 0.0], dtype), shape_vals])
        unit_ks = jnp.concatenate([jnp.asarray([0.0, 1.0], dtype), shape_vals])
        a = spec.fn(unit_kd, angles)              # diffuse basis  (..., V)
        b = spec.fn(unit_ks, angles)              # specular basis (..., V)
        aw = a * weights
        bw = b * weights
        aa = jnp.sum(aw * a, axis=-1)
        ab = jnp.sum(aw * b, axis=-1)
        bb = jnp.sum(bw * b, axis=-1)
        ay = jnp.sum(a * ty, axis=-1)
        by = jnp.sum(b * ty, axis=-1)
        kd, ks = _nnls2(aa, ab, bb, ay, by)
        cost = kd * kd * aa + ks * ks * bb + 2 * kd * ks * ab - 2 * (kd * ay + ks * by)
        p_gi = jnp.concatenate(
            [
                kd[..., None],
                ks[..., None],
                jnp.broadcast_to(shape_vals, kd.shape + (k,)),
            ],
            axis=-1,
        )
        return p_gi, cost

    def step(carry, shape_vals):
        best_p, best_cost = carry
        p_gi, cost = score(shape_vals)
        better = cost < best_cost
        return (
            jnp.where(better[..., None], p_gi, best_p),
            jnp.where(better, cost, best_cost),
        ), cost

    init = (
        jnp.zeros(target.shape[:-1] + (spec.n_params,), dtype),
        jnp.full(target.shape[:-1], jnp.inf, dtype),
    )
    # lax.scan keeps the compiled graph one-grid-point big (16 unrolled model
    # evaluations were a compile-time hot spot on the remote TPU compiler)
    (best_p, best_cost), costs = jax.lax.scan(step, init, grid)

    if refine and k == 1 and g_count >= 3:
        best_p, best_cost = _parabolic_refine(
            spec, angles, weights, ty, shape_grid, costs, best_p, best_cost,
            n_lin, dtype,
        )

    # keep the start strictly inside the solver's default box
    lo = jnp.asarray(spec.lower, dtype)
    hi = jnp.asarray(spec.upper, dtype)
    return jnp.clip(best_p, lo, hi)


def _grid_is_geometric(g1: np.ndarray) -> bool:
    """Pick the interpolation coordinate where the grid is actually UNIFORM:
    the three-point parabola-vertex formula assumes equal spacing, so a
    linearly spaced positive grid (cook_torrance/ward roughness) must be
    refined in linear coordinates even though log would be legal (ADVICE r4:
    positivity alone mis-picked log there, biasing the vertex). Geometric
    spacing ⇔ diffs of log(g) are uniform; compare the relative spread of
    the spacings in both coordinates and take the more uniform."""
    g1 = np.ravel(np.asarray(g1, np.float64))
    if g1.shape[0] < 3 or not bool((g1 > 0).all()):
        return False
    d_lin = np.diff(g1)
    d_log = np.diff(np.log(g1))
    lin_dev = np.ptp(d_lin) / max(np.abs(d_lin).mean(), 1e-300)
    log_dev = np.ptp(d_log) / max(np.abs(d_log).mean(), 1e-300)
    return bool(log_dev < lin_dev)


def _parabolic_refine(spec, angles, weights, ty, shape_grid, costs,
                      best_p, best_cost, n_lin, dtype):
    """Interpolate the χ²(shape) minimum between grid points.

    The coarse grid's half-spacing is the dominant error of the start (e.g.
    the 16-point exponent grid spans 1..300 geometrically → ±20% exponent
    error, which the bounded-LM tail then polishes slowly along its
    ill-conditioned direction). χ²(shape) after profiling out the linear
    parameters is smooth, so a parabola through the best grid point and its
    two neighbors — in the grid's own coordinate (log for geometric grids,
    linear otherwise) — lands within a few percent. One extra per-texel
    NNLS at the refined shape; the refined start is kept only where its χ²
    actually improves, so this can never be worse than the grid answer.
    """
    g1 = np.ravel(np.asarray(shape_grid, np.float64))
    g_count = g1.shape[0]
    use_log = _grid_is_geometric(g1)
    tg_np = np.log(g1) if use_log else g1

    i = jnp.argmin(costs, axis=0)                     # (...,)
    ic = jnp.clip(i, 1, g_count - 2)
    edge = i != ic                                    # argmin at grid edge

    # Gather-free selection: per-texel row lookups lower to generic gathers
    # that run on the TPU scalar core (measured +4.4 ms/batch at T=131k,
    # doubling the whole fit); one-hot masked reductions over the small G
    # axis are pure VPU work instead.
    iota = jnp.arange(g_count, dtype=jnp.int32)
    oc = (iota[(...,) + (None,) * ic.ndim] == ic[None]).astype(dtype)  # (G, ...)

    def sel(stack):                                   # Σ_g stack[g]·oc[g]
        return jnp.sum(stack * oc, axis=0)

    pad_top = costs[:1]
    pad_bot = costs[-1:]
    c0 = sel(costs)
    cm = sel(jnp.concatenate([pad_top, costs[:-1]], axis=0))   # costs[ic-1]
    cp = sel(jnp.concatenate([costs[1:], pad_bot], axis=0))    # costs[ic+1]

    def selv(vec):                                    # (G,) per-texel via oc
        return sel(vec.reshape((g_count,) + (1,) * ic.ndim))

    tgv = jnp.asarray(tg_np, dtype)
    t0 = selv(tgv)
    tm = selv(jnp.concatenate([tgv[:1], tgv[:-1]]))
    tp = selv(jnp.concatenate([tgv[1:], tgv[-1:]]))

    denom = cm - 2.0 * c0 + cp
    delta = jnp.where(denom > 1e-30, 0.5 * (cm - cp) / denom, 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # possibly non-uniform spacing: step toward the chosen neighbor
    tn = jnp.where(delta >= 0, tp, tm)
    # edge lanes (argmin at the grid boundary) keep their grid value: for
    # them ic != i and t0 is the CLIPPED neighbor, so recompute from i
    oi = (iota[(...,) + (None,) * i.ndim] == i[None]).astype(dtype)
    t_at_i = jnp.sum(tgv.reshape((g_count,) + (1,) * i.ndim) * oi, axis=0)
    t_ref = jnp.where(edge, t_at_i, t0 + jnp.abs(delta) * (tn - t0))
    shape_ref = jnp.exp(t_ref) if use_log else t_ref  # (...,)

    one = jnp.ones_like(shape_ref)
    zero = jnp.zeros_like(shape_ref)
    if n_lin == 1:
        a = spec.fn(jnp.stack([one, shape_ref], axis=-1), angles)
        aw = a * weights
        aa = jnp.sum(aw * a, axis=-1)
        ay = jnp.sum(a * ty, axis=-1)
        kd = jnp.maximum(ay / jnp.maximum(aa, 1e-30), 0.0)
        cost_ref = kd * kd * aa - 2.0 * kd * ay
        p_ref = jnp.stack([kd, shape_ref], axis=-1)
    else:
        a = spec.fn(jnp.stack([one, zero, shape_ref], axis=-1), angles)
        b = spec.fn(jnp.stack([zero, one, shape_ref], axis=-1), angles)
        aw = a * weights
        bw = b * weights
        aa = jnp.sum(aw * a, axis=-1)
        ab = jnp.sum(aw * b, axis=-1)
        bb = jnp.sum(bw * b, axis=-1)
        ay = jnp.sum(a * ty, axis=-1)
        by = jnp.sum(b * ty, axis=-1)
        kd, ks = _nnls2(aa, ab, bb, ay, by)
        cost_ref = (kd * kd * aa + ks * ks * bb + 2 * kd * ks * ab
                    - 2 * (kd * ay + ks * by))
        p_ref = jnp.stack([kd, ks, shape_ref], axis=-1)

    better = cost_ref < best_cost
    return (
        jnp.where(better[..., None], p_ref, best_p),
        jnp.where(better, cost_ref, best_cost),
    )
