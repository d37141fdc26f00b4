"""Variable-projection (VarPro) solver for separable lobe fits.

Every specular lobe in the registry is SEPARABLE: ``I = kd·a + ks·b(σ)``
with a σ-independent diffuse basis ``a`` and one nonlinear shape parameter
σ (Blinn-Phong/Phong exponent, Cook-Torrance/Ward roughness). Golub &
Pereyra's variable projection eliminates the linear pair in closed form
(the same 2-variable NNLS the grid initializer uses) and minimizes the
1-D *profiled* objective

    φ(σ) = min_{kd,ks ≥ 0} Σ w²·(y − kd·a − ks·b(σ))²

by a safeguarded Newton iteration in a scale-free coordinate (log σ for
the exponent). Compared to the 3-parameter LM this removes exactly the
pathology that sets the fused-LM bench schedule (the ill-conditioned
exponent direction that ~2% of lanes polish for dozens of iterations):

- the iteration is 1-D Newton on a smooth profiled function — locally
  quadratic, no cross-parameter conditioning;
- by the envelope theorem φ'(σ) needs only ∂b/∂σ (one ``jax.jvp``), no
  normal equations and no linear solve;
- the iteration count is a FIXED ``iters`` for every lane — a batched
  block costs k, not max-over-lanes(k), which is the fused LM kernel's
  whole cost model (CLAUDE.md / BASELINE.md block economics).

TPU shape: everything is elementwise over (T, V) + row reductions; one
basis evaluation (+ its σ-JVP) per iteration. The reference has no
counterpart — its levmar treats the three parameters jointly
(``brdfdata.cpp:1077-1136``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import MODELS, ShadingAngles
from brdf_tpu.solver.init import linear_grid_init

_TINY = 1e-30


def _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1):
    """Exact 2-variable BOX-constrained least squares from Gram entries:
    ``min ‖x₀A + x₁B − y‖²  s.t.  l ≤ x ≤ u``.

    The minimizer of a 2-D box QP is either the interior stationary point
    or lies on one of the four edges, where the problem is 1-D with a
    closed-form clamped solution — enumerate all five and take the
    cheapest. All elementwise; replaces the NNLS-then-clamp the first
    VarPro version used, which was measured destroying real-scene fits
    whose specular parameter pins at the UPPER bound (bunny MAE 0.133 vs
    the LM engine's 0.090 — clamping after an unconstrained solve leaves
    (kd, σ) optimized for the wrong ks)."""
    def cost(x0, x1):
        return (x0 * x0 * aa + x1 * x1 * bb + 2.0 * x0 * x1 * ab
                - 2.0 * (x0 * ay + x1 * by))

    det = aa * bb - ab * ab
    det_ok = jnp.abs(det) > 1e-30
    det_s = jnp.where(det_ok, det, 1.0)
    xi0 = (bb * ay - ab * by) / det_s
    xi1 = (aa * by - ab * ay) / det_s
    interior_ok = (det_ok & (xi0 >= l0) & (xi0 <= u0)
                   & (xi1 >= l1) & (xi1 <= u1))

    def solve1(num, den, lo, hi):
        return jnp.clip(num / jnp.maximum(den, 1e-30), lo, hi)

    cands = []
    for x0_fixed in (l0, u0):          # edges x0 = const
        x1e = solve1(by - x0_fixed * ab, bb, l1, u1)
        cands.append((jnp.full_like(ay, x0_fixed), x1e))
    for x1_fixed in (l1, u1):          # edges x1 = const
        x0e = solve1(ay - x1_fixed * ab, aa, l0, u0)
        cands.append((x0e, jnp.full_like(ay, x1_fixed)))

    best0, best1 = cands[0]
    best_c = cost(best0, best1)
    for x0c, x1c in cands[1:]:
        c = cost(x0c, x1c)
        take = c < best_c
        best0 = jnp.where(take, x0c, best0)
        best1 = jnp.where(take, x1c, best1)
        best_c = jnp.where(take, c, best_c)
    take_i = interior_ok & (cost(xi0, xi1) < best_c)
    return (jnp.where(take_i, xi0, best0), jnp.where(take_i, xi1, best1))

# separable m=3 lobes: (model, σ transform) — log for the exponent (scale-
# free Newton over decades), identity for the bounded roughness params
_SEPARABLE = {
    "blinn_phong": "log",
    "phong": "log",
    "cook_torrance": "linear",
    "ward": "linear",
}


class VarProResult(NamedTuple):
    p: jnp.ndarray       # (T, 3) kd, ks, σ
    chi2: jnp.ndarray    # (T,) final profiled χ²
    iters: jnp.ndarray   # (T,) accepted Newton steps
    stop: jnp.ndarray    # (T,) int32: 2 = converged (small step), 3 = k done
    g_abs: jnp.ndarray   # (T,) |φ'| at the final point (transformed coords)


@functools.partial(
    jax.jit, static_argnames=("model", "iters", "lower", "upper", "axis_name")
)
def varpro_fit(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,          # (T, V)
    weights: jnp.ndarray | None = None,
    p0: jnp.ndarray | None = None,   # (T, 3) optional start (else grid init)
    iters: int = 8,
    lower: tuple | None = None,
    upper: tuple | None = None,
    axis_name: str | None = None,
) -> VarProResult:
    """Fit T independent separable lobes by profiled 1-D Newton.

    ``lower``/``upper`` are the model box; kd/ks honor [lower, upper] via
    the NNLS nonnegativity + a final clamp, σ is clipped every step.
    ``axis_name`` names a mesh axis holding a sharded view dimension: every
    view reduction (Gram entries, χ², φ', curvature) becomes a psum over
    it, exactly like the LM engines (SURVEY.md §2.3).
    """
    if model not in _SEPARABLE:
        raise ValueError(
            f"varpro_fit supports separable m=3 lobes {sorted(_SEPARABLE)}, "
            f"got {model!r}"
        )
    spec = MODELS[model]
    dtype = target.dtype
    lo = np.asarray(spec.lower if lower is None else lower, np.float64)
    hi = np.asarray(spec.upper if upper is None else upper, np.float64)
    if weights is None:
        weights = jnp.ones_like(target)
    weights = weights.astype(dtype)

    use_log = _SEPARABLE[model] == "log"
    # Exponent floor: as σ → 0 the specular basis degenerates to a constant
    # (c^σ → 1) and ∂b/∂(log σ) ∝ σ → 0, so a lane parked near zero by an
    # early (e.g. pre-IRLS) round can never climb out — the profiled
    # gradient vanishes identically there. 0.25 keeps the whole search
    # domain non-degenerate; exponents below it are physically
    # indistinguishable from diffuse at 16-view sampling anyway.
    sig_floor = max(lo[2], 0.25) if use_log else max(lo[2], 1e-6)
    s_lo = np.log(sig_floor) if use_log else sig_floor
    s_hi = np.log(hi[2]) if use_log else hi[2]

    def rsum(x):
        """View reduction; a psum over ``axis_name`` when views are sharded."""
        s = jnp.sum(x, axis=-1)
        return jax.lax.psum(s, axis_name) if axis_name else s

    if p0 is None:
        # note: the grid init reduces over LOCAL views only — under a
        # view-sharded mesh, supply p0 (the fit pipeline computes it at the
        # jit level where XLA partitions it globally)
        p0 = linear_grid_init(model, angles, target, weights=weights,
                              refine=True)
    sigma0 = jnp.clip(p0[..., 2], jnp.asarray(sig_floor, dtype),
                      jnp.asarray(hi[2], dtype))
    t0 = jnp.log(sigma0) if use_log else sigma0

    w = weights
    # weighted bases/targets: the residual is formed DIRECTLY (not via the
    # Gram identity χ² = yᵀy − … , whose f32 cancellation would floor χ²
    # at ~1e-6 of yᵀy and break both the accept test and the quality gate)
    yw = target * w
    # diffuse basis: σ-independent for every separable lobe (kd·cos_ln term)
    aw = spec.fn(
        jnp.concatenate([jnp.asarray([1.0, 0.0], dtype),
                         jnp.asarray([lo[2] + 0.5 * (hi[2] - lo[2])], dtype)]),
        angles,
    ) * w
    aa = rsum(aw * aw)
    ay = rsum(aw * yw)

    def basis_b(sig):
        """Specular basis b(σ) per texel: unit-ks lobe with per-texel σ."""
        p = jnp.stack(
            [jnp.zeros_like(sig), jnp.ones_like(sig), sig], axis=-1
        )
        return spec.fn(p, angles)

    def eval_at(t_var):
        """Profiled objective + derivative info at transformed σ = t_var."""
        sig = jnp.exp(t_var) if use_log else t_var
        b, db = jax.jvp(basis_b, (sig,), (jnp.ones_like(sig),))
        if use_log:
            db = db * sig[..., None]        # chain rule: d/d(log σ)
        bw = b * w
        dbw = db * w
        ab = rsum(aw * bw)
        bb = rsum(bw * bw)
        by = rsum(bw * yw)
        kd, ks = _bvls2(aa, ab, bb, ay, by,
                        float(lo[0]), float(hi[0]),
                        float(lo[1]), float(hi[1]))
        rw = yw - kd[..., None] * aw - ks[..., None] * bw
        chi2 = rsum(rw * rw)
        # envelope theorem: φ' = −2 Σ (w r)·(w ks·∂b/∂t) (a is t-free)
        g = -2.0 * ks * rsum(rw * dbw)
        # Profiled Gauss-Newton curvature uses the PROJECTED derivative
        # (Kaufman's VarPro Jacobian): the linear pair re-solves as σ moves,
        # so only the component of ∂b/∂t orthogonal to span{a, b} bends the
        # profiled objective. The unprojected ‖∂b‖² overestimates h — steps
        # shrink and convergence degrades to slow-linear (measured: χ²
        # stuck at ~1e-7 after 8 accepted steps without the projection).
        a_db = rsum(aw * dbw)
        b_db = rsum(bw * dbw)
        det = aa * bb - ab * ab
        det_ok = det > 1e-30
        det_s = jnp.where(det_ok, det, 1.0)
        x1 = jnp.where(det_ok, (bb * a_db - ab * b_db) / det_s, 0.0)
        x2 = jnp.where(det_ok, (aa * b_db - ab * a_db) / det_s, 0.0)
        proj_nrm2 = rsum(dbw * dbw) - x1 * a_db - x2 * b_db
        h = 2.0 * ks * ks * jnp.maximum(proj_nrm2, 0.0)
        return chi2, g, h, kd, ks

    chi2_0, g0, h0, kd0, ks0 = eval_at(t0)
    span = jnp.asarray(s_hi - s_lo, dtype)
    s_lo_t = jnp.asarray(s_lo, dtype)
    s_hi_t = jnp.asarray(s_hi, dtype)
    trust0 = jnp.full_like(t0, 0.25) * span

    def body(carry, _):
        t_best, chi2_b, g_b, h_b, kd_b, ks_b, trust, n_acc = carry
        step = jnp.clip(
            -g_b / jnp.maximum(h_b, jnp.asarray(1e-30, dtype)), -trust, trust
        )
        t_new = jnp.clip(t_best + step, s_lo_t, s_hi_t)
        chi2_n, g_n, h_n, kd_n, ks_n = eval_at(t_new)
        ok = (chi2_n < chi2_b) & jnp.isfinite(chi2_n)
        sel = lambda n, b: jnp.where(ok, n, b)
        return (
            sel(t_new, t_best), sel(chi2_n, chi2_b), sel(g_n, g_b),
            sel(h_n, h_b), sel(kd_n, kd_b), sel(ks_n, ks_b),
            jnp.where(ok, jnp.minimum(trust * 2.0, span),
                      trust * 0.25),
            n_acc + ok.astype(jnp.int32),
        ), None

    carry0 = (t0, chi2_0, g0, h0, kd0, ks0, trust0, jnp.zeros_like(g0, jnp.int32))
    (t_f, chi2_f, g_f, _, kd_f, ks_f, trust_f, n_acc), _ = jax.lax.scan(
        body, carry0, None, length=iters
    )

    sigma = jnp.exp(t_f) if use_log else t_f
    kd_f = jnp.clip(kd_f, lo[0], hi[0])
    ks_f = jnp.clip(ks_f, lo[1], hi[1])
    p = jnp.stack([kd_f, ks_f, sigma], axis=-1).astype(dtype)
    converged = trust_f < 1e-6 * span
    stop = jnp.where(converged, jnp.int32(2), jnp.int32(3))
    return VarProResult(
        p=p, chi2=jnp.maximum(chi2_f, 0.0), iters=n_acc, stop=stop,
        g_abs=jnp.abs(g_f),
    )


@functools.partial(
    jax.jit, static_argnames=("iters", "lower", "upper", "axis_name")
)
def varpro_fit_fresnel(
    angles: ShadingAngles,
    target: jnp.ndarray,          # (T, V)
    weights: jnp.ndarray | None = None,
    p0: jnp.ndarray | None = None,   # (T, 4) optional start (else grid init)
    iters: int = 10,
    lower: tuple | None = None,
    upper: tuple | None = None,
    axis_name: str | None = None,
) -> VarProResult:
    """Variable projection for the m=4 ``cook_torrance_fresnel`` lobe.

    The Fresnel lobe is separable with a TWO-dimensional shape space:
    ``I = kd·a + ks·b(rough, f0)`` — so the profiled solve is the same
    construction as :func:`varpro_fit` with 2-D Newton over (rough, f0):
    per iteration, one basis evaluation + two JVPs, a shared-Gram BVLS for
    the linear pair, Kaufman-projected 2×2 Gauss-Newton, and a
    trust-clipped accept-if-better step. Completes the VarPro family over
    every separable registry lobe (1-D: blinn_phong/phong/cook_torrance/
    ward; 2-D: this; the m=9 joint tier is ``varpro_fit_joint``).
    """
    spec = MODELS["cook_torrance_fresnel"]
    dtype = target.dtype
    lo = np.asarray(spec.lower if lower is None else lower, np.float64)
    hi = np.asarray(spec.upper if upper is None else upper, np.float64)
    if weights is None:
        weights = jnp.ones_like(target)
    w = weights.astype(dtype)
    yw = target * w

    lo_s_np = np.asarray([max(lo[2], 1e-3), lo[3]], np.float64)
    hi_s_np = np.asarray([hi[2], hi[3]], np.float64)
    span = float(np.linalg.norm(hi_s_np - lo_s_np))
    lo_s = jnp.asarray(lo_s_np, dtype)
    hi_s = jnp.asarray(hi_s_np, dtype)

    def rsum(x):
        """View reduction; a psum over ``axis_name`` when views are sharded."""
        s = jnp.sum(x, axis=-1)
        return jax.lax.psum(s, axis_name) if axis_name else s

    if p0 is None:
        # local-view init — under a view-sharded mesh supply p0 (the fit
        # pipeline computes it at the jit level)
        p0 = linear_grid_init("cook_torrance_fresnel", angles, target,
                              weights=weights)
    shape0 = jnp.clip(p0[..., 2:4], lo_s, hi_s)          # (T, 2)

    # diffuse basis: kd·cos_ln — shape-independent
    aw = spec.fn(
        jnp.asarray([1.0, 0.0, 0.5, 0.5], dtype), angles
    ) * w
    aa = rsum(aw * aw)
    ay = rsum(aw * yw)

    def basis_b(shape):
        p = jnp.concatenate(
            [jnp.zeros_like(shape[..., :1]), jnp.ones_like(shape[..., :1]),
             shape], axis=-1
        )
        return spec.fn(p, angles)

    def eval_at(shape):
        b = basis_b(shape)
        tangents = []
        for j in range(2):
            e = jnp.zeros_like(shape).at[..., j].set(1.0)
            _, db_j = jax.jvp(basis_b, (shape,), (e,))
            tangents.append(db_j)
        bw = b * w
        ab = rsum(aw * bw)
        bb = rsum(bw * bw)
        by = rsum(bw * yw)
        kd, ks = _bvls2(aa, ab, bb, ay, by,
                        float(lo[0]), float(hi[0]), float(lo[1]), float(hi[1]))
        rw = yw - kd[..., None] * aw - ks[..., None] * bw
        chi2 = rsum(rw * rw)
        det = aa * bb - ab * ab
        det_ok = det > 1e-30
        det_s = jnp.where(det_ok, det, 1.0)

        def project(u):
            ua = rsum(u * aw)
            ub = rsum(u * bw)
            x1 = jnp.where(det_ok, (bb * ua - ab * ub) / det_s, 0.0)
            x2 = jnp.where(det_ok, (aa * ub - ab * ua) / det_s, 0.0)
            return u - x1[..., None] * aw - x2[..., None] * bw

        g, cols = [], []
        for j in range(2):
            u = ks[..., None] * tangents[j] * w
            g.append(-2.0 * rsum(rw * u))
            cols.append(project(u))
        h00 = 2.0 * rsum(cols[0] * cols[0])
        h01 = 2.0 * rsum(cols[0] * cols[1])
        h11 = 2.0 * rsum(cols[1] * cols[1])
        return chi2, g, (h00, h01, h11), kd, ks

    chi2_0, g0, h0, kd0, ks0 = eval_at(shape0)

    def body(carry, _):
        shape, chi2_b, g_b, h_b, kd_b, ks_b, trust, n_acc = carry
        h00, h01, h11 = h_b
        lam = 1e-6 * (h00 + h11) + _TINY
        d = (h00 + lam) * (h11 + lam) - h01 * h01
        ok2 = jnp.abs(d) > _TINY
        d_s = jnp.where(ok2, d, 1.0)
        s0 = -((h11 + lam) * g_b[0] - h01 * g_b[1]) / d_s
        s1 = -((h00 + lam) * g_b[1] - h01 * g_b[0]) / d_s
        step = jnp.stack([s0, s1], -1)
        nrm = jnp.linalg.norm(step, axis=-1, keepdims=True)
        step = jnp.where(
            ok2[..., None],
            step * jnp.minimum(1.0, trust[..., None] / jnp.maximum(nrm, _TINY)),
            0.0,
        )
        shape_n = jnp.clip(shape + step, lo_s, hi_s)
        chi2_n, g_n, h_n, kd_n, ks_n = eval_at(shape_n)
        okn = (chi2_n < chi2_b) & jnp.isfinite(chi2_n)
        sel = lambda n, b: jnp.where(okn, n, b)
        sel2 = lambda n, b: jnp.where(okn[..., None], n, b)
        return (
            sel2(shape_n, shape), sel(chi2_n, chi2_b),
            [sel(g_n[j], g_b[j]) for j in range(2)],
            tuple(sel(h_n[j], h_b[j]) for j in range(3)),
            sel(kd_n, kd_b), sel(ks_n, ks_b),
            jnp.where(okn, jnp.minimum(trust * 2.0, span), trust * 0.25),
            n_acc + okn.astype(jnp.int32),
        ), None

    trust0 = jnp.full(shape0.shape[:-1], 0.25 * span, dtype)
    carry0 = (shape0, chi2_0, g0, h0, kd0, ks0, trust0,
              jnp.zeros(shape0.shape[:-1], jnp.int32))
    (shape_f, chi2_f, g_f, _, kd_f, ks_f, trust_f, n_acc), _ = jax.lax.scan(
        body, carry0, None, length=iters
    )

    p = jnp.concatenate([kd_f[..., None], ks_f[..., None], shape_f], -1)
    converged = trust_f < 1e-6 * span
    g_inf = jnp.maximum(jnp.abs(g_f[0]), jnp.abs(g_f[1]))
    return VarProResult(
        p=p.astype(dtype), chi2=jnp.maximum(chi2_f, 0.0), iters=n_acc,
        stop=jnp.where(converged, jnp.int32(2), jnp.int32(3)),
        g_abs=g_inf,
    )
