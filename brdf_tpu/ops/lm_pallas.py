"""Fused per-texel Levenberg-Marquardt fitting as a Pallas TPU kernel.

The structural replacement for the reference's entire per-pixel solve chain
(``SolveEquation`` → ``dlevmar_bc_dif`` → ``LEVMAR_BC_DER`` inner loop,
``/root/reference/brdfdata.cpp:1077-1136`` + ``levmar/lmbc_core.c:369-1022``),
redesigned for the TPU memory hierarchy:

- **Views-major layout**: arrays are (V, T) with texels on the 128-wide lane
  axis and views on sublanes, so every per-view elementwise op and every
  over-views reduction is dense VPU work.
- **Whole solve in VMEM**: a grid block loads its texels' angles/targets once
  (≈100 KB for V=16, TB=1024), then runs the *entire* LM iteration loop —
  shading model, analytic Jacobian, JᵀJ/Jᵀe reductions, damped m×m solve,
  box projection, Nielsen μ-control, convergence tests — with zero HBM
  traffic per iteration. (The lax.while_loop formulation in ``solver/lm.py``
  re-streams loop state through HBM every iteration.)
- **Analytic derivatives**: the lobe evaluations and their hand-derived
  parameter partials are shared with the shading kernel
  (``ops/shading_pallas.py::SHADING_KERNELS`` — one derivation, two kernels;
  the angle partials those evals also produce are dead code here and the
  compiler eliminates them). One iteration costs ~2 model evaluations —
  levmar's finite-difference path cost m+1 (``misc_core.c:137-172``).
- **Any registry lobe, m ∈ {1..5}**: the damped normal equations solve by
  closed form per size — scalar, 2×2/3×3 Cramer, and an unrolled Cholesky
  for m ∈ {4, 5} — so the fused path covers every model in
  ``models/brdf.py``: the diffuse-only family, the 4-parameter
  Cook-Torrance+Fresnel, and the 5-parameter anisotropic lobes.
- **Per-lane control flow**: each texel's accept/reject/damping state is a
  lane; the block iterates until all its lanes converge (`while_loop` with a
  scalar any-active condition). No ragged control flow, no wasted jacfwd.

Algorithmic notes: this kernel uses the one-solve-per-iteration variant of
the box-projected LM in ``solver/lm.py`` (on reject, μ·ν grows and the next
iteration re-solves; recomputing the analytic JᵀJ in VMEM is cheaper than
carrying levmar's inner retry loop). Active-bound variables are frozen out of
the normal equations exactly as there. Stop codes match
:class:`brdf_tpu.solver.lm.StopReason`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brdf_tpu.models.brdf import ShadingAngles
from brdf_tpu.ops.shading_pallas import SHADING_KERNELS, ShadingKernelSpec
from brdf_tpu.solver.lm import LMOptions, StopReason

_EPS = 1e-12

# Every registry lobe fits the fused path (m ≤ MAX_PARAMS = 5, covering the
# 5-param anisotropic lobes). Kept as the membership check
# parallel/fit.py's engine="auto" keys off.
PALLAS_MODELS: dict[str, ShadingKernelSpec] = dict(SHADING_KERNELS)

_TINY = 1e-30
MAX_PARAMS = 5          # fused whole-solve kernel tier (VMEM state rows)
MAX_SOLVE_PARAMS = 9    # unrolled-Cholesky damped solve (joint m=9 included)


def _row_sum(x):
    """(V, TB) → (1, TB) reduction over the view (sublane) axis."""
    return jnp.sum(x, axis=0, keepdims=True)


def _solve_damped(af: dict, gf: list, m: int):
    """Closed-form symmetric m×m solve ``dp = −Af⁻¹ gf`` per lane.

    ``af[(j,k)]`` (j ≤ k) is the damped/frozen normal matrix, all (1, TB).
    Returns (dp list, solver_ok mask). The damped system is SPD when healthy
    (the same reasoning that makes levmar's Bunch-Kaufman pivoting moot on
    this path — see docs/COMPONENTS.md N9), so Cholesky needs no pivoting.
    """
    if m == 1:
        det = af[(0, 0)]
        ok = jnp.abs(det) > _TINY
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        return [-gf[0] * inv], ok
    if m == 2:
        det = af[(0, 0)] * af[(1, 1)] - af[(0, 1)] * af[(0, 1)]
        ok = jnp.abs(det) > _TINY
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        dp0 = -(af[(1, 1)] * gf[0] - af[(0, 1)] * gf[1]) * inv
        dp1 = -(af[(0, 0)] * gf[1] - af[(0, 1)] * gf[0]) * inv
        return [dp0, dp1], ok
    if m == 3:
        c00 = af[(1, 1)] * af[(2, 2)] - af[(1, 2)] * af[(1, 2)]
        c01 = af[(0, 2)] * af[(1, 2)] - af[(0, 1)] * af[(2, 2)]
        c02 = af[(0, 1)] * af[(1, 2)] - af[(0, 2)] * af[(1, 1)]
        c11 = af[(0, 0)] * af[(2, 2)] - af[(0, 2)] * af[(0, 2)]
        c12 = af[(0, 1)] * af[(0, 2)] - af[(0, 0)] * af[(1, 2)]
        c22 = af[(0, 0)] * af[(1, 1)] - af[(0, 1)] * af[(0, 1)]
        det = af[(0, 0)] * c00 + af[(0, 1)] * c01 + af[(0, 2)] * c02
        ok = jnp.abs(det) > _TINY
        inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
        dp = [
            -(c00 * gf[0] + c01 * gf[1] + c02 * gf[2]) * inv,
            -(c01 * gf[0] + c11 * gf[1] + c12 * gf[2]) * inv,
            -(c02 * gf[0] + c12 * gf[1] + c22 * gf[2]) * inv,
        ]
        return dp, ok
    if m <= MAX_SOLVE_PARAMS:
        # Closed-form Cholesky A = L Lᵀ, unrolled at trace time for any m
        # (the 4-param fresnel and 5-param aniso lobes take this tier, and
        # the m=9 joint normal-map system — 45 upper-tri entries — unrolls
        # the same way); non-PD pivots flag the lane singular.
        l = {}
        ok = None
        for j in range(m):
            v = af[(j, j)] - sum(l[(j, k)] * l[(j, k)] for k in range(j))
            ok = (v > _TINY) if ok is None else ok & (v > _TINY)
            l[(j, j)] = jnp.sqrt(jnp.maximum(v, _TINY))
            for i in range(j + 1, m):
                l[(i, j)] = (
                    af[(j, i)] - sum(l[(i, k)] * l[(j, k)] for k in range(j))
                ) / l[(j, j)]
        y = []
        for i in range(m):                      # forward: L y = −g
            y.append(
                (-gf[i] - sum(l[(i, k)] * y[k] for k in range(i))) / l[(i, i)]
            )
        dp: list = [None] * m
        for i in reversed(range(m)):            # backward: Lᵀ dp = y
            dp[i] = (
                y[i] - sum(l[(k, i)] * dp[k] for k in range(i + 1, m))
            ) / l[(i, i)]
        okf = ok.astype(gf[0].dtype)
        return [d * okf for d in dp], ok
    raise ValueError(f"unsupported parameter count m={m}")


def _lm_kernel(
    angles_ref,   # (A, V, TB)
    y_ref,        # (V, TB)
    w_ref,        # (V, TB)
    p0_ref,       # (8, TB): rows 0..m-1 = params; rows 5/6/7 = warm-resume
                  #          (μ, ν, stop) — all-zero rows mean a cold start
    out_ref,      # (16, TB): rows 0..4 params, 5 chi2, 6 iters, 7 stop,
                  #           8 g_inf, 9 mu, 10 nu
    *,
    spec: ShadingKernelSpec,
    opts: LMOptions,
    lower: tuple,
    upper: tuple,
):
    m = spec.n_params
    n_angles = len(spec.angle_names)
    angles = tuple(angles_ref[a] for a in range(n_angles))
    y = y_ref[...]
    w = w_ref[...]
    w2 = w * w

    lb = [jnp.float32(b) for b in lower]
    ub = [jnp.float32(b) for b in upper]

    def clipm(p):
        return [jnp.clip(p[j], lb[j], ub[j]) for j in range(m)]

    def model_eval(p):
        # d_angles is unused here; the compiler dead-code-eliminates it
        i_val, d_params, _ = spec.eval(angles, tuple(p))
        return i_val, list(d_params)

    p = clipm([p0_ref[j : j + 1, :] for j in range(m)])

    def chi2_of(p):
        i_val, _ = model_eval(p)
        r = (i_val - y) * w
        return _row_sum(r * r)

    chi2 = chi2_of(p)
    zero = jnp.zeros_like(chi2)

    # Warm-resume state rides the spare p0 rows (levmar_bc's warm_state
    # semantics, solver/lm.py:224-244): μ ≤ 0/non-finite → Kanzow init at
    # iteration 0; ν < 2/non-finite → 2; stop ≠ 0 is final and
    # short-circuits the lane. Zero-filled rows == cold start.
    mu_w = p0_ref[5:6, :]
    mu_w = jnp.where(jnp.isfinite(mu_w) & (mu_w > 0), mu_w, 0.0)
    nu_w = p0_ref[6:7, :]
    nu_w = jnp.where(jnp.isfinite(nu_w) & (nu_w >= 2.0), nu_w, 2.0)
    stop_w = p0_ref[7:8, :]

    # Carry is ONE packed (16, TB) array: a while_loop carry of many (1, TB)
    # values mixes splat-constant and reduction layouts, which Mosaic cannot
    # reconcile ("Not implemented: Sublane broadcast"); a single packed buffer
    # keeps one layout. Rows: 0..MAX_PARAMS-1 params, then per-lane states.
    R_CHI2, R_MU, R_NU, R_IT, R_STOP, R_GINF = 5, 6, 7, 8, 9, 10

    def pack(rows: dict):
        parts = [rows.get(i, zero) for i in range(16)]
        return jnp.concatenate(parts, axis=0)

    stop0 = jnp.where(
        jnp.isfinite(chi2), zero, zero + float(StopReason.INVALID_VALUES)
    )
    state = pack({
        **{j: p[j] for j in range(m)},
        R_CHI2: chi2,
        R_MU: mu_w,
        R_NU: nu_w,
        R_STOP: jnp.where(stop_w != 0.0, stop_w, stop0),
        R_GINF: zero + jnp.float32(3.4e38),
    })

    eps1 = jnp.float32(opts.eps1)
    eps2_sq = jnp.float32(opts.eps2) ** 2
    eps3 = jnp.float32(opts.eps3)
    mu_max = jnp.float32(opts.mu_max)
    tau = jnp.float32(opts.tau)

    def row(s, i):
        return s[i : i + 1, :]

    def active_of(s):
        return (row(s, R_STOP) == 0.0) & (row(s, R_IT) < float(opts.itmax))

    def cond(s):
        return jnp.any(active_of(s))

    def body(s):
        p = [row(s, j) for j in range(m)]
        i_val, d = model_eval(p)
        r = (i_val - y) * w

        # normal equations (weights fold in once via w²)
        a = {}
        for j in range(m):
            for k in range(j, m):
                a[(j, k)] = _row_sum(d[j] * d[k] * w2)
        g = [_row_sum(d[j] * r * w) for j in range(m)]

        # projected-gradient convergence measure
        pg = [p[j] - jnp.clip(p[j] - g[j], lb[j], ub[j]) for j in range(m)]
        g_inf = functools.reduce(jnp.maximum, [jnp.abs(x) for x in pg])
        grad_conv = g_inf <= eps1

        # Kanzow μ init only when no (warm) μ was carried in (μ ≤ 0).
        # Marquardt damping scales per-direction (μ·diag), so its μ is
        # dimensionless and initializes to τ directly.
        marquardt = opts.damping == "marquardt"
        max_diag = functools.reduce(
            jnp.maximum, [a[(j, j)] for j in range(m)]
        )
        mu = jnp.where(
            (row(s, R_IT) == 0.0) & (row(s, R_MU) <= 0.0),
            tau if marquardt else tau * max_diag,
            row(s, R_MU),
        )

        # active-set freeze of bound-stuck coordinates
        frozen = [
            ((p[j] <= lb[j]) & (g[j] > 0)) | ((p[j] >= ub[j]) & (g[j] < 0))
            for j in range(m)
        ]
        free = [jnp.where(frozen[j], 0.0, 1.0) for j in range(m)]
        af = {}
        for j in range(m):
            if marquardt:
                # μ·(a_jj + ε·maxdiag): the absolute floor keeps the damped
                # system SPD for zero-information columns (e.g. the exponent
                # of a ks=0 lane, whose Jacobian column is identically 0)
                damp = mu * (a[(j, j)] + 1e-8 * max_diag + _TINY)
            else:
                damp = mu
            af[(j, j)] = jnp.where(frozen[j], 1.0, a[(j, j)] + damp)
        for j in range(m):
            for k in range(j + 1, m):
                af[(j, k)] = a[(j, k)] * free[j] * free[k]
        gf = [g[j] * free[j] for j in range(m)]

        dp, solver_ok = _solve_damped(af, gf, m)

        pn = [jnp.clip(p[j] + dp[j], lb[j], ub[j]) for j in range(m)]
        dpa = [pn[j] - p[j] for j in range(m)]
        dp_nrm2 = sum(x * x for x in dpa)
        p_nrm2 = sum(x * x for x in p)
        small_dp = dp_nrm2 <= eps2_sq * p_nrm2

        chi2_new = chi2_of(pn)
        finite = jnp.isfinite(chi2_new)
        df = row(s, R_CHI2) - chi2_new

        # predicted reduction −(2 gᵀδ + δᵀ JᵀJ δ) with the *unfrozen* system
        def a_full(j, k):
            return a[(j, k)] if j <= k else a[(k, j)]

        q = [
            sum(a_full(j, k) * dpa[k] for k in range(m)) for j in range(m)
        ]
        g_dot = sum(g[j] * dpa[j] for j in range(m))
        q_dot = sum(dpa[j] * q[j] for j in range(m))
        dl = -(2.0 * g_dot + q_dot)

        accept = solver_ok & finite & (df > 0)
        rho = jnp.where(dl > 0, df / jnp.maximum(dl, _TINY), 1.0)
        tmp = 2.0 * rho - 1.0
        nu = row(s, R_NU)
        mu_next = jnp.where(
            accept,
            mu * jnp.maximum(1.0 / 3.0, 1.0 - tmp * tmp * tmp),
            mu * nu,
        )
        nu_next = jnp.where(accept, 2.0, nu * 2.0)

        # stop codes (priority: convergence > failure)
        stop = jnp.zeros_like(zero)
        stop = jnp.where(mu_next > mu_max, float(StopReason.NO_REDUCTION), stop)
        stop = jnp.where(
            (~solver_ok) & (mu > mu_max / 2), float(StopReason.SINGULAR), stop
        )
        stop = jnp.where(small_dp & solver_ok, float(StopReason.SMALL_DP), stop)
        chi2_sel = jnp.where(accept, chi2_new, row(s, R_CHI2))
        stop = jnp.where(chi2_sel <= eps3, float(StopReason.SMALL_CHI2), stop)
        stop = jnp.where(grad_conv, float(StopReason.SMALL_GRADIENT), stop)

        act = active_of(s)
        keep = lambda new, old: jnp.where(act, new, old)
        return pack({
            **{j: keep(jnp.where(accept, pn[j], p[j]), p[j]) for j in range(m)},
            R_CHI2: keep(chi2_sel, row(s, R_CHI2)),
            R_MU: keep(mu_next, row(s, R_MU)),
            R_NU: keep(nu_next, nu),
            R_IT: keep(row(s, R_IT) + 1.0, row(s, R_IT)),
            R_STOP: keep(stop, row(s, R_STOP)),
            R_GINF: keep(g_inf, row(s, R_GINF)),
        })

    final = jax.lax.while_loop(cond, body, state)

    stop_out = jnp.where(
        row(final, R_STOP) == 0.0,
        float(StopReason.MAX_ITERATIONS),
        row(final, R_STOP),
    )
    zero_row = jnp.zeros_like(zero)
    for j in range(MAX_PARAMS):
        out_ref[j : j + 1, :] = row(final, j) if j < m else zero_row
    out_ref[5:6, :] = row(final, R_CHI2)
    out_ref[6:7, :] = row(final, R_IT)
    out_ref[7:8, :] = stop_out
    out_ref[8:9, :] = row(final, R_GINF)
    out_ref[9:10, :] = row(final, R_MU)
    out_ref[10:11, :] = row(final, R_NU)
    for j in range(11, 16):
        out_ref[j : j + 1, :] = zero_row


# ---------------------------------------------------------------------------
# Chunked-view engine: Pallas normal-equation accumulation + XLA control loop
# ---------------------------------------------------------------------------
#
# The fully-fused kernel above keeps the whole view axis in VMEM, which bounds
# the rig size (SURVEY.md §5's long-context row asks for blockwise view
# accumulation instead). This engine splits the solve:
#
# - a Pallas kernel accumulates the per-texel normal equations
#   (χ², upper-tri JᵀJ, Jᵀe) over (texel-block, view-chunk) grid steps —
#   each chunk streams through VMEM and accumulates into the output block,
#   exactly how blockwise attention bounds KV memory;
# - the LM control loop (freeze, damping, closed-form solve, accept,
#   Nielsen μ) runs at the XLA level on (T,) lanes, re-invoking the kernel
#   once per iteration (plus one χ²-only call for the trial point).
#
# Because the per-texel normal equations leave the kernel as arrays, a view-
# sharded mesh just psums them (``axis_name``) — the fused kernel's
# "view axis must be unsharded" restriction does not apply here.


def _ne_rows(m: int) -> int:
    """Rows of the NE accumulator: 1 (χ²) + m(m+1)/2 (JᵀJ) + m (Jᵀe)."""
    return 1 + m * (m + 1) // 2 + m


def _ne_kernel(angles_ref, y_ref, *rest, spec, mode, with_weights=True):
    """One (texel-block, view-chunk) step: evaluate the lobe + partials on the
    chunk and accumulate into the block's output rows (zeroed on the first
    chunk). ``mode``:

    - ``"chi2"`` — χ² only (the trial-point evaluation; all partial
      computations are dead-code-eliminated),
    - ``"grad"`` — χ² + Jᵀe (one fused loss+gradient pass: the fwd+bwd of
      the data-fit loss in a single read of the angle data),
    - ``"full"`` — χ² + upper-tri JᵀJ + Jᵀe (the LM normal equations).
    """
    if with_weights:
        w_ref, p_ref, out_ref = rest
    else:
        # unweighted variant (``weights=None`` fast path): no w input at
        # all — one fewer (V, T) HBM read per pass
        p_ref, out_ref = rest
    m = spec.n_params
    angles = tuple(angles_ref[a] for a in range(len(spec.angle_names)))
    p = tuple(p_ref[j : j + 1, :] for j in range(m))
    y = y_ref[...]
    i_val, d, _ = spec.eval(angles, p)
    if with_weights:
        w = w_ref[...]
        r = (i_val - y) * w
        rw = r * w
        w2 = w * w
    else:
        r = i_val - y
        rw = r
        w2 = None

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    acc = [_row_sum(r * r)]
    if mode == "full":
        for j in range(m):
            for k in range(j, m):
                dd = d[j] * d[k]
                acc.append(_row_sum(dd * w2 if with_weights else dd))
    if mode in ("full", "grad"):
        for j in range(m):
            acc.append(_row_sum(d[j] * rw))
    rows = len(acc)
    out_ref[0:rows, :] = out_ref[0:rows, :] + jnp.concatenate(acc, axis=0)


def _ne_call(spec, ang_stack, y, w, p_rows, block_t, view_block,
             mode, interpret):
    """``w=None`` selects the unweighted kernel variant (one fewer (V, T)
    HBM read per pass)."""
    a, vp, tp = ang_stack.shape
    m = spec.n_params
    with_weights = w is not None
    rows = {"chi2": 1, "grad": 1 + m, "full": _ne_rows(m)}[mode]
    rows_p = ((rows + 7) // 8) * 8
    vt_spec = pl.BlockSpec((view_block, block_t), lambda i, j: (j, i),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((a, view_block, block_t), lambda i, j: (0, j, i),
                     memory_space=pltpu.VMEM),
        vt_spec,
    ]
    args = [ang_stack, y]
    if with_weights:
        in_specs.append(vt_spec)
        args.append(w)
    in_specs.append(
        pl.BlockSpec((8, block_t), lambda i, j: (0, i), memory_space=pltpu.VMEM)
    )
    args.append(p_rows)
    out = pl.pallas_call(
        functools.partial(_ne_kernel, spec=spec, mode=mode,
                          with_weights=with_weights),
        grid=(tp // block_t, vp // view_block),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows_p, block_t), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, tp), jnp.float32),
        interpret=interpret,
    )(*args)
    return out


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "opts", "lower", "upper", "block_t", "view_block",
        "axis_name", "overlap_slices", "interpret",
    ),
)
def lm_fit_pallas_chunked(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,     # (T, V)
    p0: jnp.ndarray,         # (T, m)
    weights: jnp.ndarray | None = None,
    opts: LMOptions = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=30),
    lower: tuple = (0.0, 0.0, 0.0),
    upper: tuple = (100.0, 100.0, 100.0),
    block_t: int = 1024,
    view_block: int = 16,
    axis_name: str | None = None,
    overlap_slices: int = 1,
    interpret: bool = False,
    warm: tuple | None = None,
) -> PallasFitResult:
    """Chunked-view LM fit: identical math to :func:`lm_fit_pallas` (same
    stop codes, same one-solve-per-iteration damping variant) but with the
    view axis streamed through VMEM in ``view_block`` chunks, so V is
    unbounded; pass ``axis_name`` when the view axis is additionally sharded
    over a mesh (the per-shard normal equations psum before the solve).

    **Reduction overlap** (SURVEY.md §7 hard part): with a sharded view axis,
    ``overlap_slices > 1`` splits the texel axis into independent
    (kernel → psum) chains, so slice k's all-reduce can ride ICI while slice
    k+1's Jacobian accumulation still computes — XLA's TPU latency-hiding
    scheduler turns the per-slice all-reduces into async start/done pairs
    interleaved with the pallas calls (set the
    ``--xla_tpu_enable_async_collective_fusion`` family of flags; see
    ``benchmarks/scaling.py``). Semantically identical for any slice count.

    **Measured default = 1 (off)**: the r3 on-chip A/B
    (``SCALING_r3.json::overlap_onchip_timing``) put the slicing cost at
    1.33× per iteration on one chip (4× the pallas_call launches, shorter
    grids to pipeline) while the payload arithmetic in docs/SCALING.md bounds
    the hideable all-reduce at V=16 to ~6% of the iteration — so slicing
    only pays when the all-reduce is demonstrably dominant (very large V
    sharded over many chips with the latency-hiding flags on). Opt in
    explicitly after measuring on your mesh.
    """
    spec = PALLAS_MODELS[model]
    m = spec.n_params
    if len(lower) != m or len(upper) != m:
        raise ValueError(f"{model} has {m} params; got bounds {lower}/{upper}")
    t, v = target.shape
    if weights is None:
        weights = jnp.ones_like(target)

    pad_t = (-t) % block_t
    tp = t + pad_t
    view_block = min(view_block, v)
    pad_v = (-v) % view_block
    vp = v + pad_v

    def prep(x):  # (T, V) → (Vp, Tp); padded views carry zero weight
        x = x.astype(jnp.float32).T
        return jnp.pad(x, ((0, pad_v), (0, pad_t)))

    ang_stack = jnp.stack(
        [prep(getattr(angles, name)) for name in spec.angle_names]
    )
    y = prep(target)
    w = prep(weights)
    p0_rows = jnp.pad(p0.astype(jnp.float32).T, ((0, 8 - m), (0, pad_t)))

    if axis_name is not None:
        reduce_sum = functools.partial(jax.lax.psum, axis_name=axis_name)
    else:
        reduce_sum = lambda x: x

    lb = [jnp.float32(b) for b in lower]
    ub = [jnp.float32(b) for b in upper]

    def clip_rows(pr):
        rows = [jnp.clip(pr[j], lb[j], ub[j]) for j in range(m)]
        return jnp.concatenate(
            [jnp.stack(rows), jnp.zeros((8 - m, tp), jnp.float32)], axis=0
        )

    n_blocks = tp // block_t
    do_overlap = (
        axis_name is not None and overlap_slices > 1 and n_blocks >= overlap_slices
    )

    def _accumulate(pr, mode):
        """Kernel + psum, optionally as independent per-texel-slice chains so
        the all-reduces overlap the following slices' kernel compute."""
        if not do_overlap:
            return reduce_sum(
                _ne_call(spec, ang_stack, y, w, pr, block_t, view_block,
                         mode, interpret)
            )
        per = ((n_blocks + overlap_slices - 1) // overlap_slices) * block_t
        outs = []
        for start in range(0, tp, per):
            sl = slice(start, min(start + per, tp))
            outs.append(reduce_sum(
                _ne_call(spec, ang_stack[:, :, sl], y[:, sl], w[:, sl],
                         pr[:, sl], block_t, view_block, mode,
                         interpret)
            ))
        return jnp.concatenate(outs, axis=1)

    def ne(pr):
        out = _accumulate(pr, "full")
        af = {}
        idx = 1
        for j in range(m):
            for k in range(j, m):
                af[(j, k)] = out[idx]
                idx += 1
        g = [out[idx + j] for j in range(m)]
        return out[0], af, g

    def chi2_of(pr):
        return _accumulate(pr, "chi2")[0]

    return _chunked_lm_loop(
        m, 8, t, tp, pad_t, lb, ub, opts, ne, chi2_of,
        clip_rows(p0_rows), warm,
    )


class _S(NamedTuple):
    """Chunked-engine control-loop state (all rows over padded texels Tp)."""

    p: jnp.ndarray       # (p_pad, Tp)
    chi2: jnp.ndarray    # (Tp,)
    mu: jnp.ndarray
    nu: jnp.ndarray
    it: jnp.ndarray
    stop: jnp.ndarray
    ginf: jnp.ndarray


def _chunked_lm_loop(
    m, p_pad, t, tp, pad_t, lb, ub, opts, ne, chi2_of, p_init, warm
) -> PallasFitResult:
    """The XLA-level LM control loop shared by every chunked engine: freeze,
    damping, closed-form solve, box projection, accept/reject, Nielsen μ —
    generic over the parameter count (``p_pad`` rows hold the m parameter
    lanes; 8 for the lobe engines, 16 for the m=9 joint engine). ``ne``/
    ``chi2_of`` evaluate the (psum'd) normal equations / trial χ² for a
    (p_pad, Tp) parameter-row matrix."""
    eps1 = jnp.float32(opts.eps1)
    eps2_sq = jnp.float32(opts.eps2) ** 2
    eps3 = jnp.float32(opts.eps3)
    mu_max = jnp.float32(opts.mu_max)
    tau = jnp.float32(opts.tau)

    chi2_0 = chi2_of(p_init)
    zero = jnp.zeros_like(chi2_0)

    # warm (μ, ν, stop) resume state (levmar_bc warm_state semantics);
    # cold start == zeros/2/zeros
    if warm is None:
        mu_w, nu_w, stop_w = zero, zero + 2.0, zero
    else:
        mu_w = jnp.pad(jnp.asarray(warm[0], jnp.float32), (0, pad_t))
        mu_w = jnp.where(jnp.isfinite(mu_w) & (mu_w > 0), mu_w, 0.0)
        nu_w = jnp.pad(jnp.asarray(warm[1], jnp.float32), (0, pad_t))
        nu_w = jnp.where(jnp.isfinite(nu_w) & (nu_w >= 2.0), nu_w, 2.0)
        stop_w = jnp.pad(jnp.asarray(warm[2], jnp.float32), (0, pad_t))

    stop0 = jnp.where(
        jnp.isfinite(chi2_0), zero, zero + float(StopReason.INVALID_VALUES)
    )
    state = _S(
        p=p_init, chi2=chi2_0, mu=mu_w, nu=nu_w, it=zero,
        stop=jnp.where(stop_w != 0.0, stop_w, stop0),
        ginf=zero + jnp.float32(3.4e38),
    )

    def pack(rows):
        return jnp.concatenate(
            [jnp.stack(rows), jnp.zeros((p_pad - m, tp), jnp.float32)], axis=0
        )

    def active_of(s):
        return (s.stop == 0.0) & (s.it < float(opts.itmax))

    def cond(s):
        return jnp.any(active_of(s))

    def body(s):
        p = [s.p[j] for j in range(m)]
        _, a, g = ne(s.p)

        pg = [p[j] - jnp.clip(p[j] - g[j], lb[j], ub[j]) for j in range(m)]
        g_inf = functools.reduce(jnp.maximum, [jnp.abs(x) for x in pg])
        grad_conv = g_inf <= eps1

        # Kanzow μ init only when no (warm) μ was carried in (μ ≤ 0)
        mu = jnp.where(
            (s.it == 0.0) & (s.mu <= 0.0),
            tau * functools.reduce(jnp.maximum, [a[(j, j)] for j in range(m)]),
            s.mu,
        )

        frozen = [
            ((p[j] <= lb[j]) & (g[j] > 0)) | ((p[j] >= ub[j]) & (g[j] < 0))
            for j in range(m)
        ]
        free = [jnp.where(frozen[j], 0.0, 1.0) for j in range(m)]
        af = {}
        for j in range(m):
            af[(j, j)] = jnp.where(frozen[j], 1.0, a[(j, j)] + mu)
        for j in range(m):
            for k in range(j + 1, m):
                af[(j, k)] = a[(j, k)] * free[j] * free[k]
        gf = [g[j] * free[j] for j in range(m)]

        dp, solver_ok = _solve_damped(af, gf, m)

        pn = [jnp.clip(p[j] + dp[j], lb[j], ub[j]) for j in range(m)]
        dpa = [pn[j] - p[j] for j in range(m)]
        dp_nrm2 = sum(x * x for x in dpa)
        p_nrm2 = sum(x * x for x in p)
        small_dp = dp_nrm2 <= eps2_sq * p_nrm2

        chi2_new = chi2_of(pack(pn))
        finite = jnp.isfinite(chi2_new)
        df = s.chi2 - chi2_new

        def a_full(j, k):
            return a[(j, k)] if j <= k else a[(k, j)]

        q = [sum(a_full(j, k) * dpa[k] for k in range(m)) for j in range(m)]
        g_dot = sum(g[j] * dpa[j] for j in range(m))
        q_dot = sum(dpa[j] * q[j] for j in range(m))
        dl = -(2.0 * g_dot + q_dot)

        accept = solver_ok & finite & (df > 0)
        rho = jnp.where(dl > 0, df / jnp.maximum(dl, _TINY), 1.0)
        tmp = 2.0 * rho - 1.0
        mu_next = jnp.where(
            accept,
            mu * jnp.maximum(1.0 / 3.0, 1.0 - tmp * tmp * tmp),
            mu * s.nu,
        )
        nu_next = jnp.where(accept, 2.0, s.nu * 2.0)

        stop = jnp.zeros_like(zero)
        stop = jnp.where(mu_next > mu_max, float(StopReason.NO_REDUCTION), stop)
        stop = jnp.where(
            (~solver_ok) & (mu > mu_max / 2), float(StopReason.SINGULAR), stop
        )
        stop = jnp.where(small_dp & solver_ok, float(StopReason.SMALL_DP), stop)
        chi2_sel = jnp.where(accept, chi2_new, s.chi2)
        stop = jnp.where(chi2_sel <= eps3, float(StopReason.SMALL_CHI2), stop)
        stop = jnp.where(grad_conv, float(StopReason.SMALL_GRADIENT), stop)

        act = active_of(s)
        keep = lambda new, old: jnp.where(act, new, old)
        p_next = pack(
            [keep(jnp.where(accept, pn[j], p[j]), p[j]) for j in range(m)]
        )
        return _S(
            p=p_next,
            chi2=keep(chi2_sel, s.chi2),
            mu=keep(mu_next, s.mu),
            nu=keep(nu_next, s.nu),
            it=keep(s.it + 1.0, s.it),
            stop=keep(stop, s.stop),
            ginf=keep(g_inf, s.ginf),
        )

    final = jax.lax.while_loop(cond, body, state)
    stop_out = jnp.where(
        final.stop == 0.0, float(StopReason.MAX_ITERATIONS), final.stop
    )
    sl = slice(0, t)
    return PallasFitResult(
        p=final.p[0:m, sl].T,
        chi2=final.chi2[sl],
        iters=final.it[sl],
        stop=stop_out[sl].astype(jnp.int32),
        g_inf=final.ginf[sl],
        mu=final.mu[sl],
        nu=final.nu[sl],
    )


class PallasFitResult(NamedTuple):
    p: jnp.ndarray       # (T, m)
    chi2: jnp.ndarray    # (T,)
    iters: jnp.ndarray   # (T,) float32
    stop: jnp.ndarray    # (T,) int32
    g_inf: jnp.ndarray   # (T,)
    mu: jnp.ndarray      # (T,) final damping (resume state)
    nu: jnp.ndarray      # (T,) final damping growth factor (resume state)


@functools.partial(
    jax.jit,
    static_argnames=("model", "opts", "lower", "upper", "block_t", "interpret"),
)
def lm_fit_pallas(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,     # (T, V)
    p0: jnp.ndarray,         # (T, m)
    weights: jnp.ndarray | None = None,
    opts: LMOptions = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=30),
    lower: tuple = (0.0, 0.0, 0.0),
    upper: tuple = (100.0, 100.0, 100.0),
    block_t: int = 1024,
    interpret: bool = False,
    warm: tuple | None = None,
) -> PallasFitResult:
    """Fit T independent m-parameter lobes, one VMEM-resident block at a time.

    Public layout is texel-major (T, V) to match the rest of the framework;
    the wrapper transposes to the kernel's views-major layout and pads T to
    the block size (padded lanes get zero weights and converge immediately).
    ``lower``/``upper`` must have the model's parameter count. ``warm`` is an
    optional ``(μ, ν, stop)`` triple of (T,) arrays resuming damping state
    (levmar_bc ``warm_state`` semantics: μ ≤ 0 lanes take the Kanzow init,
    stop ≠ 0 lanes short-circuit).
    """
    spec = PALLAS_MODELS[model]
    m = spec.n_params
    if len(lower) != m or len(upper) != m:
        raise ValueError(f"{model} has {m} params; got bounds {lower}/{upper}")
    t, v = target.shape
    if weights is None:
        weights = jnp.ones_like(target)

    pad = (-t) % block_t
    tp = t + pad

    def prep(x):  # (T, V) → (V, Tp)
        x = x.T
        return jnp.pad(x, ((0, 0), (0, pad)))

    ang_stack = jnp.stack(
        [prep(getattr(angles, name)) for name in spec.angle_names]
    )  # (A, V, Tp)
    y = prep(target)
    w = prep(weights)
    # p0 rows 0..4 = params; rows 5/6/7 carry the warm (μ, ν, stop) resume
    # state (zeros == cold start — see _lm_kernel)
    p_rows = jnp.pad(p0.astype(jnp.float32).T, ((0, 5 - m), (0, pad)))
    if warm is None:
        warm_rows = jnp.zeros((3, tp), jnp.float32)
    else:
        warm_rows = jnp.stack(
            [jnp.pad(jnp.asarray(x, jnp.float32), (0, pad)) for x in warm]
        )
    p0_pad = jnp.concatenate([p_rows, warm_rows], axis=0)   # (8, Tp)

    a = len(spec.angle_names)
    grid = (tp // block_t,)
    kernel = functools.partial(
        _lm_kernel, spec=spec, opts=opts, lower=tuple(lower), upper=tuple(upper)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, y, w, p0_pad)

    out = out[:, :t]
    return PallasFitResult(
        p=out[0:m].T,
        chi2=out[5],
        iters=out[6],
        stop=out[7].astype(jnp.int32),
        g_inf=out[8],
        mu=out[9],
        nu=out[10],
    )


@functools.partial(
    jax.jit,
    static_argnames=("model", "block_t", "view_block", "interpret"),
)
def shading_value_and_grad_pallas(
    model: str,
    params: jnp.ndarray,      # (T, m)
    angles: ShadingAngles,    # channels (T, V)
    target: jnp.ndarray,      # (T, V)
    weights: jnp.ndarray | None = None,
    block_t: int = 2048,
    view_block: int = 16,
    interpret: bool = False,
):
    """Per-texel data-fit loss and its parameter gradient in ONE fused pass.

    Returns ``(chi2 (T,), g (T, m))`` with ``chi2 = Σ_v (w·(I−y))²`` and
    ``g = ∂(χ²/2)/∂params`` — i.e. the forward *and* backward of the fit
    residual loss from a single read of the angle data (the ``"grad"`` mode
    of the normal-equation kernel, view-chunked through VMEM like the rest
    of the chunked engine).

    This is the op every LM iteration actually evaluates. Composing the
    standalone shading kernel with an XLA loss costs two passes over the
    angle stack (forward, then backward recompute) — the same two passes
    XLA's own autodiff fusion makes, so the kernels tie at the bandwidth
    roofline. Fusing the loss reduction *into* the kernel halves the
    traffic; ``bench.py`` measures this against XLA's ``value_and_grad`` of
    the identical loss.
    """
    spec = PALLAS_MODELS[model]
    m = spec.n_params
    t, v = target.shape
    pad_t = (-t) % block_t
    tp = t + pad_t
    view_block = min(view_block, v)
    pad_v = (-v) % view_block

    def prep(x):  # (T, V) → (Vp, Tp); padded views carry zero weight
        return jnp.pad(x.astype(jnp.float32).T, ((0, pad_v), (0, pad_t)))

    # weights=None with no view padding takes the unweighted kernel variant
    # (one fewer (V, T) HBM read); view padding needs zero weights to mask
    # the pad rows, so it falls back to explicit ones.
    if weights is None and pad_v == 0:
        w = None
    else:
        w = prep(jnp.ones_like(target) if weights is None else weights)

    ang_stack = jnp.stack(
        [prep(getattr(angles, name)) for name in spec.angle_names]
    )
    y = prep(target)
    p_rows = jnp.pad(params.astype(jnp.float32).T, ((0, 8 - m), (0, pad_t)))
    out = _ne_call(spec, ang_stack, y, w, p_rows, min(block_t, tp),
                   view_block, "grad", interpret)
    return out[0, :t], out[1 : 1 + m, :t].T


# ---------------------------------------------------------------------------
# Joint normal-map engine (BASELINE config 4): m = 9, angles evaluated
# IN-KERNEL from geometry + the fitted normal offset
# ---------------------------------------------------------------------------
#
# The joint model fits [kd_rgb (3), ks_rgb (3), shared shape, normal offset
# (nu, nv)] per texel against 3·V residuals (models/normalmap.py). Its angles
# depend on the parameters (the shading normal is
# n' = normalize(n + nu·t + nv·b)), so the fixed-angle NE kernel above cannot
# serve it. This kernel instead takes raw per-(texel, view) light/eye unit
# vectors plus the per-texel (n, t, b) frame, recomputes the perturbed
# normal, the cosines, AND their (nu, nv) chain-rule partials inside VMEM,
# and accumulates the m=9 normal equations (1 + 45 + 9 = 55 rows) over
# (texel-block, view-chunk) grid steps — the bounded/joint hard part
# SURVEY.md §7 names, on the same chunked-engine scaffolding (levmar's
# solver family never excluded a residual model or parameter count,
# lmbc_core.c:369).
#
# Jacobian structure exploited: channel c's residual only touches columns
# {c, 3+c, 6, 7, 8}, so 12 of the 45 upper-tri JᵀJ entries are structurally
# zero and never accumulate.

_JOINT_M = 9


def _joint_ne_kernel(lv_ref, y_ref, w_ref, p_ref, geom_ref, out_ref, *,
                     base_spec: ShadingKernelSpec, mode: str):
    """One (texel-block, view-chunk) step of the joint normal equations.

    Refs: lv (6, Vb, TB) = L/V unit vectors; y (3, Vb, TB) per-channel
    targets; w (3, Vb, TB) PER-CHANNEL weights (channels are independent
    measurements — per-channel saturation masks / IRLS weights reach the
    joint fit here; a shared (T, V) mask is broadcast by ``_joint_prep``);
    p (16, TB) rows 0..8 = params; geom (16, TB) rows 0..8 = per-texel
    (n, t, b); out (rows_p, TB) accumulator (zeroed on the first view
    chunk)."""
    m = _JOINT_M
    n3 = [geom_ref[i : i + 1, :] for i in range(3)]
    t3 = [geom_ref[3 + i : 4 + i, :] for i in range(3)]
    b3 = [geom_ref[6 + i : 7 + i, :] for i in range(3)]
    p = [p_ref[j : j + 1, :] for j in range(m)]
    nu_o, nv_o = p[7], p[8]

    # perturbed unit normal and its offset partials (per texel, (1, TB)):
    # n' = w/|w|, w = n + nu·t + nv·b;  dn'/dnu = (t − n'(n'·t))/|w|
    wv = [n3[i] + nu_o * t3[i] + nv_o * b3[i] for i in range(3)]
    inv_ell = jax.lax.rsqrt(jnp.maximum(sum(x * x for x in wv), _EPS))
    npn = [x * inv_ell for x in wv]
    ndt = sum(npn[i] * t3[i] for i in range(3))
    ndb = sum(npn[i] * b3[i] for i in range(3))
    dn_du = [(t3[i] - npn[i] * ndt) * inv_ell for i in range(3)]
    dn_dv = [(b3[i] - npn[i] * ndb) * inv_ell for i in range(3)]

    ell = [lv_ref[i] for i in range(3)]        # L (Vb, TB) per component
    vd = [lv_ref[3 + i] for i in range(3)]     # V
    s = [ell[i] + vd[i] for i in range(3)]
    inv_s = jax.lax.rsqrt(jnp.maximum(sum(x * x for x in s), _EPS))
    h = [x * inv_s for x in s]                 # H = normalize(L + V)

    def dots(x):
        """X·n' and its (nu, nv) partials, broadcast (Vb,TB)·(1,TB)."""
        return (
            sum(x[i] * npn[i] for i in range(3)),
            sum(x[i] * dn_du[i] for i in range(3)),
            sum(x[i] * dn_dv[i] for i in range(3)),
        )

    names = base_spec.angle_names
    angs = {"cos_ln": dots(ell)}
    cl, cl_du, cl_dv = angs["cos_ln"]
    if "cos_nh" in names:
        angs["cos_nh"] = dots(h)
    if "cos_vn" in names or "cos_rv" in names:
        cvn, cvn_du, cvn_dv = dots(vd)
        angs["cos_vn"] = (cvn, cvn_du, cvn_dv)
    if "cos_rv" in names:
        # R·V = 2 (N·L)(N·V) − L·V; L·V is normal-independent
        lvdot = sum(ell[i] * vd[i] for i in range(3))
        angs["cos_rv"] = (
            2.0 * cl * cvn - lvdot,
            2.0 * (cl_du * cvn + cl * cvn_du),
            2.0 * (cl_dv * cvn + cl * cvn_dv),
        )
    ang_vals = tuple(angs[nm][0] for nm in names)
    ang_dus = tuple(angs[nm][1] for nm in names)
    ang_dvs = tuple(angs[nm][2] for nm in names)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    chi2_acc = None
    a_acc: dict = {}
    g_acc: list = [None] * m
    for c in range(3):
        w = w_ref[c]
        w2 = w * w
        i_val, d_par, d_ang = base_spec.eval(
            ang_vals, (p[c], p[3 + c], p[6])
        )
        r = (i_val - y_ref[c]) * w
        rs = _row_sum(r * r)
        chi2_acc = rs if chi2_acc is None else chi2_acc + rs
        if mode == "chi2":
            continue
        d_nu = sum(d_ang[a] * ang_dus[a] for a in range(len(names)))
        d_nv = sum(d_ang[a] * ang_dvs[a] for a in range(len(names)))
        cols = {c: d_par[0], 3 + c: d_par[1], 6: d_par[2], 7: d_nu, 8: d_nv}
        rw = r * w
        for j, cj in cols.items():
            gj = _row_sum(cj * rw)
            g_acc[j] = gj if g_acc[j] is None else g_acc[j] + gj
        if mode == "full":
            keys = sorted(cols)
            for ji, j in enumerate(keys):
                for k in keys[ji:]:
                    v = _row_sum(cols[j] * cols[k] * w2)
                    prev = a_acc.get((j, k))
                    a_acc[(j, k)] = v if prev is None else prev + v

    zero = jnp.zeros_like(chi2_acc)
    acc = [chi2_acc]
    if mode == "full":
        for j in range(m):
            for k in range(j, m):
                val = a_acc.get((j, k))
                acc.append(zero if val is None else val)
    if mode in ("full", "grad"):
        acc.extend(zero if g is None else g for g in g_acc)
    rows = len(acc)
    out_ref[0:rows, :] = out_ref[0:rows, :] + jnp.concatenate(acc, axis=0)


def _joint_ne_call(base_spec, lv_stack, y_stack, w, p_rows, geom_rows,
                   block_t, view_block, mode, interpret):
    _, vp, tp = lv_stack.shape
    m = _JOINT_M
    rows = {"chi2": 1, "grad": 1 + m, "full": _ne_rows(m)}[mode]
    rows_p = ((rows + 7) // 8) * 8
    cvt = pl.BlockSpec((3, view_block, block_t), lambda i, j: (0, j, i),
                       memory_space=pltpu.VMEM)
    rows16 = pl.BlockSpec((16, block_t), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_joint_ne_kernel, base_spec=base_spec, mode=mode),
        grid=(tp // block_t, vp // view_block),
        in_specs=[
            pl.BlockSpec((6, view_block, block_t), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            cvt,
            cvt,
            rows16,
            rows16,
        ],
        out_specs=pl.BlockSpec((rows_p, block_t), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_p, tp), jnp.float32),
        interpret=interpret,
    )(lv_stack, y_stack, w, p_rows, geom_rows)


def _joint_prep(base_model, geom, target, weights, block_t, view_block):
    """Shared input shaping for the joint kernels: views-major stacks padded
    to the block grid. Returns (spec, lv, y, w, geom_rows, t, v, tp, pad_t,
    view_block)."""
    from brdf_tpu.models.normalmap import tangent_basis

    spec = SHADING_KERNELS[base_model]
    t, v = target.shape[0], target.shape[1]
    pad_t = (-t) % block_t
    tp = t + pad_t
    view_block = min(view_block, v)
    pad_v = (-v) % view_block

    def prep_tv(x):  # (T, V) → (Vp, Tp)
        return jnp.pad(x.astype(jnp.float32).T, ((0, pad_v), (0, pad_t)))

    def prep_vec(x):  # (T, V, 3) → (3, Vp, Tp)
        return jnp.pad(
            x.astype(jnp.float32).transpose(2, 1, 0),
            ((0, 0), (0, pad_v), (0, pad_t)),
        )

    lv = jnp.concatenate([prep_vec(geom.l), prep_vec(geom.v)], axis=0)
    y = prep_vec(target)                       # (3, Vp, Tp) channel-major
    # weights: (T, V) shared across channels or (T, V, 3) per-channel —
    # always shipped to the kernel as a (3, Vp, Tp) per-channel stack
    if weights is None:
        weights = jnp.ones(target.shape[:2], jnp.float32)
    if weights.ndim == 2:
        weights = jnp.broadcast_to(weights[..., None], weights.shape + (3,))
    w = prep_vec(weights)
    n = geom.n.astype(jnp.float32)
    tb, bb = tangent_basis(n)
    geom_rows = jnp.pad(
        jnp.concatenate([n.T, tb.T, bb.T], axis=0), ((0, 7), (0, pad_t))
    )                                           # (16, Tp)
    return spec, lv, y, w, geom_rows, t, v, tp, pad_t, view_block


@functools.partial(
    jax.jit,
    static_argnames=(
        "base_model", "opts", "lower", "upper", "block_t", "view_block",
        "axis_name", "interpret",
    ),
)
def lm_fit_joint_pallas_chunked(
    base_model: str,
    geom,                    # ShadingGeometry: n (T,3), l/v (T,V,3)
    target: jnp.ndarray,     # (T, V, 3)
    p0: jnp.ndarray,         # (T, 9)
    weights: jnp.ndarray | None = None,   # (T, V) or per-channel (T, V, 3)
    opts: LMOptions = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=40),
    lower: tuple = (),
    upper: tuple = (),
    block_t: int = 1024,
    view_block: int = 8,
    axis_name: str | None = None,
    interpret: bool = False,
    warm: tuple | None = None,
) -> PallasFitResult:
    """Chunked Pallas tier for the m=9 joint normal-map fit (config 4).

    Same box-projected LM control loop as the lobe engines
    (:func:`_chunked_lm_loop`), with the normal equations accumulated by
    :func:`_joint_ne_kernel` — angles and their offset partials evaluated
    in-kernel from geometry, so every iteration is one pass over the
    (L, V, y) stacks with zero HBM-resident intermediates. ``axis_name``
    psums the per-shard normal equations over a view-sharded mesh exactly
    like the lobe engine.
    """
    m = _JOINT_M
    if len(lower) != m or len(upper) != m:
        raise ValueError(f"joint fit has {m} params; got bounds {lower}/{upper}")
    spec, lv, y, w, geom_rows, t, v, tp, pad_t, view_block = _joint_prep(
        base_model, geom, target, weights, block_t, view_block
    )
    p0_rows = jnp.pad(p0.astype(jnp.float32).T, ((0, 16 - m), (0, pad_t)))

    if axis_name is not None:
        reduce_sum = functools.partial(jax.lax.psum, axis_name=axis_name)
    else:
        reduce_sum = lambda x: x

    lb = [jnp.float32(b) for b in lower]
    ub = [jnp.float32(b) for b in upper]

    def clip_rows(pr):
        rows = [jnp.clip(pr[j], lb[j], ub[j]) for j in range(m)]
        return jnp.concatenate(
            [jnp.stack(rows), jnp.zeros((16 - m, tp), jnp.float32)], axis=0
        )

    bt = min(block_t, tp)

    def ne(pr):
        out = reduce_sum(_joint_ne_call(
            spec, lv, y, w, pr, geom_rows, bt, view_block, "full", interpret
        ))
        af = {}
        idx = 1
        for j in range(m):
            for k in range(j, m):
                af[(j, k)] = out[idx]
                idx += 1
        g = [out[idx + j] for j in range(m)]
        return out[0], af, g

    def chi2_of(pr):
        return reduce_sum(_joint_ne_call(
            spec, lv, y, w, pr, geom_rows, bt, view_block, "chi2", interpret
        ))[0]

    return _chunked_lm_loop(
        m, 16, t, tp, pad_t, lb, ub, opts, ne, chi2_of,
        clip_rows(p0_rows), warm,
    )


@functools.partial(
    jax.jit,
    static_argnames=("base_model", "block_t", "view_block", "interpret"),
)
def joint_value_and_grad_pallas(
    base_model: str,
    params: jnp.ndarray,      # (T, 9)
    geom,                     # ShadingGeometry
    target: jnp.ndarray,      # (T, V, 3)
    weights: jnp.ndarray | None = None,
    block_t: int = 1024,
    view_block: int = 8,
    interpret: bool = False,
):
    """Joint-model loss + gradient THROUGH THE ANGLES in one fused pass.

    Returns ``(chi2 (T,), g (T, 9))`` with ``g = ∂(χ²/2)/∂params`` including
    the normal-offset columns — the joint backward that previously had no
    Pallas tier (two XLA passes through ``perturbed_angles``; VERDICT r2
    weak #3). One read of the (L, V, y) stacks computes residuals, the
    chain-ruled offset partials, and the 9 gradient rows.
    """
    spec, lv, y, w, geom_rows, t, v, tp, pad_t, view_block = _joint_prep(
        base_model, geom, target, weights, block_t, view_block
    )
    p_rows = jnp.pad(
        params.astype(jnp.float32).T, ((0, 16 - _JOINT_M), (0, pad_t))
    )
    out = _joint_ne_call(
        spec, lv, y, w, p_rows, geom_rows, min(block_t, tp), view_block,
        "grad", interpret,
    )
    return out[0, :t], out[1 : 1 + _JOINT_M, :t].T


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "opts", "lower", "upper", "block_t", "first_itmax",
        "tail_frac", "interpret",
    ),
)
def lm_fit_pallas_compacted(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,     # (T, V)
    p0: jnp.ndarray,         # (T, m)
    weights: jnp.ndarray | None = None,
    opts: LMOptions = LMOptions(eps1=1e-9, eps2=1e-9, eps3=1e-14, itmax=60),
    lower: tuple = (0.0, 0.0, 0.0),
    upper: tuple = (100.0, 100.0, 100.0),
    block_t: int = 1024,
    first_itmax: int = 8,
    tail_frac: int = 8,
    select_chi2: float | None = None,
    interpret: bool = False,
) -> PallasFitResult:
    """Two-phase fused fit with TAIL COMPACTION.

    The fused kernel's block runs until its SLOWEST lane stops, so one
    hard texel per 1024-lane block makes every block pay the full ``itmax``
    even when the median lane converges in 3 iterations (measured r3:
    block-max ≈ itmax for every itmax in 12..60 while p99 per-lane is ~17).
    This wrapper restructures the schedule:

    1. phase 1 — everyone runs with ``itmax=first_itmax`` (covers the
       median×2); converged lanes are final;
    2. the unconverged lanes (stop == MAX_ITERATIONS) are GATHERED into a
       dense batch of static size ``T // tail_frac`` and resumed — same
       parameters, same (μ, ν) damping state via the warm-resume rows — with
       the full ``opts.itmax`` budget;
    3. results scatter back (out-of-range fill indices drop).

    Cost model: T/block_t blocks × first_itmax + (T/tail_frac)/block_t
    blocks × itmax. If the tail overflows the static slab the overflow keeps
    its phase-1 result, so choose ``tail_frac`` ≤ 1/observed-tail-fraction.

    **Measured honestly (r3, one v5e chip, the bench distribution)**: this
    LOSES there — ~12% of lanes are still active after 8 iterations (median
    3, p99 17), so phase 2's 60-iteration budget over T/8 lanes costs as
    many block-iterations as phase 1 saved (6.1 ms vs the flat itmax=16
    cap's 3.0 ms per 131k batch), and the default slab overflowed (recovery
    0.940 vs 0.977). **Re-measured r4** (quiet host, sweeps in
    ``runs/evidence_r4{b,c}_summary.json``): still loses, for two further
    reasons — the gather/second-launch glue costs ~2 ms FIXED on this
    runtime (launch count, not FLOPs), and the bench's recovery stragglers
    are *low-χ²* lanes slowly polishing the exponent direction, so neither
    stop-based nor ``select_chi2`` selection finds a small-enough slab
    (best compacted row 25.8 M fits/s vs flat-24's 33.6 M at equal
    recovery). It pays only for THIN, *high-χ²* tails — e.g. production
    scene fits where >99.9% of texels converge inside ``first_itmax`` —
    which is why the bench and drivers default to a flat cap and this
    wrapper is an explicit opt-in for tail-heavy workloads with a measured
    tail size.

    ``select_chi2``: when set, phase 2 gathers lanes with ``χ² >
    select_chi2`` instead of ``stop == MAX_ITERATIONS`` — polishes
    genuinely-unfit lanes (including ones that stopped badly, which get a
    Kanzow damping re-init) rather than everything the iteration cap
    happened to interrupt.

    This is the TPU answer to levmar's per-problem adaptive iteration
    counts (``lm_core.c`` loops each problem independently on a CPU): batch
    wide, then compact the stragglers — worth it exactly when the straggler
    population is small.
    """
    r1 = lm_fit_pallas(
        model, angles, target, p0, weights=weights,
        opts=opts._replace(itmax=first_itmax),
        lower=lower, upper=upper, block_t=block_t, interpret=interpret,
    )
    t = target.shape[0]
    cap = max(block_t, t // tail_frac)
    if select_chi2 is not None:
        # χ²-based tail selection (r4): `stop == MAX_ITERATIONS` drastically
        # over-selects — measured on the bench distribution, 46% of lanes
        # are still nominally active at a 12-iteration cap while chi2_p99 is
        # ~1e-8, i.e. almost all of them already fit their data and merely
        # haven't tripped a tolerance. Selecting lanes whose χ² exceeds the
        # threshold polishes only the genuinely-unfit tail (including lanes
        # that STOPPED badly, which stop-based selection misses) at a
        # fraction of phase 2's cost.
        active = r1.chi2 > jnp.float32(select_chi2)
    else:
        active = r1.stop == jnp.int32(StopReason.MAX_ITERATIONS)
    # fill = t (out of range): gathers clip to the last row (garbage lanes,
    # zero weight), scatters drop
    idx = jnp.nonzero(active, size=cap, fill_value=t)[0]
    idx_c = jnp.minimum(idx, t - 1)
    valid = idx < t

    if weights is None:
        weights = jnp.ones_like(target)
    ang_g = jax.tree.map(lambda a: a[idx_c], angles)
    w_g = weights[idx_c] * valid[:, None]
    # Damping carry: lanes gathered mid-run (stop == MAX_ITERATIONS) resume
    # their (μ, ν); lanes that STOPPED badly (χ²-selected) get μ ≤ 0 — the
    # Kanzow re-init — since resuming their exact state would just retake
    # the same step and re-trigger the same stop.
    still_running = r1.stop[idx_c] == jnp.int32(StopReason.MAX_ITERATIONS)
    warm = (
        jnp.where(still_running, r1.mu[idx_c], 0.0),
        jnp.where(still_running, r1.nu[idx_c], 2.0),
        jnp.zeros((cap,), jnp.float32),
    )
    r2 = lm_fit_pallas(
        model, ang_g, target[idx_c], r1.p[idx_c], weights=w_g,
        opts=opts, lower=lower, upper=upper,
        block_t=min(block_t, cap), interpret=interpret, warm=warm,
    )

    merged_p = r1.p.at[idx].set(
        jnp.where(valid[:, None], r2.p, r1.p[idx_c]), mode="drop"
    )

    def sc1(base, new):
        return base.at[idx].set(jnp.where(valid, new, base[idx_c]), mode="drop")

    return PallasFitResult(
        p=merged_p,
        chi2=sc1(r1.chi2, r2.chi2),
        iters=sc1(r1.iters, r1.iters[idx_c] + r2.iters),
        stop=sc1(r1.stop, r2.stop),
        g_inf=sc1(r1.g_inf, r2.g_inf),
        mu=sc1(r1.mu, r2.mu),
        nu=sc1(r1.nu, r2.nu),
    )
