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
  shading model, analytic Jacobian, JᵀJ/Jᵀe reductions, damped 3×3 solve by
  Cramer's rule, box projection, Nielsen μ-control, convergence tests — with
  zero HBM traffic per iteration. (The lax.while_loop formulation in
  ``solver/lm.py`` re-streams loop state through HBM every iteration.)
- **Analytic derivatives**: the 3-parameter lobes differentiate by hand (the
  ``ln s·sⁿ`` chain), so one iteration costs ~2 model evaluations — levmar's
  finite-difference path cost m+1 = 4 (``misc_core.c:137-172``).
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
from brdf_tpu.solver.lm import LMOptions, StopReason

_EPS = 1e-12


class PallasModel(NamedTuple):
    name: str
    angle_names: tuple[str, ...]   # which ShadingAngles channels the lobe reads
    # eval(angles_tuple, kd, ks, shape) -> (I, dI/dkd, dI/dks, dI/dshape)
    eval: object


def _blinn_phong_eval(angles, kd, ks, n):
    cl, cnh = angles
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(cnh, _EPS)
    ln_s = jnp.log(s)
    spec_b = jnp.where(lit & (cnh > 0), jnp.exp(n * ln_s), 0.0)
    i_val = kd * diff_b + ks * spec_b
    d_n = ks * ln_s * spec_b
    return i_val, diff_b, spec_b, d_n


def _phong_eval(angles, kd, ks, n):
    cl, crv = angles
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(crv, _EPS)
    ln_s = jnp.log(s)
    pw = jnp.where(lit & (crv > 0), jnp.exp(n * ln_s), 0.0)
    norm = (n + 2.0) / (2.0 * jnp.pi)
    spec_b = norm * pw
    i_val = kd * diff_b + ks * spec_b
    # d/dn [ (n+2)/(2π) · sⁿ ] = sⁿ/(2π) + (n+2)/(2π)·ln s·sⁿ
    d_n = ks * (pw / (2.0 * jnp.pi) + norm * ln_s * pw)
    return i_val, diff_b, spec_b, d_n


def _cook_torrance_eval(angles, kd, ks, rough):
    cl, cnh, cvn = angles
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    nh = jnp.maximum(cnh, 0.0)
    r = jnp.maximum(rough, 1e-3)
    a2 = (r * r) * (r * r)

    u = nh * nh * (a2 - 1.0) + 1.0
    u = jnp.maximum(u, _EPS)
    d = a2 / (jnp.pi * u * u)
    dd_da2 = (u - 2.0 * a2 * nh * nh) / (jnp.pi * u * u * u)

    sv = jnp.sqrt(nv * nv * (1.0 - a2) + a2)
    sl = jnp.sqrt(nl * nl * (1.0 - a2) + a2)
    lam_v = nl * sv
    lam_l = nv * sl
    den = jnp.maximum(lam_v + lam_l, _EPS)
    vis = 0.5 / den
    dlam_v = nl * (1.0 - nv * nv) / (2.0 * jnp.maximum(sv, _EPS))
    dlam_l = nv * (1.0 - nl * nl) / (2.0 * jnp.maximum(sl, _EPS))
    dvis_da2 = -0.5 * (dlam_v + dlam_l) / (den * den)

    lit = cl > 0
    spec_core = jnp.where(lit, d * vis * nl, 0.0)
    diff_b = nl / jnp.pi
    i_val = kd * diff_b + ks * spec_core
    dspec_da2 = jnp.where(lit, (dd_da2 * vis + d * dvis_da2) * nl, 0.0)
    da2_dr = 4.0 * r * r * r
    d_r = ks * dspec_da2 * da2_dr
    return i_val, diff_b, spec_core, d_r


def _ward_eval(angles, kd, ks, alpha):
    cl, cnh, cvn = angles
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    nh = jnp.maximum(cnh, 1e-4)       # floor matches models/brdf.py::ward
    a = jnp.maximum(alpha, 1e-3)
    a2 = a * a
    tan2 = (1.0 - nh * nh) / (nh * nh)
    lobe = jnp.exp(-tan2 / a2) / (4.0 * jnp.pi * a2)
    lit = (cl > 0) & (cnh > 0) & (cvn > 0)
    litf = lit.astype(cl.dtype)
    diff_b = nl / jnp.pi
    spec_b = jnp.sqrt(nl / nv) * lobe * litf
    i_val = kd * diff_b + ks * spec_b
    # d/dα [exp(−t/α²)/(4πα²)] = lobe·2(t − α²)/α³
    d_a = ks * spec_b * 2.0 * (tan2 - a2) / (a2 * a) * (alpha > 1e-3)
    return i_val, diff_b, spec_b, d_a


PALLAS_MODELS: dict[str, PallasModel] = {
    "blinn_phong": PallasModel("blinn_phong", ("cos_ln", "cos_nh"), _blinn_phong_eval),
    "phong": PallasModel("phong", ("cos_ln", "cos_rv"), _phong_eval),
    "cook_torrance": PallasModel(
        "cook_torrance", ("cos_ln", "cos_nh", "cos_vn"), _cook_torrance_eval
    ),
    "ward": PallasModel("ward", ("cos_ln", "cos_nh", "cos_vn"), _ward_eval),
}


def _row_sum(x):
    """(V, TB) → (1, TB) reduction over the view (sublane) axis."""
    return jnp.sum(x, axis=0, keepdims=True)


def _lm_kernel(
    angles_ref,   # (A, V, TB)
    y_ref,        # (V, TB)
    w_ref,        # (V, TB)
    p0_ref,       # (8, TB): rows 0..2 = kd, ks, shape
    out_ref,      # (8, TB): rows 0..2 params, 3 chi2, 4 iters, 5 stop, 6 g_inf, 7 mu
    *,
    model: PallasModel,
    opts: LMOptions,
    lower: tuple[float, float, float],
    upper: tuple[float, float, float],
):
    n_angles = len(model.angle_names)
    angles = tuple(angles_ref[a] for a in range(n_angles))
    y = y_ref[...]
    w = w_ref[...]
    w2 = w * w

    lb = [jnp.float32(b) for b in lower]
    ub = [jnp.float32(b) for b in upper]

    def clip3(p):
        return [jnp.clip(p[j], lb[j], ub[j]) for j in range(3)]

    p = clip3([p0_ref[0:1, :], p0_ref[1:2, :], p0_ref[2:3, :]])

    def chi2_of(p):
        i_val, _, _, _ = model.eval(angles, p[0], p[1], p[2])
        r = (i_val - y) * w
        return _row_sum(r * r)

    chi2 = chi2_of(p)
    zero = jnp.zeros_like(chi2)

    # Carry is ONE packed (16, TB) array: a while_loop carry of many (1, TB)
    # values mixes splat-constant and reduction layouts, which Mosaic cannot
    # reconcile ("Not implemented: Sublane broadcast"); a single packed buffer
    # keeps one layout. Rows: 0-2 params, 3 chi2, 4 mu, 5 nu, 6 iters,
    # 7 stop, 8 g_inf, 9-15 unused.
    R_P0, R_P1, R_P2, R_CHI2, R_MU, R_NU, R_IT, R_STOP, R_GINF = range(9)

    def pack(rows: dict):
        parts = [rows.get(i, zero) for i in range(16)]
        return jnp.concatenate(parts, axis=0)

    state = pack({
        R_P0: p[0], R_P1: p[1], R_P2: p[2],
        R_CHI2: chi2,
        R_NU: zero + 2.0,
        R_STOP: jnp.where(
            jnp.isfinite(chi2), zero, zero + float(StopReason.INVALID_VALUES)
        ),
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
        p = [row(s, R_P0), row(s, R_P1), row(s, R_P2)]
        i_val, d0, d1, d2 = model.eval(angles, p[0], p[1], p[2])
        r = (i_val - y) * w
        d = [d0, d1, d2]

        # normal equations (weights fold in once via w²)
        a = {}
        for j in range(3):
            for k in range(j, 3):
                a[(j, k)] = _row_sum(d[j] * d[k] * w2)
        g = [_row_sum(d[j] * r * w) for j in range(3)]

        # projected-gradient convergence measure
        pg = [p[j] - jnp.clip(p[j] - g[j], lb[j], ub[j]) for j in range(3)]
        g_inf = jnp.maximum(jnp.maximum(jnp.abs(pg[0]), jnp.abs(pg[1])), jnp.abs(pg[2]))
        grad_conv = g_inf <= eps1

        mu = jnp.where(
            row(s, R_IT) == 0.0,
            tau * jnp.maximum(jnp.maximum(a[(0, 0)], a[(1, 1)]), a[(2, 2)]),
            row(s, R_MU),
        )

        # active-set freeze of bound-stuck coordinates
        frozen = [
            ((p[j] <= lb[j]) & (g[j] > 0)) | ((p[j] >= ub[j]) & (g[j] < 0))
            for j in range(3)
        ]
        free = [jnp.where(frozen[j], 0.0, 1.0) for j in range(3)]
        af = {}
        for j in range(3):
            af[(j, j)] = jnp.where(frozen[j], 1.0, a[(j, j)] + mu)
        for j in range(3):
            for k in range(j + 1, 3):
                af[(j, k)] = a[(j, k)] * free[j] * free[k]
        gf = [g[j] * free[j] for j in range(3)]

        # Cramer 3×3 symmetric solve: dp = -Af⁻¹ gf
        c00 = af[(1, 1)] * af[(2, 2)] - af[(1, 2)] * af[(1, 2)]
        c01 = af[(0, 2)] * af[(1, 2)] - af[(0, 1)] * af[(2, 2)]
        c02 = af[(0, 1)] * af[(1, 2)] - af[(0, 2)] * af[(1, 1)]
        c11 = af[(0, 0)] * af[(2, 2)] - af[(0, 2)] * af[(0, 2)]
        c12 = af[(0, 1)] * af[(0, 2)] - af[(0, 0)] * af[(1, 2)]
        c22 = af[(0, 0)] * af[(1, 1)] - af[(0, 1)] * af[(0, 1)]
        det = af[(0, 0)] * c00 + af[(0, 1)] * c01 + af[(0, 2)] * c02
        inv_det = jnp.where(jnp.abs(det) > 1e-30, 1.0 / det, 0.0)
        solver_ok = jnp.abs(det) > 1e-30
        dp = [
            -(c00 * gf[0] + c01 * gf[1] + c02 * gf[2]) * inv_det,
            -(c01 * gf[0] + c11 * gf[1] + c12 * gf[2]) * inv_det,
            -(c02 * gf[0] + c12 * gf[1] + c22 * gf[2]) * inv_det,
        ]

        pn = [jnp.clip(p[j] + dp[j], lb[j], ub[j]) for j in range(3)]
        dpa = [pn[j] - p[j] for j in range(3)]
        dp_nrm2 = dpa[0] ** 2 + dpa[1] ** 2 + dpa[2] ** 2
        p_nrm2 = p[0] ** 2 + p[1] ** 2 + p[2] ** 2
        small_dp = dp_nrm2 <= eps2_sq * p_nrm2

        chi2_new = chi2_of(pn)
        finite = jnp.isfinite(chi2_new)
        df = row(s, R_CHI2) - chi2_new
        # predicted reduction −(2 gᵀδ + δᵀ JᵀJ δ) with the *unfrozen* system
        q = [
            a[(0, 0)] * dpa[0] + a[(0, 1)] * dpa[1] + a[(0, 2)] * dpa[2],
            a[(0, 1)] * dpa[0] + a[(1, 1)] * dpa[1] + a[(1, 2)] * dpa[2],
            a[(0, 2)] * dpa[0] + a[(1, 2)] * dpa[1] + a[(2, 2)] * dpa[2],
        ]
        g_dot = g[0] * dpa[0] + g[1] * dpa[1] + g[2] * dpa[2]
        q_dot = dpa[0] * q[0] + dpa[1] * q[1] + dpa[2] * q[2]
        dl = -(2.0 * g_dot + q_dot)

        accept = solver_ok & finite & (df > 0)
        rho = jnp.where(dl > 0, df / jnp.maximum(dl, 1e-30), 1.0)
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
            R_P0: keep(jnp.where(accept, pn[0], p[0]), p[0]),
            R_P1: keep(jnp.where(accept, pn[1], p[1]), p[1]),
            R_P2: keep(jnp.where(accept, pn[2], p[2]), p[2]),
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
    out_ref[0:1, :] = row(final, R_P0)
    out_ref[1:2, :] = row(final, R_P1)
    out_ref[2:3, :] = row(final, R_P2)
    out_ref[3:4, :] = row(final, R_CHI2)
    out_ref[4:5, :] = row(final, R_IT)
    out_ref[5:6, :] = stop_out
    out_ref[6:7, :] = row(final, R_GINF)
    out_ref[7:8, :] = row(final, R_MU)


class PallasFitResult(NamedTuple):
    p: jnp.ndarray       # (T, 3)
    chi2: jnp.ndarray    # (T,)
    iters: jnp.ndarray   # (T,) float32
    stop: jnp.ndarray    # (T,) int32
    g_inf: jnp.ndarray   # (T,)
    mu: jnp.ndarray      # (T,) final damping (resume state)


@functools.partial(
    jax.jit,
    static_argnames=("model", "opts", "lower", "upper", "block_t", "interpret"),
)
def lm_fit_pallas(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,     # (T, V)
    p0: jnp.ndarray,         # (T, 3)
    weights: jnp.ndarray | None = None,
    opts: LMOptions = LMOptions(eps1=1e-6, eps2=1e-7, eps3=1e-12, itmax=30),
    lower: tuple = (0.0, 0.0, 0.0),
    upper: tuple = (100.0, 100.0, 100.0),
    block_t: int = 1024,
    interpret: bool = False,
) -> PallasFitResult:
    """Fit T independent 3-parameter lobes, one VMEM-resident block at a time.

    Public layout is texel-major (T, V) to match the rest of the framework;
    the wrapper transposes to the kernel's views-major layout and pads T to
    the block size (padded lanes get zero weights and converge immediately).
    """
    spec = PALLAS_MODELS[model]
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
    p0_pad = jnp.pad(p0.T, ((0, 5), (0, pad)))     # (8, Tp)

    a = len(spec.angle_names)
    grid = (tp // block_t,)
    kernel = functools.partial(
        _lm_kernel, model=spec, opts=opts, lower=tuple(lower), upper=tuple(upper)
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
        out_specs=pl.BlockSpec((8, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, y, w, p0_pad)

    out = out[:, :t]
    return PallasFitResult(
        p=out[0:3].T,
        chi2=out[3],
        iters=out[4],
        stop=out[5].astype(jnp.int32),
        g_inf=out[6],
        mu=out[7],
    )
