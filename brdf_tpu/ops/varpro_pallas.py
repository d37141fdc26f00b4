"""Fused Pallas VarPro kernel: the whole profiled solve VMEM-resident.

The XLA tier (``solver/varpro.py``) re-reads the angle/target stacks from
HBM for every grid point of the init and every Newton step — ~20 passes
over ~25 MB per 131k-texel batch. This kernel keeps one texel block's
angles, target, and weights in VMEM for the ENTIRE solve (grid init +
k fixed Newton steps), the same trick as the fused LM kernel
(``lm_pallas.py::_lm_kernel``), with the per-lobe analytic evaluations
shared from ``SHADING_KERNELS``: one ``spec.eval`` with params
``(0, 1, σ)`` yields the specular basis (``i_val``), the σ-independent
diffuse basis (``d_params[0]``) and ``∂b/∂σ`` (``d_params[2]``) in a
single fused pass.

Math is identical to the XLA tier (BVLS via edge enumeration, Kaufman
projected curvature, residually-formed χ², log-coordinate with a
degeneracy floor) — parity is tested lane-for-lane in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brdf_tpu.models.brdf import ShadingAngles
from brdf_tpu.ops.shading_pallas import SHADING_KERNELS
from brdf_tpu.solver.init import default_shape_grid
from brdf_tpu.solver.varpro import (
    _SEPARABLE,
    _SEPARABLE_ND,
    VarProResult,
    _bvls2,
    _solve_damped_sym,
)

_TINY = 1e-30


def _rsum(x):
    return jnp.sum(x, axis=0, keepdims=True)


def _varpro_kernel(
    angles_ref,   # (A, V, TB)
    y_ref,        # (V, TB)
    w_ref,        # (V, TB)
    *rest,        # [p0_ref (8, TB) when with_p0], out_ref (8, TB)
    spec,
    grid: tuple,          # static shape-grid values
    iters: int,
    lower: tuple,
    upper: tuple,
    use_log: bool,
    s_lo: float,
    s_hi: float,
    with_p0: bool = False,
):
    # out rows: kd, ks, sigma, chi2, iters, stop, g_abs, pad
    p0_ref = rest[0] if with_p0 else None
    out_ref = rest[-1]
    n_angles = len(spec.angle_names)
    angles = tuple(angles_ref[a] for a in range(n_angles))
    y = y_ref[...]
    w = w_ref[...]
    yw = y * w
    one = jnp.ones_like(y[:1])
    zero = jnp.zeros_like(one)

    def eval_sig(sig_row):
        """(1,TB) σ → (a, b, ∂b/∂σ), each (V,TB)."""
        i_val, d_params, _ = spec.eval(angles, (zero, one, sig_row))
        return d_params[0], i_val, d_params[2]

    l0, u0 = float(lower[0]), float(upper[0])
    l1, u1 = float(lower[1]), float(upper[1])

    # diffuse basis is σ-independent for every separable lobe
    a, _, _ = eval_sig(zero + float(grid[0]))
    aw = a * w
    aa = _rsum(aw * aw)
    ay = _rsum(aw * yw)

    def solve_lin(b):
        bw = b * w
        ab = _rsum(aw * bw)
        bb = _rsum(bw * bw)
        by = _rsum(bw * yw)
        kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
        return kd, ks, bw, ab, bb, by

    if with_p0:
        # Caller-supplied start (chunked resume / IRLS warm refit): row 2
        # of p0_ref carries σ; kd/ks re-solve in closed form at σ0 exactly
        # like the XLA tier, so only the shape start matters. The in-kernel
        # grid init is skipped entirely (ADVICE r4: without this, every
        # resumed chunk restarted the solve from scratch).
        sig0 = jnp.clip(
            p0_ref[2:3, :],
            float(np.exp(s_lo)) if use_log else s_lo,
            float(np.exp(s_hi)) if use_log else s_hi,
        )
        best_t = jnp.log(sig0) if use_log else sig0
    else:
        # ---- grid init (unrolled over the static grid; cost ranks only) --
        # float() everywhere: np.float64 scalars would promote the f32 rows
        # under an x64-enabled process
        best_t = zero + (float(np.log(grid[0])) if use_log else float(grid[0]))
        best_cost = jnp.full_like(zero, jnp.inf)
        for gval in grid:
            sig = zero + float(gval)
            _, b, _ = eval_sig(sig)
            kd, ks, bw, ab, bb, by = solve_lin(b)
            cost = (kd * kd * aa + ks * ks * bb + 2.0 * kd * ks * ab
                    - 2.0 * (kd * ay + ks * by))
            t_g = zero + (float(np.log(gval)) if use_log else float(gval))
            better = cost < best_cost
            best_t = jnp.where(better, t_g, best_t)
            best_cost = jnp.where(better, cost, best_cost)

    # ---- profiled Newton (identical math to solver/varpro.py) -----------
    def eval_at(t_row):
        sig = jnp.exp(t_row) if use_log else t_row
        _, b, db = eval_sig(sig)
        db_t = db * sig if use_log else db
        bw = b * w
        dbw = db_t * w
        ab = _rsum(aw * bw)
        bb = _rsum(bw * bw)
        by = _rsum(bw * yw)
        kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
        rw = yw - kd * aw - ks * bw
        chi2 = _rsum(rw * rw)
        g = -2.0 * ks * _rsum(rw * dbw)
        a_db = _rsum(aw * dbw)
        b_db = _rsum(bw * dbw)
        det = aa * bb - ab * ab
        det_ok = det > _TINY
        det_s = jnp.where(det_ok, det, 1.0)
        x1 = jnp.where(det_ok, (bb * a_db - ab * b_db) / det_s, 0.0)
        x2 = jnp.where(det_ok, (aa * b_db - ab * a_db) / det_s, 0.0)
        proj = _rsum(dbw * dbw) - x1 * a_db - x2 * b_db
        h = 2.0 * ks * ks * jnp.maximum(proj, 0.0)
        return chi2, g, h, kd, ks

    span = float(s_hi - s_lo)
    chi2_0, g0, h0, kd0, ks0 = eval_at(best_t)

    # packed (8, TB) carry — one layout, same Mosaic rationale as _lm_kernel
    R_T, R_CHI2, R_G, R_H, R_KD, R_KS, R_TRUST, R_N = range(8)

    def pack(rows):
        return jnp.concatenate([rows[i] for i in range(8)], axis=0)

    def row(s, i):
        return s[i : i + 1, :]

    state = pack({
        R_T: best_t, R_CHI2: chi2_0, R_G: g0, R_H: h0,
        R_KD: kd0, R_KS: ks0,
        R_TRUST: zero + 0.25 * span, R_N: zero,
    })

    def body(_, s):
        trust = row(s, R_TRUST)
        step = jnp.clip(
            -row(s, R_G) / jnp.maximum(row(s, R_H), _TINY), -trust, trust
        )
        t_new = jnp.clip(row(s, R_T) + step, s_lo, s_hi)
        chi2_n, g_n, h_n, kd_n, ks_n = eval_at(t_new)
        ok = (chi2_n < row(s, R_CHI2)) & jnp.isfinite(chi2_n)
        sel = lambda n, b: jnp.where(ok, n, b)
        return pack({
            R_T: sel(t_new, row(s, R_T)),
            R_CHI2: sel(chi2_n, row(s, R_CHI2)),
            R_G: sel(g_n, row(s, R_G)),
            R_H: sel(h_n, row(s, R_H)),
            R_KD: sel(kd_n, row(s, R_KD)),
            R_KS: sel(ks_n, row(s, R_KS)),
            R_TRUST: jnp.where(ok, jnp.minimum(trust * 2.0, span),
                               trust * 0.25),
            R_N: row(s, R_N) + ok.astype(jnp.float32),
        })

    final = jax.lax.fori_loop(0, iters, body, state)

    sigma = jnp.exp(row(final, R_T)) if use_log else row(final, R_T)
    converged = row(final, R_TRUST) < 1e-6 * span
    out_ref[0:1, :] = row(final, R_KD)
    out_ref[1:2, :] = row(final, R_KS)
    out_ref[2:3, :] = sigma
    out_ref[3:4, :] = jnp.maximum(row(final, R_CHI2), 0.0)
    out_ref[4:5, :] = row(final, R_N)
    out_ref[5:6, :] = jnp.where(converged, 2.0, 3.0)
    out_ref[6:7, :] = jnp.abs(row(final, R_G))
    out_ref[7:8, :] = jnp.zeros_like(sigma)


@functools.partial(
    jax.jit,
    static_argnames=("model", "iters", "lower", "upper", "block_t",
                     "grid_points", "interpret"),
)
def varpro_fit_pallas(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,        # (T, V)
    weights: jnp.ndarray | None = None,
    p0: jnp.ndarray | None = None,   # (T, 3) optional start (else grid init)
    iters: int = 6,
    lower: tuple | None = None,
    upper: tuple | None = None,
    block_t: int = 512,
    grid_points: int = 8,
    interpret: bool = False,
) -> VarProResult:
    """Fused VarPro solve, one VMEM-resident texel block at a time.

    Same public contract as :func:`brdf_tpu.solver.varpro.varpro_fit`.
    With ``p0=None`` the grid init runs in-kernel, which is the point —
    the angle stack is loaded from HBM exactly once; a supplied ``p0``
    (chunked resume, IRLS warm refit) skips the grid and starts the Newton
    iteration from ``p0``'s σ (kd/ks re-solve in closed form, so only the
    shape start carries state — identical semantics to the XLA tier's
    ``p0``). ``grid_points``
    defaults to 8: the kernel is transcendental-compute-bound, so the init
    is most of its cost, and the Newton steps fully recover from the
    coarser basin — measured grid 16/12/8 at k=6 →
    115.7/137.2/151.6 M fits/s at recovery 0.9845/0.9843/0.9846
    (runs/evidence_r4j_summary.json). ``block_t`` defaults to 512 — the
    measured knee of the block ladder
    (128/256/512/1024/2048/4096 → 122/163/175/173/154/126 M fits/s,
    identical recovery; 8192 exceeds the 16 MB scoped-VMEM limit —
    runs/evidence_r4{m,n}_summary.json): small enough for grid-step
    pipelining, large enough to amortize per-block overhead."""
    from brdf_tpu.models.brdf import MODELS

    if model not in _SEPARABLE or model not in SHADING_KERNELS:
        raise ValueError(
            f"varpro_fit_pallas supports separable kernel lobes, got {model!r}"
        )
    spec = SHADING_KERNELS[model]
    mspec = MODELS[model]
    lo = tuple(float(x) for x in (mspec.lower if lower is None else lower))
    hi = tuple(float(x) for x in (mspec.upper if upper is None else upper))
    use_log = _SEPARABLE[model] == "log"
    sig_floor = max(lo[2], 0.25) if use_log else max(lo[2], 1e-6)
    s_lo = float(np.log(sig_floor)) if use_log else float(sig_floor)
    s_hi = float(np.log(hi[2])) if use_log else float(hi[2])
    grid = tuple(
        float(x) for x in np.ravel(default_shape_grid(model, num=grid_points))
        if sig_floor <= float(x) <= hi[2]
    ) or (sig_floor,)

    t, v = target.shape
    if weights is None:
        weights = jnp.ones_like(target)
    pad = (-t) % block_t
    tp = t + pad

    def prep(x):   # (T, V) → (V, Tp)
        return jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))

    ang_stack = jnp.stack(
        [prep(getattr(angles, name)) for name in spec.angle_names]
    )
    y = prep(target)
    w = prep(weights)

    a = len(spec.angle_names)
    with_p0 = p0 is not None
    kernel = functools.partial(
        _varpro_kernel, spec=spec, grid=grid, iters=int(iters),
        lower=lo, upper=hi, use_log=use_log, s_lo=s_lo, s_hi=s_hi,
        with_p0=with_p0,
    )
    vt_spec = pl.BlockSpec((v, block_t), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    rows8 = pl.BlockSpec((8, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        vt_spec,
        vt_spec,
    ]
    inputs = [ang_stack, y, w]
    if with_p0:
        in_specs.append(rows8)
        inputs.append(
            jnp.pad(p0.astype(jnp.float32).T, ((0, 8 - p0.shape[-1]), (0, pad)))
        )
    out = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=in_specs,
        out_specs=rows8,
        out_shape=jax.ShapeDtypeStruct((8, tp), jnp.float32),
        interpret=interpret,
    )(*inputs)

    out = out[:, :t]
    return VarProResult(
        p=jnp.stack([out[0], out[1], out[2]], axis=-1),
        chi2=out[3],
        iters=out[4].astype(jnp.int32),
        stop=out[5].astype(jnp.int32),
        g_abs=out[6],
    )


# ---------------------------------------------------------------------------
# d-dimensional shape spaces (m=5 anisotropic lobes): the same fused solve
# with d-D profiled Newton. The decisive structural win over the XLA tier
# (solver/varpro.py::varpro_fit_nd): the analytic shading kernels return
# ∂b/∂shape_j for ALL shape dims in ONE fused evaluation (d_params[2+j]),
# so an iteration costs one pass over the VMEM-resident angle stack instead
# of the XLA tier's 1 basis + d JVP passes over HBM.
# ---------------------------------------------------------------------------


def _varpro_nd_kernel(
    angles_ref,   # (A, V, TB)
    y_ref,        # (V, TB)
    w_ref,        # (V, TB)
    *rest,        # [p0_ref (8, TB) when with_p0], out_ref (16, TB)
    spec,
    grid: tuple,          # static tuple of d-tuples
    iters: int,
    lower: tuple,         # full m-box
    upper: tuple,
    lo_s: tuple,          # d-dim shape box (floored)
    hi_s: tuple,
    d: int,
    with_p0: bool = False,
):
    # out rows: kd, ks, shape[0..d), chi2, iters, stop, g_abs, pad…
    p0_ref = rest[0] if with_p0 else None
    out_ref = rest[-1]
    n_angles = len(spec.angle_names)
    angles = tuple(angles_ref[a] for a in range(n_angles))
    y = y_ref[...]
    w = w_ref[...]
    yw = y * w
    one = jnp.ones_like(y[:1])
    zero = jnp.zeros_like(one)

    def eval_shape(shape_rows):
        """d × (1,TB) shape rows → (a, b, (∂b/∂shape_j)_j), each (V,TB) —
        ONE fused analytic evaluation."""
        i_val, d_params, _ = spec.eval(angles, (zero, one) + tuple(shape_rows))
        return d_params[0], i_val, tuple(d_params[2 + j] for j in range(d))

    l0, u0 = float(lower[0]), float(upper[0])
    l1, u1 = float(lower[1]), float(upper[1])
    lo_v = [float(x) for x in lo_s]
    hi_v = [float(x) for x in hi_s]
    span = float(np.sqrt(sum((h - l) ** 2 for h, l in zip(hi_v, lo_v))))

    # diffuse basis is shape-independent for every separable lobe
    a, _, _ = eval_shape([zero + g for g in grid[0]])
    aw = a * w
    aa = _rsum(aw * aw)
    ay = _rsum(aw * yw)

    if with_p0:
        shape0 = [
            jnp.clip(p0_ref[2 + j : 3 + j, :], lo_v[j], hi_v[j])
            for j in range(d)
        ]
    else:
        # grid init (cost ranks only, Gram identity)
        best = [zero + float(grid[0][j]) for j in range(d)]
        best_cost = jnp.full_like(zero, jnp.inf)
        for gval in grid:
            rows = [zero + float(gval[j]) for j in range(d)]
            _, b, _ = eval_shape(rows)
            bw = b * w
            ab = _rsum(aw * bw)
            bb = _rsum(bw * bw)
            by = _rsum(bw * yw)
            kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
            cost = (kd * kd * aa + ks * ks * bb + 2.0 * kd * ks * ab
                    - 2.0 * (kd * ay + ks * by))
            better = cost < best_cost
            best = [jnp.where(better, r, b_) for r, b_ in zip(rows, best)]
            best_cost = jnp.where(better, cost, best_cost)
        shape0 = best

    def eval_at(shape_rows):
        """Profiled χ², gradient (d), Kaufman-projected GN H (upper), kd, ks."""
        _, b, dbs = eval_shape(shape_rows)
        bw = b * w
        ab = _rsum(aw * bw)
        bb = _rsum(bw * bw)
        by = _rsum(bw * yw)
        kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
        rw = yw - kd * aw - ks * bw
        chi2 = _rsum(rw * rw)
        det = aa * bb - ab * ab
        det_ok = det > _TINY
        det_s = jnp.where(det_ok, det, 1.0)

        g_rows, cols = [], []
        for j in range(d):
            u = ks * dbs[j] * w
            g_rows.append(-2.0 * _rsum(rw * u))
            ua = _rsum(u * aw)
            ub = _rsum(u * bw)
            x1 = jnp.where(det_ok, (bb * ua - ab * ub) / det_s, 0.0)
            x2 = jnp.where(det_ok, (aa * ub - ab * ua) / det_s, 0.0)
            cols.append(u - x1 * aw - x2 * bw)
        h = {
            (j, k): 2.0 * _rsum(cols[j] * cols[k])
            for j in range(d) for k in range(j, d)
        }
        return chi2, g_rows, h, kd, ks

    chi2_0, g0, h0, kd0, ks0 = eval_at(shape0)

    # packed (NR, TB) carry: one layout (Mosaic sublane-broadcast rationale,
    # see _varpro_kernel). Rows: d shape | chi2 | d g | d(d+1)/2 H | kd, ks,
    # trust, n_acc.
    n_h = d * (d + 1) // 2
    hkeys = [(j, k) for j in range(d) for k in range(j, d)]
    R_CHI2 = d
    R_G = d + 1
    R_H = R_G + d
    R_KD = R_H + n_h
    R_KS, R_TRUST, R_N = R_KD + 1, R_KD + 2, R_KD + 3
    NR = R_N + 1

    def pack(shape_rows, chi2, g_rows, h, kd, ks, trust, n_acc):
        rows = list(shape_rows) + [chi2] + list(g_rows)
        rows += [h[k] for k in hkeys]
        rows += [kd, ks, trust, n_acc]
        return jnp.concatenate(rows, axis=0)

    def row(s, i):
        return s[i : i + 1, :]

    state = pack(shape0, chi2_0, g0, h0, kd0, ks0,
                 zero + 0.25 * span, zero)

    def body(_, s):
        trust = row(s, R_TRUST)
        g_b = [row(s, R_G + j) for j in range(d)]
        h_b = {k: row(s, R_H + i) for i, k in enumerate(hkeys)}
        lam = 1e-6 * sum(h_b[(j, j)] for j in range(d)) + _TINY
        steps, ok_h = _solve_damped_sym(h_b, g_b, d, lam)
        nrm2 = sum(st * st for st in steps)
        nrm = jnp.sqrt(jnp.maximum(nrm2, _TINY))
        scale = jnp.where(
            ok_h, jnp.minimum(1.0, trust / nrm), 0.0
        )
        shape_n = [
            jnp.clip(row(s, j) + steps[j] * scale, lo_v[j], hi_v[j])
            for j in range(d)
        ]
        chi2_n, g_n, h_n, kd_n, ks_n = eval_at(shape_n)
        ok = (chi2_n < row(s, R_CHI2)) & jnp.isfinite(chi2_n)
        sel = lambda n, b: jnp.where(ok, n, b)
        return pack(
            [sel(shape_n[j], row(s, j)) for j in range(d)],
            sel(chi2_n, row(s, R_CHI2)),
            [sel(g_n[j], g_b[j]) for j in range(d)],
            {k: sel(h_n[k], h_b[k]) for k in hkeys},
            sel(kd_n, row(s, R_KD)), sel(ks_n, row(s, R_KS)),
            jnp.where(ok, jnp.minimum(trust * 2.0, span), trust * 0.25),
            row(s, R_N) + ok.astype(jnp.float32),
        )

    final = jax.lax.fori_loop(0, iters, body, state)

    converged = row(final, R_TRUST) < 1e-6 * span
    g_abs = jnp.abs(row(final, R_G))
    for j in range(1, d):
        g_abs = jnp.maximum(g_abs, jnp.abs(row(final, R_G + j)))
    out_ref[0:1, :] = row(final, R_KD)
    out_ref[1:2, :] = row(final, R_KS)
    for j in range(d):
        out_ref[2 + j : 3 + j, :] = row(final, j)
    out_ref[2 + d : 3 + d, :] = jnp.maximum(row(final, R_CHI2), 0.0)
    out_ref[3 + d : 4 + d, :] = row(final, R_N)
    out_ref[4 + d : 5 + d, :] = jnp.where(converged, 2.0, 3.0)
    out_ref[5 + d : 6 + d, :] = g_abs
    for j in range(6 + d, 16):
        out_ref[j : j + 1, :] = jnp.zeros_like(g_abs)


@functools.partial(
    jax.jit,
    static_argnames=("model", "iters", "lower", "upper", "block_t",
                     "grid_points", "interpret"),
)
def varpro_fit_pallas_nd(
    model: str,
    angles: ShadingAngles,
    target: jnp.ndarray,        # (T, V)
    weights: jnp.ndarray | None = None,
    p0: jnp.ndarray | None = None,   # (T, 2+d) optional start
    iters: int = 12,
    lower: tuple | None = None,
    upper: tuple | None = None,
    block_t: int = 512,
    grid_points: int = 8,
    interpret: bool = False,
) -> VarProResult:
    """Fused VarPro for d-dimensional shape spaces (the m=5 anisotropic
    lobes; d = n_params − 2). Same contract as
    :func:`brdf_tpu.solver.varpro.varpro_fit_nd`; the whole solve (grid
    init + ``iters`` d-D Kaufman-projected Newton steps) runs VMEM-resident
    with ONE analytic evaluation per step (the shading kernel returns b and
    every ∂b/∂shape_j in a single pass — the XLA tier pays 1 + d passes).
    A supplied ``p0`` skips the in-kernel grid init (chunked-resume
    semantics, like :func:`varpro_fit_pallas`)."""
    from brdf_tpu.models.brdf import MODELS

    if model not in _SEPARABLE_ND or model not in SHADING_KERNELS:
        raise ValueError(
            f"varpro_fit_pallas_nd supports {sorted(_SEPARABLE_ND)} kernel "
            f"lobes, got {model!r}"
        )
    spec = SHADING_KERNELS[model]
    mspec = MODELS[model]
    d = mspec.n_params - 2
    lo = tuple(float(x) for x in (mspec.lower if lower is None else lower))
    hi = tuple(float(x) for x in (mspec.upper if upper is None else upper))
    floors = _SEPARABLE_ND[model]
    lo_s = tuple(max(lo[2 + j], floors[j]) for j in range(d))
    hi_s = tuple(hi[2 + j] for j in range(d))
    grid_np = np.asarray(default_shape_grid(model, num=grid_points),
                         np.float64).reshape(-1, d)
    grid_np = np.clip(grid_np, np.asarray(lo_s), np.asarray(hi_s))
    grid = tuple(tuple(float(x) for x in row) for row in grid_np)

    t, v = target.shape
    if weights is None:
        weights = jnp.ones_like(target)
    pad = (-t) % block_t
    tp = t + pad

    def prep(x):   # (T, V) → (V, Tp)
        return jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))

    ang_stack = jnp.stack(
        [prep(getattr(angles, name)) for name in spec.angle_names]
    )
    y = prep(target)
    w = prep(weights)

    a = len(spec.angle_names)
    with_p0 = p0 is not None
    kernel = functools.partial(
        _varpro_nd_kernel, spec=spec, grid=grid, iters=int(iters),
        lower=lo, upper=hi, lo_s=lo_s, hi_s=hi_s, d=d, with_p0=with_p0,
    )
    vt_spec = pl.BlockSpec((v, block_t), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    rows8 = pl.BlockSpec((8, block_t), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    rows16 = pl.BlockSpec((16, block_t), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        vt_spec,
        vt_spec,
    ]
    inputs = [ang_stack, y, w]
    if with_p0:
        in_specs.append(rows8)
        inputs.append(
            jnp.pad(p0.astype(jnp.float32).T, ((0, 8 - p0.shape[-1]), (0, pad)))
        )
    out = pl.pallas_call(
        kernel,
        grid=(tp // block_t,),
        in_specs=in_specs,
        out_specs=rows16,
        out_shape=jax.ShapeDtypeStruct((16, tp), jnp.float32),
        interpret=interpret,
    )(*inputs)

    out = out[:, :t]
    return VarProResult(
        p=jnp.concatenate(
            [out[0:1], out[1:2], out[2 : 2 + d]], axis=0
        ).T,
        chi2=out[2 + d],
        iters=out[3 + d].astype(jnp.int32),
        stop=out[4 + d].astype(jnp.int32),
        g_abs=out[5 + d],
    )
