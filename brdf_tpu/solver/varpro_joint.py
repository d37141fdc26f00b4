"""Variable projection for the m=9 JOINT normal-map fit (config 4).

The joint parameter vector [kd_rgb, ks_rgb, σ, ou, ov] is separable too:
given the nonlinear triple α = (σ, ou, ov), every channel's (kd_c, ks_c)
solves a 2-variable box-constrained least squares against the SHARED bases

    a(α) = diffuse lobe at the perturbed normal      (σ-independent)
    b(α) = unit-ks specular lobe at (σ, perturbed normal)

so the 9-parameter problem profiles down to 3-D Newton on

    φ(α) = Σ_c min_{kd_c,ks_c ∈ box} ‖y_c − kd_c·a(α) − ks_c·b(α)‖²_w.

Per iteration: one basis evaluation + three JVPs (∂(a,b)/∂α_j), three
closed-form BVLS solves sharing one Gram matrix, a Kaufman-projected 3×3
Gauss-Newton system solved by Cramer, and a trust-clipped accept-if-better
step — all elementwise/batched, FIXED iteration count (the same cost model
that made the m=3 VarPro the bench headline). The LM tiers
(``fit_joint_normalmap`` engines "xla"/"pallas") remain the general path;
this tier is their measured alternative for separable base lobes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import MODELS
from brdf_tpu.models.normalmap import (
    JointSpec,
    joint_p0_from_channelwise,
    joint_spec,
    perturbed_angles,
)
from brdf_tpu.solver.varpro import _SEPARABLE, _bvls2

_TINY = 1e-30


class JointVarProResult(NamedTuple):
    p: jnp.ndarray       # (T, 9)
    chi2: jnp.ndarray    # (T,)
    iters: jnp.ndarray   # (T,) accepted steps
    stop: jnp.ndarray    # (T,) 2 = converged (trust collapsed), 3 = k done
    g_inf: jnp.ndarray   # (T,) ‖∇φ‖∞ at the final point


def _solve3(h, g):
    """Batched 3×3 Cramer solve ``dα = −H⁻¹ g`` (h dict of (j,k) entries)."""
    c00 = h[(1, 1)] * h[(2, 2)] - h[(1, 2)] * h[(1, 2)]
    c01 = h[(0, 2)] * h[(1, 2)] - h[(0, 1)] * h[(2, 2)]
    c02 = h[(0, 1)] * h[(1, 2)] - h[(0, 2)] * h[(1, 1)]
    c11 = h[(0, 0)] * h[(2, 2)] - h[(0, 2)] * h[(0, 2)]
    c12 = h[(0, 1)] * h[(0, 2)] - h[(0, 0)] * h[(1, 2)]
    c22 = h[(0, 0)] * h[(1, 1)] - h[(0, 1)] * h[(0, 1)]
    det = h[(0, 0)] * c00 + h[(0, 1)] * c01 + h[(0, 2)] * c02
    ok = jnp.abs(det) > _TINY
    inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
    d0 = -(c00 * g[0] + c01 * g[1] + c02 * g[2]) * inv
    d1 = -(c01 * g[0] + c11 * g[1] + c12 * g[2]) * inv
    d2 = -(c02 * g[0] + c12 * g[1] + c22 * g[2]) * inv
    return (d0, d1, d2), ok


def varpro_fit_joint(
    base_model: str,
    geom,                      # ShadingGeometry (T texels)
    target: jnp.ndarray,       # (T, V, 3)
    weights: jnp.ndarray | None = None,   # (T, V) or per-channel (T, V, 3)
    channel_params: jnp.ndarray | None = None,   # (T, 3, 3) per-channel init
    iters: int = 12,
    max_tilt: float = 0.6,
) -> tuple[JointVarProResult, JointSpec]:
    """Joint normal + material fit by 3-D profiled Newton."""
    if base_model not in _SEPARABLE:
        raise ValueError(
            f"joint varpro needs a separable base lobe, got {base_model!r}"
        )
    res = _impl(base_model, geom, target, weights, channel_params,
                int(iters), float(max_tilt))
    return res, joint_spec(base_model, max_tilt=max_tilt)


@functools.partial(
    jax.jit,
    static_argnames=("base_model", "iters", "max_tilt"),
)
def _impl(
    base_model, geom, target, weights, channel_params, iters, max_tilt
) -> JointVarProResult:
    base = MODELS[base_model]
    dtype = target.dtype
    t_count, v, _ = target.shape
    if weights is None:
        weights = jnp.ones(target.shape[:2], dtype)
    w = weights.astype(dtype)                     # (T, V) or (T, V, 3)
    # per-channel weights: channels are independent measurements, so a
    # per-channel saturation/IRLS mask makes the Gram per-channel too
    w3 = w[..., None] if w.ndim == 2 else w       # broadcasts to (T, V, 3)
    w3 = jnp.broadcast_to(w3, target.shape)
    yw = target * w3                              # (T, V, 3)

    use_log = _SEPARABLE[base_model] == "log"
    sig_floor = max(base.lower[2], 0.25) if use_log else max(base.lower[2], 1e-6)
    s_lo = float(np.log(sig_floor)) if use_log else float(sig_floor)
    s_hi = float(np.log(base.upper[2])) if use_log else float(base.upper[2])
    lo_a = jnp.asarray([s_lo, -max_tilt, -max_tilt], dtype)
    hi_a = jnp.asarray([s_hi, max_tilt, max_tilt], dtype)
    span = float(
        np.sqrt((s_hi - s_lo) ** 2 + 2 * (2 * max_tilt) ** 2)
    )
    l0, u0 = float(base.lower[0]), float(base.upper[0])
    l1, u1 = float(base.lower[1]), float(base.upper[1])

    if channel_params is None:
        from brdf_tpu.models.brdf import angles_from_geometry
        from brdf_tpu.solver.init import linear_grid_init

        ang0 = angles_from_geometry(geom)

        def init_one(tc, wc):
            return linear_grid_init(base_model, ang0, tc, weights=wc)

        channel_params = jax.vmap(init_one, in_axes=-1, out_axes=1)(target, w3)
    p0 = joint_p0_from_channelwise(channel_params)          # (T, 9)
    sig0 = jnp.clip(p0[..., 6], sig_floor, base.upper[2])
    t0_sig = jnp.log(sig0) if use_log else sig0

    def bases(alpha):
        """α (T, 3) → (a, b) each (T, V)."""
        sig = jnp.exp(alpha[..., 0]) if use_log else alpha[..., 0]
        ang = perturbed_angles(geom, alpha[..., 1], alpha[..., 2])
        one = jnp.ones_like(sig)
        zero = jnp.zeros_like(sig)
        a = base.fn(jnp.stack([one, zero, sig], -1), ang)
        b = base.fn(jnp.stack([zero, one, sig], -1), ang)
        return a, b

    def chi2_at(alpha):
        """Profiled χ² only (no derivatives) — the multi-start scorer."""
        a, b = bases(alpha)
        chi2 = jnp.zeros(alpha.shape[:-1], dtype)
        for c in range(3):
            wc = w3[..., c]
            aw = a * wc
            bw = b * wc
            aa = jnp.sum(aw * aw, -1)
            ab = jnp.sum(aw * bw, -1)
            bb = jnp.sum(bw * bw, -1)
            ay = jnp.sum(aw * yw[..., c], -1)
            by = jnp.sum(bw * yw[..., c], -1)
            kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
            rw = yw[..., c] - kd[..., None] * aw - ks[..., None] * bw
            chi2 = chi2 + jnp.sum(rw * rw, -1)
        return chi2

    def eval_at(alpha):
        """φ, ∇φ (3), projected-GN H (3×3 upper), per-channel (kd, ks).

        Per-channel weights make the (a, b) Gram per-channel, so the BVLS
        and the Kaufman projection run inside the channel loop."""
        (a, b), tangents = (bases(alpha), [])
        for j in range(3):
            e = jnp.zeros_like(alpha).at[..., j].set(1.0)
            _, (da_j, db_j) = jax.jvp(bases, (alpha,), (e,))
            tangents.append((da_j, db_j))

        chi2 = jnp.zeros(alpha.shape[:-1], dtype)
        g = [jnp.zeros_like(chi2) for _ in range(3)]
        h = {(j, k): jnp.zeros_like(chi2) for j in range(3) for k in range(j, 3)}
        kds, kss = [], []
        for c in range(3):
            wc = w3[..., c]
            aw = a * wc
            bw = b * wc
            aa = jnp.sum(aw * aw, -1)
            ab = jnp.sum(aw * bw, -1)
            bb = jnp.sum(bw * bw, -1)
            det = aa * bb - ab * ab
            det_ok = det > _TINY
            det_s = jnp.where(det_ok, det, 1.0)

            def project(u):
                """u (T,V) → component ⊥ span{aw, bw} (per texel, channel c)."""
                ua = jnp.sum(u * aw, -1)
                ub = jnp.sum(u * bw, -1)
                x1 = jnp.where(det_ok, (bb * ua - ab * ub) / det_s, 0.0)
                x2 = jnp.where(det_ok, (aa * ub - ab * ua) / det_s, 0.0)
                return u - x1[..., None] * aw - x2[..., None] * bw

            ay = jnp.sum(aw * yw[..., c], -1)
            by = jnp.sum(bw * yw[..., c], -1)
            kd, ks = _bvls2(aa, ab, bb, ay, by, l0, u0, l1, u1)
            kds.append(kd)
            kss.append(ks)
            rw = yw[..., c] - kd[..., None] * aw - ks[..., None] * bw
            chi2 = chi2 + jnp.sum(rw * rw, -1)
            u_cols = []
            for j in range(3):
                da_j, db_j = tangents[j]
                u = (kd[..., None] * da_j + ks[..., None] * db_j) * wc
                g[j] = g[j] - 2.0 * jnp.sum(rw * u, -1)
                u_cols.append(project(u))
            for j in range(3):
                for k in range(j, 3):
                    h[(j, k)] = h[(j, k)] + 2.0 * jnp.sum(
                        u_cols[j] * u_cols[k], -1
                    )
        return chi2, g, h, jnp.stack(kds, -1), jnp.stack(kss, -1)

    # Offset multi-start: the profiled landscape over (ou, ov) has local
    # minima (a wrong normal can half-explain the data with a rougher,
    # brighter lobe), and a single (0, 0) start strands ~10-15% of lanes
    # whose true tilt is large (measured: χ² p90 5e-3, normal-error p90
    # 15° on the synthetic roundtrip). Nine offset candidates spaced to
    # put every |offset| ≤ max_tilt inside a Newton basin fix the tail for
    # nine extra profiled evaluations — the same medicine as the 1-D
    # shape grid in linear_grid_init.
    step_o = 0.55 * max_tilt
    alpha0 = None
    chi2_best = None
    for du in (-step_o, 0.0, step_o):
        for dv in (-step_o, 0.0, step_o):
            cand = jnp.stack(
                [t0_sig, jnp.full_like(t0_sig, du),
                 jnp.full_like(t0_sig, dv)], axis=-1
            )
            c = chi2_at(cand)
            if alpha0 is None:
                alpha0, chi2_best = cand, c
            else:
                better = c < chi2_best
                alpha0 = jnp.where(better[..., None], cand, alpha0)
                chi2_best = jnp.where(better, c, chi2_best)

    chi2_0, g0, h0, kd0, ks0 = eval_at(alpha0)

    def body(carry, _):
        (alpha, chi2_b, g_b, h_b, kd_b, ks_b, trust, n_acc) = carry
        # Levenberg-style floor keeps the 3×3 solvable off-rank
        lam = 1e-6 * (h_b[(0, 0)] + h_b[(1, 1)] + h_b[(2, 2)]) + _TINY
        h_d = dict(h_b)
        for j in range(3):
            h_d[(j, j)] = h_b[(j, j)] + lam
        (d0, d1, d2), ok3 = _solve3(h_d, g_b)
        step = jnp.stack([d0, d1, d2], -1)
        nrm = jnp.linalg.norm(step, axis=-1, keepdims=True)
        scale = jnp.minimum(1.0, trust[..., None] / jnp.maximum(nrm, _TINY))
        step = jnp.where(ok3[..., None], step * scale, 0.0)
        alpha_n = jnp.clip(alpha + step, lo_a, hi_a)
        chi2_n, g_n, h_n, kd_n, ks_n = eval_at(alpha_n)
        okn = (chi2_n < chi2_b) & jnp.isfinite(chi2_n)
        sel = lambda n, b: jnp.where(okn, n, b)
        sel3 = lambda n, b: jnp.where(okn[..., None], n, b)
        g_out = [sel(g_n[j], g_b[j]) for j in range(3)]
        h_out = {k: sel(h_n[k], h_b[k]) for k in h_b}
        return (
            sel3(alpha_n, alpha), sel(chi2_n, chi2_b), g_out, h_out,
            sel3(kd_n, kd_b), sel3(ks_n, ks_b),
            jnp.where(okn, jnp.minimum(trust * 2.0, span), trust * 0.25),
            n_acc + okn.astype(jnp.int32),
        ), None

    trust0 = jnp.full(alpha0.shape[:-1], 0.2 * span, dtype)
    carry0 = (alpha0, chi2_0, g0, h0, kd0, ks0, trust0,
              jnp.zeros(alpha0.shape[:-1], jnp.int32))
    (alpha_f, chi2_f, g_f, _, kd_f, ks_f, trust_f, n_acc), _ = jax.lax.scan(
        body, carry0, None, length=iters
    )

    sig = jnp.exp(alpha_f[..., 0]) if use_log else alpha_f[..., 0]
    p = jnp.concatenate(
        [kd_f, ks_f, sig[..., None], alpha_f[..., 1:2], alpha_f[..., 2:3]],
        axis=-1,
    ).astype(dtype)
    converged = trust_f < 1e-6 * span
    g_inf = jnp.maximum(jnp.maximum(jnp.abs(g_f[0]), jnp.abs(g_f[1])),
                        jnp.abs(g_f[2]))
    return JointVarProResult(
        p=p, chi2=jnp.maximum(chi2_f, 0.0), iters=n_acc,
        stop=jnp.where(converged, jnp.int32(2), jnp.int32(3)),
        g_inf=g_inf,
    )
