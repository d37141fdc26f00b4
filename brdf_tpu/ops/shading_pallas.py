"""Pallas TPU shading kernel with hand-derived analytic backward.

The BASELINE north star asks for "the shading kernel and its analytic
backward written in Pallas" — this module is that kernel, the TPU-native
replacement for the reference's shading evaluation both in the fit residual
(``BRDFFunc``, ``/root/reference/brdfdata.cpp:969-989``) and in the preview
renderer's per-triangle CPU loop (``glutcallbacks.cpp:344-446``).

Design (mirrors ``ops/lm_pallas.py``'s layout conventions):

- **Views-major (V, T) layout**: texels ride the 128-wide lane axis, views the
  sublane axis, so the whole lobe evaluation is dense VPU work with no
  reductions in the kernel at all (the loss/reduction composes outside).
- **Analytic VJP**: the backward kernel recomputes the forward pieces in VMEM
  (cheaper than storing V×T intermediates to HBM — the classic
  rematerialisation trade) and contracts the hand-derived partials with the
  incoming cotangent in one pass: parameter cotangents are an over-views
  reduction, angle cotangents are elementwise. One fused kernel emits both.
- **``jax.custom_vjp`` wiring**: ``shade_pallas`` differentiates like any JAX
  function — ``jax.grad`` through it reaches per-texel parameters *and* the
  shading angles, so it drops into both the plain per-texel fit and the joint
  normal-map fit (where gradients must flow through the angles into the
  normal offsets).

Every partial derivative matches the jnp models in ``models/brdf.py``
(including their clamp/mask subgradient conventions), which tests verify
against ``jax.vjp`` of the jnp model in float32 and against float64.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brdf_tpu.models.brdf import ShadingAngles

_EPS = 1e-12


class ShadingKernelSpec(NamedTuple):
    name: str
    n_params: int
    angle_names: tuple[str, ...]
    # eval(angles: tuple[(V,T)], params: tuple[(1,T)])
    #   -> (I (V,T), d_params tuple[(V,T)], d_angles tuple[(V,T)])
    # d_params[j] = ∂I/∂params[j] (per view; caller reduces over views),
    # d_angles[a] = ∂I/∂angles[a].
    eval: Callable


# ---------------------------------------------------------------------------
# Analytic forward+partials per lobe (all match models/brdf.py semantics)
# ---------------------------------------------------------------------------


def _blinn_phong_full(angles, params):
    cl, cnh = angles
    kd, ks, n = params
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(cnh, _EPS)
    ln_s = jnp.log(s)
    m = lit & (cnh > 0)
    pw = jnp.where(m, jnp.exp(n * ln_s), 0.0)
    pw_m1 = jnp.where(m, jnp.exp((n - 1.0) * ln_s), 0.0)
    i_val = kd * diff_b + ks * pw
    d_kd = diff_b
    d_ks = pw
    d_n = ks * ln_s * pw
    d_cl = kd * lit.astype(cl.dtype)
    d_cnh = ks * n * pw_m1
    return i_val, (d_kd, d_ks, d_n), (d_cl, d_cnh)


def _phong_full(angles, params):
    cl, crv = angles
    kd, ks, n = params
    lit = cl > 0
    diff_b = jnp.maximum(cl, 0.0)
    s = jnp.maximum(crv, _EPS)
    ln_s = jnp.log(s)
    m = lit & (crv > 0)
    pw = jnp.where(m, jnp.exp(n * ln_s), 0.0)
    pw_m1 = jnp.where(m, jnp.exp((n - 1.0) * ln_s), 0.0)
    two_pi = 2.0 * jnp.pi
    norm = (n + 2.0) / two_pi
    i_val = kd * diff_b + ks * norm * pw
    d_kd = diff_b
    d_ks = norm * pw
    d_n = ks * (pw / two_pi + norm * ln_s * pw)
    d_cl = kd * lit.astype(cl.dtype)
    d_crv = ks * norm * n * pw_m1
    return i_val, (d_kd, d_ks, d_n), (d_cl, d_crv)


def _ct_core(cl, cnh, cvn, ks, rough):
    """Cook-Torrance specular core ``S = ks·D·vis·nl·[nl>0]`` and its partials
    w.r.t. (ks, rough, cl, cnh, cvn). Shared by the plain and Fresnel lobes.

    Matches ``models/brdf.py::cook_torrance`` clamp-for-clamp: ``nl=max(cl,0)``,
    ``nv=max(cvn,eps)``, ``nh=max(cnh,0)``, ``r=max(rough,1e-3)``, ``a2=r⁴``,
    GGX ``D=a2/max(π u², eps)`` with ``u=nh²(a2−1)+1``, height-correlated Smith
    ``vis=0.5/max(Λv+Λl, eps)``.
    """
    nl = jnp.maximum(cl, 0.0)
    nv = jnp.maximum(cvn, _EPS)
    nh = jnp.maximum(cnh, 0.0)
    r = jnp.maximum(rough, 1e-3)
    r2 = r * r
    a2 = r2 * r2

    u = nh * nh * (a2 - 1.0) + 1.0
    du = jnp.pi * u * u
    d_clamped = du <= _EPS                      # D's denominator clamp active?
    du_s = jnp.maximum(du, _EPS)
    d = a2 / du_s
    # When the clamp is active the denominator chain has zero subgradient but
    # the numerator path (∂/∂a2 of a2/eps = 1/eps) stays live — exactly what
    # autodiff of the jnp model yields. inv_u is guarded so the dead branch
    # cannot manufacture inf·0 NaNs (u ≥ a2·nh² can approach 0 at grazing nh).
    inv_u = jnp.where(d_clamped, 0.0, 1.0 / jnp.maximum(u, _EPS))
    dd_da2 = 1.0 / du_s - 2.0 * a2 * nh * nh * inv_u / du_s
    dd_dnh = -(2.0 * a2 * inv_u / du_s) * 2.0 * nh * (a2 - 1.0)

    sv = jnp.sqrt(nv * nv * (1.0 - a2) + a2)
    sl = jnp.sqrt(nl * nl * (1.0 - a2) + a2)
    den_raw = nl * sv + nv * sl
    v_clamped = den_raw <= _EPS
    den = jnp.maximum(den_raw, _EPS)
    vis = 0.5 / den
    live_v = 1.0 - v_clamped.astype(cl.dtype)
    dden = -0.5 / (den * den) * live_v          # dvis/dden
    sv_s = jnp.maximum(sv, _EPS)
    sl_s = jnp.maximum(sl, _EPS)
    dvis_dnl = dden * (sv + nv * nl * (1.0 - a2) / sl_s)
    dvis_dnv = dden * (nl * nv * (1.0 - a2) / sv_s + sl)
    dvis_da2 = dden * (nl * (1.0 - nv * nv) / (2.0 * sv_s)
                       + nv * (1.0 - nl * nl) / (2.0 * sl_s))

    lit = (nl > 0).astype(cl.dtype)
    core = d * vis * nl * lit                   # S/ks
    s_val = ks * core

    da2_dr = 4.0 * r2 * r
    live_r = (rough > 1e-3).astype(cl.dtype)    # r-clamp subgradient
    ds_drough = ks * (dd_da2 * vis + d * dvis_da2) * nl * lit * da2_dr * live_r
    ds_dcl = ks * (d * (vis + nl * dvis_dnl)) * lit * (cl > 0).astype(cl.dtype)
    ds_dcnh = ks * dd_dnh * vis * nl * lit * (cnh > 0).astype(cl.dtype)
    ds_dcvn = ks * d * nl * dvis_dnv * lit * (cvn > _EPS).astype(cl.dtype)
    return s_val, core, nl, ds_drough, ds_dcl, ds_dcnh, ds_dcvn


def _cook_torrance_full(angles, params):
    cl, cnh, cvn = angles
    kd, ks, rough = params
    s_val, core, nl, ds_dr, ds_dcl, ds_dcnh, ds_dcvn = _ct_core(cl, cnh, cvn, ks, rough)
    inv_pi = 1.0 / jnp.pi
    i_val = kd * inv_pi * nl + s_val
    d_kd = inv_pi * nl
    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) + ds_dcl
    return i_val, (d_kd, core, ds_dr), (d_cl, ds_dcnh, ds_dcvn)


def _cook_torrance_fresnel_full(angles, params):
    cl, cnh, cvn, crv = angles
    kd, ks, rough, f0 = params
    s_val, core, nl, ds_dr, ds_dcl, ds_dcnh, ds_dcvn = _ct_core(cl, cnh, cvn, ks, rough)

    # Schlick Fresnel on the half-angle: L·V = 2(N·L)(N·V) − R·V (raw angles,
    # matching models/brdf.py::_lv_from_angles), vh = √max((1+L·V)/2, eps)
    lv = 2.0 * cl * cvn - crv
    half_raw = (1.0 + lv) / 2.0
    half = jnp.maximum(half_raw, _EPS)
    vh = jnp.sqrt(half)
    b = 1.0 - vh
    mb = b > 0
    b_s = jnp.maximum(b, _EPS)
    u5 = jnp.where(mb, b_s ** 5, 0.0)
    u4 = jnp.where(mb, b_s ** 4, 0.0)
    fres = f0 + (1.0 - f0) * u5
    # dF/dlv = (1−f0)·5(1−vh)⁴·(−dvh/dlv), dvh/dlv = 1/(4 vh) (when unclamped)
    live_h = (half_raw > _EPS).astype(cl.dtype)
    df_dlv = -(1.0 - f0) * 5.0 * u4 / (4.0 * vh) * live_h

    inv_pi = 1.0 / jnp.pi
    i_val = kd * inv_pi * nl + fres * s_val
    d_kd = inv_pi * nl
    d_ks = fres * core
    d_rough = fres * ds_dr
    d_f0 = s_val * (1.0 - u5)
    d_cl = kd * inv_pi * (cl > 0).astype(cl.dtype) + fres * ds_dcl \
        + s_val * df_dlv * 2.0 * cvn
    d_cnh = fres * ds_dcnh
    d_cvn = fres * ds_dcvn + s_val * df_dlv * 2.0 * cl
    d_crv = s_val * df_dlv * -1.0
    return i_val, (d_kd, d_ks, d_rough, d_f0), (d_cl, d_cnh, d_cvn, d_crv)


SHADING_KERNELS: dict[str, ShadingKernelSpec] = {
    "blinn_phong": ShadingKernelSpec(
        "blinn_phong", 3, ("cos_ln", "cos_nh"), _blinn_phong_full),
    "phong": ShadingKernelSpec(
        "phong", 3, ("cos_ln", "cos_rv"), _phong_full),
    "cook_torrance": ShadingKernelSpec(
        "cook_torrance", 3, ("cos_ln", "cos_nh", "cos_vn"), _cook_torrance_full),
    "cook_torrance_fresnel": ShadingKernelSpec(
        "cook_torrance_fresnel", 4, ("cos_ln", "cos_nh", "cos_vn", "cos_rv"),
        _cook_torrance_fresnel_full),
}

_P_ROWS = 8  # params padded to 8 sublanes (f32 tile alignment)


def _unpack(angles_ref, p_ref, spec):
    angles = tuple(angles_ref[a] for a in range(len(spec.angle_names)))
    params = tuple(p_ref[j : j + 1, :] for j in range(spec.n_params))
    return angles, params


def _fwd_kernel(angles_ref, p_ref, out_ref, *, spec: ShadingKernelSpec):
    angles, params = _unpack(angles_ref, p_ref, spec)
    i_val, _, _ = spec.eval(angles, params)
    out_ref[...] = i_val


def _bwd_kernel(angles_ref, p_ref, ct_ref, dp_ref, dang_ref, *, spec):
    angles, params = _unpack(angles_ref, p_ref, spec)
    _, d_params, d_angles = spec.eval(angles, params)
    ct = ct_ref[...]
    for j in range(spec.n_params):
        dp_ref[j : j + 1, :] = jnp.sum(d_params[j] * ct, axis=0, keepdims=True)
    for j in range(spec.n_params, _P_ROWS):
        dp_ref[j : j + 1, :] = jnp.zeros_like(p_ref[0:1, :])
    for a in range(len(spec.angle_names)):
        dang_ref[a] = d_angles[a] * ct


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def _shade_vt(model: str, ang_stack, p_rows, block_t: int, interpret: bool):
    """Views-major core: angles (A, V, Tp), params (8, Tp) → I (V, Tp)."""
    return _shade_vt_fwd(model, ang_stack, p_rows, block_t, interpret)[0]


def _specs_for(a: int, v: int, block_t: int):
    return [
        pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((_P_ROWS, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]


def _shade_vt_fwd(model, ang_stack, p_rows, block_t, interpret):
    spec = SHADING_KERNELS[model]
    a, v, tp = ang_stack.shape
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec=spec),
        grid=(tp // block_t,),
        in_specs=_specs_for(a, v, block_t),
        out_specs=pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((v, tp), jnp.float32),
        interpret=interpret,
    )(ang_stack, p_rows)
    return out, (ang_stack, p_rows)


def _shade_vt_bwd(model, block_t, interpret, res, ct):
    spec = SHADING_KERNELS[model]
    ang_stack, p_rows = res
    a, v, tp = ang_stack.shape
    dp, dang = pl.pallas_call(
        functools.partial(_bwd_kernel, spec=spec),
        grid=(tp // block_t,),
        in_specs=_specs_for(a, v, block_t)
        + [pl.BlockSpec((v, block_t), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((_P_ROWS, block_t), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((a, v, block_t), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((_P_ROWS, tp), jnp.float32),
            jax.ShapeDtypeStruct((a, v, tp), jnp.float32),
        ],
        interpret=interpret,
    )(ang_stack, p_rows, ct)
    return dang, dp


_shade_vt.defvjp(_shade_vt_fwd, _shade_vt_bwd)


@functools.partial(jax.jit, static_argnames=("model", "block_t", "interpret"))
def shade_pallas(
    model: str,
    params: jnp.ndarray,        # (T, P)
    angles: ShadingAngles,      # channels (T, V)
    block_t: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Shade T texels under V lights: the Pallas twin of
    ``models.brdf.brdf_eval`` with analytic forward *and* backward.

    Differentiable w.r.t. ``params`` and every ``angles`` channel via the
    hand-derived VJP kernels (no autodiff inside). Public layout is
    texel-major like the rest of the framework; the wrapper transposes to the
    kernel's views-major layout and pads T to ``block_t`` (the pad's
    cotangents are sliced away by construction).
    """
    spec = SHADING_KERNELS[model]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, v = angles.cos_ln.shape
    block_t = min(block_t, _ceil_to(t, 128))
    pad = (-t) % block_t
    tp = t + pad

    def prep(x):  # (T, V) → (V, Tp)
        return jnp.pad(x.astype(jnp.float32).T, ((0, 0), (0, pad)))

    ang_stack = jnp.stack([prep(getattr(angles, name)) for name in spec.angle_names])
    p_rows = jnp.pad(
        params.astype(jnp.float32).T, ((0, _P_ROWS - spec.n_params), (0, pad))
    )
    out = _shade_vt(model, ang_stack, p_rows, block_t, interpret)
    return out[:, :t].T


def _ceil_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
