"""Tests for the dense Ax=b solver suite (``solver/axb.py``) — the TPU-native
equivalent of levmar's interchangeable linear solvers (``levmar/Axb_core.c``,
public ``dAx_eq_b_*`` API ``levmar.h:316-343``), with emphasis on the
Bunch-Kaufman LDLᵀ that levmar uses as its default (``Axb_core.c:1001``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from brdf_tpu.solver.axb import (
    ax_eq_b_chol,
    ax_eq_b_ldlt,
    ax_eq_b_lu,
    ax_eq_b_qr,
    ax_eq_b_qrls,
    ax_eq_b_svd,
    ldlt_bk,
)

SOLVERS = {
    "qr": ax_eq_b_qr,
    "chol": ax_eq_b_chol,
    "lu": ax_eq_b_lu,
    "svd": ax_eq_b_svd,
    "ldlt": ax_eq_b_ldlt,
}


def _spd(rng, n, dtype):
    m = rng.normal(size=(n, n))
    return jnp.asarray(m @ m.T + n * np.eye(n), dtype)


def _sym_indefinite(rng, n, dtype):
    m = rng.normal(size=(n, n))
    a = (m + m.T) / 2
    # force strong indefiniteness: shift eigenvalues to straddle zero
    w, v = np.linalg.eigh(a)
    w = w - np.median(w)
    w[np.abs(w) < 0.3] = 0.3 * np.sign(w[np.abs(w) < 0.3] + 1e-30)
    return jnp.asarray((v * w) @ v.T, dtype)


@pytest.mark.parametrize("name", sorted(SOLVERS))
@pytest.mark.parametrize("n", [1, 2, 3, 5, 8])
def test_solvers_match_numpy_spd(name, n):
    rng = np.random.default_rng(n)
    a = _spd(rng, n, jnp.float64)
    b = jnp.asarray(rng.normal(size=(n,)))
    x = SOLVERS[name](a, b)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", ["qr", "lu", "svd", "ldlt"])
@pytest.mark.parametrize("n", [2, 3, 5, 8, 12])
def test_solvers_match_numpy_indefinite(name, n):
    """Cholesky legitimately fails on indefinite A; the general solvers and
    the Bunch-Kaufman LDLᵀ must not."""
    rng = np.random.default_rng(100 + n)
    a = _sym_indefinite(rng, n, jnp.float64)
    assert np.linalg.eigvalsh(a).min() < 0  # really indefinite
    b = jnp.asarray(rng.normal(size=(n,)))
    x = SOLVERS[name](a, b)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b), rtol=1e-8, atol=1e-8)


def test_qrls_least_squares():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(12, 4)))
    b = jnp.asarray(rng.normal(size=(12,)))
    x = ax_eq_b_qrls(a, b)
    ref, *_ = np.linalg.lstsq(np.asarray(a), np.asarray(b), rcond=None)
    np.testing.assert_allclose(np.asarray(x), ref, rtol=1e-9, atol=1e-9)


def test_ldlt_factorization_reconstructs():
    """L D Lᵀ == A[perm][:, perm] with unit-lower L and 1×1/2×2 block D."""
    rng = np.random.default_rng(7)
    for n in (2, 3, 4, 6, 9):
        a = _sym_indefinite(rng, n, jnp.float64)
        lmat, d0, d1, b2, perm = ldlt_bk(a)
        lmat, d0, d1, b2, perm = map(np.asarray, (lmat, d0, d1, b2, perm))
        # L is unit lower triangular
        np.testing.assert_allclose(np.triu(lmat, 1), 0, atol=0)
        np.testing.assert_allclose(np.diag(lmat), 1, atol=0)
        # assemble D
        d = np.diag(d0)
        for k in np.nonzero(b2)[0]:
            d[k + 1, k] = d[k, k + 1] = d1[k]
            # the (k+1, k) entry of L is zero inside a 2×2 block
            assert lmat[k + 1, k] == 0
        rec = lmat @ d @ lmat.T
        ap = np.asarray(a)[perm][:, perm]
        np.testing.assert_allclose(rec, ap, rtol=1e-10, atol=1e-10)
        # boundedness: Bunch-Kaufman keeps |L| modest (growth-factor bound)
        assert np.abs(lmat).max() < 1e3


def test_ldlt_stable_where_unpivoted_explodes():
    """The classic near-zero-diagonal 2×2: unpivoted LDLᵀ divides by ε and
    explodes in float32; Bunch-Kaufman takes a 2×2 pivot and stays exact.
    This is *why* levmar defaults to BK (``lm_core.c:301-306``)."""
    eps = 1e-7
    a64 = np.array([[eps, 1.0], [1.0, eps]])
    b64 = np.array([1.0, 2.0])
    x32 = ax_eq_b_ldlt(jnp.asarray(a64, jnp.float32), jnp.asarray(b64, jnp.float32))
    ref = np.linalg.solve(a64, b64)
    np.testing.assert_allclose(np.asarray(x32), ref, rtol=1e-5)
    # and the factorization chose a 2×2 block
    _, _, _, b2, _ = ldlt_bk(jnp.asarray(a64))
    assert bool(np.asarray(b2)[0])


def test_ldlt_vmapped_batch_matches_loop():
    rng = np.random.default_rng(3)
    n, batch = 5, 32
    mats = np.stack([np.asarray(_sym_indefinite(rng, n, jnp.float64)) for _ in range(batch)])
    bs = rng.normal(size=(batch, n))
    xs = jax.vmap(ax_eq_b_ldlt)(jnp.asarray(mats), jnp.asarray(bs))
    for i in range(batch):
        np.testing.assert_allclose(
            np.asarray(xs[i]), np.linalg.solve(mats[i], bs[i]), rtol=1e-8, atol=1e-8
        )


def test_ldlt_float32_accuracy():
    rng = np.random.default_rng(11)
    n = 6
    a = _sym_indefinite(rng, n, jnp.float64)
    b = rng.normal(size=(n,))
    x32 = ax_eq_b_ldlt(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
    ref = np.linalg.solve(np.asarray(a), b)
    np.testing.assert_allclose(np.asarray(x32), ref, rtol=5e-4, atol=5e-4)


def test_ldlt_singular_signals_nonfinite():
    """A singular system must come back non-finite (the levmar
    solver-failure signal the LM loop converts to a rejected step,
    ``lmbc_core.c:694-700``), not silently wrong."""
    a = jnp.zeros((3, 3), jnp.float64)
    b = jnp.ones((3,), jnp.float64)
    x = ax_eq_b_ldlt(a, b)
    assert not bool(jnp.isfinite(x).all())


def test_lm_linsolver_ldlt_matches_cholesky():
    """levmar_bc with linsolver='ldlt' (the levmar default BK path) reaches
    the same minimum as the Cholesky default on a golden problem."""
    from brdf_tpu.solver.lm import LMOptions, levmar_bc
    from brdf_tpu.solver.problems import PROBLEMS

    prob = next(p for p in PROBLEMS if p.name == "hs01_box")
    lower = jnp.asarray(prob.lower, jnp.float64)
    upper = jnp.asarray(prob.upper, jnp.float64)
    p0 = jnp.asarray(prob.p0, jnp.float64)
    res_c = levmar_bc(prob.residual, p0, lower, upper,
                      opts=LMOptions(itmax=300, linsolver="cholesky"))
    res_l = levmar_bc(prob.residual, p0, lower, upper,
                      opts=LMOptions(itmax=300, linsolver="ldlt"))
    np.testing.assert_allclose(np.asarray(res_l.p), np.asarray(res_c.p), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(res_l.p), np.asarray(prob.p_star), rtol=1e-4, atol=1e-6)
