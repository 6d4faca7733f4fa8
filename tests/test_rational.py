"""Remez rational approximation tests.

Oracle: dense-grid comparison against the exact power function, and
operator-function application vs eigendecomposition on a small SPD
matrix (replacing trust in QEX's static rational.nim table with direct
verification).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.solvers.rational import rational_approx


def test_inv_sqrt_accuracy():
    ra = rational_approx(-1, 2, 1e-3, 1.0, degree=14)
    x = np.logspace(-3, 0, 4001)
    rel = np.abs(ra(x) * np.sqrt(x) - 1.0)
    assert rel.max() < 5e-9, rel.max()
    assert ra.max_rel_err < 5e-9
    # poles must be positive (shifts for multishift CG on PSD operator)
    assert all(p > 0 for p in ra.poles)
    # minimax: reported error is tight (within 10x of grid max)
    assert rel.max() < 10 * ra.max_rel_err


@pytest.mark.parametrize("num,den", [(1, 4), (-1, 4), (3, 8), (-3, 8),
                                     (1, 8)])
def test_various_powers(num, den):
    lo, hi = 1e-2, 17.0
    ra = rational_approx(num, den, lo, hi, degree=9)
    x = np.logspace(np.log10(lo), np.log10(hi), 2001)
    rel = np.abs(ra(x) / np.power(x, num / den) - 1.0)
    assert rel.max() < 1e-6, (num, den, rel.max())


def test_apply_matches_eigendecomposition():
    """r(A) b via multishift CG == f(A) b from eigendecomposition."""
    rng = np.random.default_rng(0)
    n = 24
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    evals = np.linspace(0.05, 3.0, n)
    a = (q * evals) @ q.T
    b = rng.normal(size=(n,))
    ra = rational_approx(-1, 2, 0.04, 3.5, degree=12)
    aj = jnp.asarray(a)
    bj = jnp.asarray(b)
    x, stats = ra.apply(lambda v: aj @ v, bj, r2req=1e-28, maxits=500)
    ref = (q * (evals ** -0.5)) @ q.T @ b
    err = np.abs(np.asarray(x) - ref).max() / np.abs(ref).max()
    assert err < 1e-7, err


def test_rooted_roundtrip():
    """A^{+1/8} then A^{-1/4} then A^{+1/8} == identity (the
    heatbath/action consistency used by rooted staggered HMC)."""
    rng = np.random.default_rng(1)
    n = 16
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    evals = np.linspace(0.1, 2.0, n)
    a = jnp.asarray((q * evals) @ q.T)
    b = jnp.asarray(rng.normal(size=(n,)))
    up = rational_approx(1, 8, 0.05, 2.5, degree=10)
    dn = rational_approx(-1, 4, 0.05, 2.5, degree=10)
    y1, _ = up.apply(lambda v: a @ v, b, r2req=1e-28)
    y2, _ = dn.apply(lambda v: a @ v, y1, r2req=1e-28)
    y3, _ = up.apply(lambda v: a @ v, y2, r2req=1e-28)
    err = float(jnp.max(jnp.abs(y3 - b))) / float(jnp.max(jnp.abs(b)))
    assert err < 1e-6, err
