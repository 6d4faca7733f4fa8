"""Staggered operator tests vs analytic/dense oracles.

Mirrors the reference's test strategy (SURVEY.md §4): analytic unit
oracles -- anti-hermiticity, eo/full consistency, Dslash vs dense matrix
on a tiny lattice (reference pattern: tests/base + stagD flop checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.physics import stag_solve, staggered as st
from qex_tpu.solvers import cg
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def setup(lat):
    key = jax.random.PRNGKey(7)
    ku, kx, ky = jax.random.split(key, 3)
    u = group.random_su(ku, lat.dims, lat.nc, DT)
    u = jnp.stack([group.random_su(jax.random.fold_in(ku, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    x = jax.random.normal(kx, lat.vector_shape()) + 1j * jax.random.normal(
        jax.random.fold_in(kx, 1), lat.vector_shape())
    y = jax.random.normal(ky, lat.vector_shape()) + 1j * jax.random.normal(
        jax.random.fold_in(ky, 1), lat.vector_shape())
    g = st.phase_links(lat, u, bc="pppp")
    return u, g, x.astype(DT), y.astype(DT)


def test_dslash_antihermitian(lat, setup):
    u, g, x, y = setup
    dx = st.dslash_full(lat, g, x)
    dy = st.dslash_full(lat, g, y)
    lhs = linalg.dot(y, dx)
    rhs = -jnp.conj(linalg.dot(x, dy))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)


def test_dslash_parity_structure(lat, setup):
    """Dslash maps even sites to odd and vice versa (no same-parity term)."""
    u, g, x, y = setup
    xe, xo = eo.pack(x, lat.nd)
    x_even_only = eo.unpack(xe, jnp.zeros_like(xo), lat.nd)
    d = st.dslash_full(lat, g, x_even_only)
    de, do = eo.pack(d, lat.nd)
    assert float(linalg.norm2(de)) < 1e-24
    assert float(linalg.norm2(do)) > 1e-6


def test_eo_matches_full(lat, setup):
    u, g, x, y = setup
    m = 0.25
    s = st.new_stag_eo(lat, u, bc="pppp")
    xe, xo = eo.pack(x, lat.nd)
    # full operator
    d_full = st.d_full(lat, g, x, m)
    de_ref, do_ref = eo.pack(d_full, lat.nd)
    # eo operator: (Dx)_e = m x_e + D_eo x_o ; (Dx)_o = m x_o + D_oe x_e
    de = m * xe + st.dslash_eo(s, xo, parity_out=0)
    do = m * xo + st.dslash_eo(s, xe, parity_out=1)
    assert float(linalg.norm2(de - de_ref)) < 1e-20 * float(linalg.norm2(de_ref))
    assert float(linalg.norm2(do - do_ref)) < 1e-20 * float(linalg.norm2(do_ref))


def test_dslash_vs_dense(setup):
    """Dense-matrix oracle on 2x2x2x4 (V=32): build D columnwise and
    compare with matrix application (reference pattern: Dslash vs dense
    on tiny lattices, SURVEY.md §4)."""
    lat = Lattice((2, 2, 2, 4))
    key = jax.random.PRNGKey(3)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    g = st.phase_links(lat, u, bc="pppp")
    n = lat.nc * lat.volume
    cols = []
    for j in range(n):
        e = jnp.zeros((n,), DT).at[j].set(1.0).reshape(lat.vector_shape())
        cols.append(np.asarray(st.dslash_full(lat, g, e)).reshape(n))
    dmat = np.stack(cols, axis=1)
    # anti-hermiticity of the dense matrix
    assert np.abs(dmat + dmat.conj().T).max() < 1e-12
    # random vector application matches
    x = jax.random.normal(key, (n,)) + 1j * jax.random.normal(
        jax.random.fold_in(key, 9), (n,))
    dx = st.dslash_full(lat, g, x.astype(DT).reshape(lat.vector_shape()))
    ref = dmat @ np.asarray(x)
    assert np.abs(np.asarray(dx).reshape(n) - ref).max() < 1e-12


def test_d2ee_hpd(lat, setup):
    u, g, x, y = setup
    m = 0.3
    s = st.new_stag_eo(lat, u, bc="pppp")
    xe, _ = eo.pack(x, lat.nd)
    ye, _ = eo.pack(y, lat.nd)
    ax = st.d2ee(s, xe, m)
    ay = st.d2ee(s, ye, m)
    # hermitian
    lhs = linalg.dot(ye, ax)
    rhs = jnp.conj(linalg.dot(xe, ay))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)
    # positive definite: <x, A x> >= m^2 |x|^2
    q = linalg.redot(xe, ax)
    assert float(q) >= m * m * float(linalg.norm2(xe))


def test_solve_full(lat, setup):
    u, g, x, y = setup
    m = 0.1
    s = st.new_stag_eo(lat, u, bc="pppp")
    b = x
    sol, stats = stag_solve.solve(s, b, m, SolverParams(r2req=1e-16))
    r = st.d_full(lat, g, sol, m) - b
    rel = float(linalg.norm2(r)) / float(linalg.norm2(b))
    assert rel < 1e-12, f"relative residual^2 {rel}, its={stats.iterations}"


def test_multishift_matches_single(lat, setup):
    u, g, x, y = setup
    s = st.new_stag_eo(lat, u, bc="pppp")
    be, _ = eo.pack(x, lat.nd)
    masses = [0.1, 0.3, 0.7]
    xs, stats = stag_solve.solve_multi(s, be, masses,
                                       SolverParams(r2req=1e-18))
    for m, xi in zip(masses, xs):
        ri = st.d2ee(s, xi, m) - be
        rel = float(linalg.norm2(ri)) / float(linalg.norm2(be))
        assert rel < 1e-12, f"m={m}: rel r2 {rel}"


def test_flop_model():
    assert st.dslash_flops_per_site(4, 3) == 594
