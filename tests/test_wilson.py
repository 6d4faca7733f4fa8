"""Wilson operator tests: gamma algebra, gamma5-hermiticity, dense
oracle, free-field dispersion, CGNE solve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import wilson as wl
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def setup(lat):
    key = jax.random.PRNGKey(19)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    psi = (jax.random.normal(key, lat.dirac_shape())
           + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                    lat.dirac_shape())).astype(DT)
    chi = (jax.random.normal(jax.random.fold_in(key, 2), lat.dirac_shape())
           + 1j * jax.random.normal(jax.random.fold_in(key, 3),
                                    lat.dirac_shape())).astype(DT)
    return u, psi, chi


def test_gamma_algebra():
    g = wl.gamma_matrices()
    for mu in range(4):
        # hermitian and squaring to 1
        assert np.allclose(g[mu], g[mu].conj().T)
        assert np.allclose(g[mu] @ g[mu], np.eye(4))
        for nu in range(mu + 1, 4):
            assert np.allclose(g[mu] @ g[nu] + g[nu] @ g[mu],
                               np.zeros((4, 4)))
    assert np.allclose(g[4], np.diag([1, 1, -1, -1]))


def test_gamma5_hermiticity(lat, setup):
    u, psi, chi = setup
    w = wl.new_wilson(lat, u, m=0.1, bc="pppp")
    lhs = linalg.dot(chi, wl.wilson_d(w, psi))
    rhs = jnp.conj(linalg.dot(psi, wl.wilson_d_dag(w, chi)))
    assert abs(lhs - rhs) < 1e-10 * abs(lhs)
    # D^dag D hermitian positive
    q = linalg.redot(psi, wl.wilson_ddagd(w, psi))
    assert float(q) > 0


def test_free_field_unit_gauge(lat):
    """On unit gauge, D acting on a momentum plane wave has the known
    Wilson dispersion eigen-structure: for p=0, D psi = m psi for
    constant psi."""
    u = group.unit_gauge(lat, DT)
    w = wl.new_wilson(lat, u, m=0.3, bc="pppp")
    psi = jnp.ones(lat.dirac_shape(), DT)
    d = wl.wilson_d(w, psi)
    # constant field: hop term = (1/2)sum[(1-g)+(1+g)] psi = nd psi
    # -> D psi = (nd + m) psi - nd psi = m psi
    dev = linalg.norm2(d - 0.3 * psi)
    assert float(dev) < 1e-20


def test_dense_oracle_small():
    """Columnwise dense matrix on 2x2x2x2: gamma5-hermiticity of the
    full matrix (the strongest structural check)."""
    lat = Lattice((2, 2, 2, 2))
    key = jax.random.PRNGKey(5)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    w = wl.new_wilson(lat, u, m=0.2, bc="pppp")
    n = 4 * lat.nc * lat.volume
    cols = []
    for j in range(n):
        e = jnp.zeros((n,), DT).at[j].set(1.0).reshape(lat.dirac_shape())
        cols.append(np.asarray(wl.wilson_d(w, e)).reshape(n))
    dmat = np.stack(cols, axis=1)
    g5 = np.kron(np.diag([1, 1, -1, -1]),
                 np.eye(lat.nc * lat.volume)).reshape(
        4, lat.nc * lat.volume, 4, lat.nc * lat.volume)
    # build g5 in the same flattening (spin slowest)
    g5m = np.zeros((n, n), complex)
    block = lat.nc * lat.volume
    for s, sgn in enumerate([1, 1, -1, -1]):
        g5m[s * block:(s + 1) * block, s * block:(s + 1) * block] = \
            sgn * np.eye(block)
    assert np.abs(g5m @ dmat @ g5m - dmat.conj().T).max() < 1e-12


def test_cgne_solve(lat, setup):
    u, psi, chi = setup
    w = wl.new_wilson(lat, u, m=0.3, bc="pppa")
    x, stats = wl.solve(w, psi, SolverParams(r2req=1e-18, maxits=2000))
    r = wl.wilson_d(w, x) - psi
    rel = float(linalg.norm2(r)) / float(linalg.norm2(psi))
    assert rel < 1e-12, (rel, int(stats.iterations))


def test_eo_preconditioned_solve(lat, setup):
    """eo Schur solve agrees with full-lattice CGNE and converges in
    fewer matvec-equivalents."""
    u, psi, chi = setup
    w = wl.new_wilson(lat, u, m=0.3, bc="pppa")
    weo = wl.new_wilson_eo(lat, u, m=0.3, bc="pppa")
    x, stats = wl.solve_eo(weo, psi, SolverParams(r2req=1e-18,
                                                  maxits=2000))
    r = wl.wilson_d(w, x) - psi
    rel = float(linalg.norm2(r)) / float(linalg.norm2(psi))
    assert rel < 1e-12, (rel, int(stats.iterations))


def test_eo_hop_matches_full(lat, setup):
    """Packed eo hopping term equals the full-lattice hop."""
    from qex_tpu.ops import eo as eomod
    u, psi, chi = setup
    w = wl.new_wilson(lat, u, m=0.2, bc="pppp")
    weo = wl.new_wilson_eo(lat, u, m=0.2, bc="pppp")
    h_full = wl.wilson_hop(w, psi)
    he_ref, ho_ref = eomod.pack(h_full, lat.nd)
    pe, po = eomod.pack(psi, lat.nd)
    he = wl.wilson_hop_eo(weo, po, parity_out=0)
    ho = wl.wilson_hop_eo(weo, pe, parity_out=1)
    assert float(linalg.norm2(he - he_ref)) < 1e-20 * float(
        linalg.norm2(he_ref))
    assert float(linalg.norm2(ho - ho_ref)) < 1e-20 * float(
        linalg.norm2(ho_ref))


def test_fast_wilson_matches_canonical():
    """Lane-packed half-spinor Wilson operator == canonical eo
    operator to machine precision (projection basis is exact)."""
    import jax
    import jax.numpy as jnp
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import wilson as wl
    from qex_tpu.physics import wilson_fast as wf

    DT = jnp.complex128
    lat = Lattice((8, 4, 4, 8))
    key = jax.random.PRNGKey(12)
    u = jnp.stack([linalg.expm(0.4 * group.random_tah(
        jax.random.fold_in(key, i), lat.dims, lat.nc, DT))
        for i in range(4)])
    weo = wl.new_wilson_eo(lat, u, m=0.1, bc="pppa")
    fw = wf.new_fast_wilson(weo)
    psi = (jax.random.normal(key, (4, 3, 8, 4, 4, 4))
           + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                    (4, 3, 8, 4, 4, 4))).astype(DT)
    pf = sf.to_fast(psi, lat)
    for par in (0, 1):
        ref = wl.wilson_hop_eo(weo, psi, par)
        got = sf.from_fast(wf.hop_fast(fw, pf, par), lat)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-13
    ref = wl.wilson_m_ee(weo, psi)
    got = sf.from_fast(wf.m_ee_fast(fw, pf), lat)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-13
