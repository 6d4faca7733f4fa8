"""Eigensolver tests vs dense diagonalization oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.eigens import eigs_hermitian, lanczos_hermitian, svd_lowest
from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.physics import staggered as st

DT = jnp.complex128


def test_eigs_dense_matrix():
    """Thick-restart Lanczos vs numpy on a random hermitian matrix."""
    rng = np.random.default_rng(3)
    n = 200
    a = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    a = (a + a.conj().T) / 2
    aj = jnp.asarray(a)
    evals, vecs, info = eigs_hermitian(lambda v: aj @ v,
                                       jnp.zeros(n, DT), 5,
                                       which="smallest", tol=1e-10)
    ref = np.linalg.eigvalsh(a)[:5]
    assert info["converged"], info
    assert np.abs(evals - ref).max() < 1e-7 * np.abs(ref).max()
    # eigenvector residuals
    for i in range(5):
        r = aj @ vecs[i] - evals[i] * vecs[i]
        assert float(jnp.linalg.norm(r)) < 1e-6


def test_eigs_largest():
    rng = np.random.default_rng(4)
    n = 120
    a = rng.normal(size=(n, n))
    a = (a + a.T) / 2
    aj = jnp.asarray(a + 0j)
    evals, _, info = eigs_hermitian(lambda v: aj @ v, jnp.zeros(n, DT),
                                    3, which="largest", tol=1e-9)
    ref = np.sort(np.linalg.eigvalsh(a))[::-1][:3]
    assert np.abs(evals - ref).max() < 1e-6 * np.abs(ref).max()


def test_staggered_spectrum_vs_dense():
    """Lowest eigenvalues of the staggered normal op A(m=0) on 2^3x4
    vs dense diagonalization (QEX hisqev-style check)."""
    lat = Lattice((2, 2, 2, 4))
    key = jax.random.PRNGKey(11)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    s = st.new_stag_eo(lat, u, bc="pppp")
    shp = (lat.nc,) + lat.dims[:-1] + (lat.dims[-1] // 2,)
    ne = int(np.prod(shp))

    def a_op(v):
        return st.d2dd(s, v, parity=0)

    cols = []
    for j in range(ne):
        e = jnp.zeros((ne,), DT).at[j].set(1.0).reshape(shp)
        cols.append(np.asarray(a_op(e)).reshape(ne))
    amat = np.stack(cols, axis=1)
    ref = np.linalg.eigvalsh(amat)

    evals, _, info = eigs_hermitian(a_op, jnp.zeros(shp, DT), 4,
                                    which="smallest", tol=1e-9, m=40)
    assert np.abs(evals - ref[:4]).max() < 1e-6 * max(ref.max(), 1.0), (
        evals, ref[:6], info)


def test_lanczos_tridiagonal_spectrum():
    """Plain Lanczos ritz values approximate extreme eigenvalues."""
    rng = np.random.default_rng(5)
    n = 150
    d = np.linspace(1.0, 10.0, n)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    a = jnp.asarray((q * d) @ q.T + 0j)
    v0 = jnp.asarray(rng.normal(size=n) + 0j)
    al, be, V = lanczos_hermitian(lambda v: a @ v, v0, 40)
    t = np.diag(al) + np.diag(be, 1) + np.diag(be, -1)
    ritz = np.linalg.eigvalsh(t)
    assert abs(ritz[0] - 1.0) < 1e-4
    assert abs(ritz[-1] - 10.0) < 1e-4
