"""Golub-Kahan SVD-Lanczos (eigens/svdlanczos.py) vs dense SVD.

QEX parity target: svdLanczos.nim:1-507 (singular triplets of D, not
eigenpairs of D^dag D).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.eigens import svd_lanczos, svd_lanczos_dev, svd_stag
from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.physics import staggered as st

DT = jnp.complex128


def _dense(n, m_cols, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, m_cols)) + 1j * rng.normal(size=(n, m_cols))
    return jnp.asarray(a, DT)


def test_svd_lanczos_smallest_matches_dense():
    a = _dense(120, 120)
    sv_ref = np.linalg.svd(np.asarray(a), compute_uv=False)[::-1]
    av = lambda v: a @ v
    ahv = lambda u: jnp.conj(a.T) @ u
    sig, U, V, info = svd_lanczos(av, ahv, jnp.zeros(120, DT), 4,
                                  m=30, tol=1e-10, max_restarts=200)
    assert info["converged"]
    np.testing.assert_allclose(sig, sv_ref[:4], rtol=1e-8)
    # triplet identities: D v = sigma u, D^dag u = sigma v
    for i in range(4):
        r1 = float(linalg.norm2(av(V[i]) - sig[i] * U[i]))
        r2 = float(linalg.norm2(ahv(U[i]) - sig[i] * V[i]))
        assert r1 < 1e-14 and r2 < 1e-14, (i, r1, r2)


def test_svd_lanczos_largest():
    a = _dense(100, 100, seed=2)
    sv_ref = np.linalg.svd(np.asarray(a), compute_uv=False)
    sig, U, V, info = svd_lanczos(lambda v: a @ v,
                                  lambda u: jnp.conj(a.T) @ u,
                                  jnp.zeros(100, DT), 3, m=25,
                                  which="largest", tol=1e-10,
                                  max_restarts=100)
    np.testing.assert_allclose(sig, sv_ref[:3], rtol=1e-9)


def test_svd_lanczos_rectangular():
    """Domain and range of different sizes (eo blocks have equal size,
    but the algorithm must not assume it)."""
    a = _dense(90, 60, seed=5)
    sv_ref = np.linalg.svd(np.asarray(a), compute_uv=False)[::-1]
    sig, U, V, info = svd_lanczos(lambda v: a @ v,
                                  lambda u: jnp.conj(a.T) @ u,
                                  jnp.zeros(60, DT), 3, m=20,
                                  tol=1e-10, max_restarts=200)
    np.testing.assert_allclose(sig, sv_ref[:3], rtol=1e-8)
    assert U.shape == (3, 90) and V.shape == (3, 60)


def test_svd_lanczos_dev_matches_host():
    a = _dense(100, 100, seed=7)
    av = lambda v, a: a @ v
    ahv = lambda u, a: jnp.conj(a.T) @ u
    sig_h, _, _, info_h = svd_lanczos(av, ahv, jnp.zeros(100, DT), 4,
                                      m=26, tol=1e-10,
                                      max_restarts=150, op_args=(a,))
    sig_d, Ur, Vr, info_d = svd_lanczos_dev(av, ahv,
                                            jnp.zeros(100, DT), 4,
                                            m=26, tol=1e-10,
                                            max_restarts=150,
                                            op_args=(a,))
    assert info_d["converged"]
    np.testing.assert_allclose(sig_d, sig_h, rtol=1e-8)
    for i in range(4):
        r1 = float(linalg.norm2(a @ Vr[i] - sig_d[i] * Ur[i]))
        assert r1 < 1e-12, (i, r1)


def test_svd_stag_sigma_is_abs_dslash_eigs():
    """sigma(D_oe) at m=0 equals |lambda| of the antihermitian Dslash:
    checked against the Hermitian normal-operator path sqrt(eigs)."""
    from qex_tpu.eigens import eigs_hermitian
    lat = Lattice((2, 2, 2, 4))
    key = jax.random.PRNGKey(11)
    u = jnp.stack([group.random_unitary(jax.random.fold_in(key, i),
                                        lat.dims, lat.nc, DT)
                   for i in range(lat.nd)])
    sig, Uo, Ve, info = svd_stag(lat, u, 4, bc="pppp", m=24,
                                 tol=1e-9, max_restarts=300)
    s = st.new_stag_eo(lat, u, "pppp")
    a_op = lambda v: -st.dslash_eo(s, st.dslash_eo(s, v, parity_out=1),
                                   parity_out=0)
    z = jnp.zeros(lat.vector_shape(), DT)
    ze, _ = eo.pack(z, lat.nd)
    evals, _, _ = eigs_hermitian(a_op, ze, 4, m=24, tol=1e-11,
                                 max_restarts=300)
    np.testing.assert_allclose(sig, np.sqrt(np.maximum(evals, 0.0)),
                               rtol=1e-6)
    # triplet identity on the lattice operator
    r = float(linalg.norm2(st.dslash_eo(s, Ve[0], parity_out=1)
                           - sig[0] * Uo[0]))
    assert r < 1e-10 * max(1.0, float(sig[0]) ** 2)
