"""Mixed-precision Rayleigh-Ritz refinement (eigens/refine.py): the
compensated-dot polish must push f32 eigenpair residuals well below
the plain-f32-projection floor it starts from.

QEX parity target: the f64 residual grade of the reference's PRIMME
runs (src/eigens/qexPrimme.nim:59) reached without f64 fields.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.eigens.refine import refine_inverse_dev, rr_refine_dev


def _hermitian_op(n, seed=0):
    """Dense Hermitian PSD with a physics-like spectrum: a clustered
    low band (the lattice-Dirac low modes the eigensolver targets)
    well separated from a dense bulk."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n))
                        + 1j * rng.normal(size=(n, n)))
    n_low = 30
    lam = np.sort(np.concatenate([
        1e-4 + (1e-2 - 1e-4) * rng.random(n_low),
        0.5 + (5.0 - 0.5) * rng.random(n - n_low)]))
    a = (q * lam) @ np.conj(q.T)
    return jnp.asarray(a, jnp.complex64), lam, q


def test_refine_beats_f32_floor():
    n, k = 4000, 6
    a, lam, q = _hermitian_op(n, seed=1)
    # simulate the f32-Lanczos floor: true vectors + 1e-4 noise
    rng = np.random.default_rng(2)
    v0 = q.T[:k] + 1e-4 * (
        rng.normal(size=(k, n)) + 1j * rng.normal(size=(k, n)))
    v0 = v0 / np.linalg.norm(v0, axis=1, keepdims=True)
    V0 = jnp.asarray(v0, jnp.complex64)
    op = lambda v, a: a @ v

    # starting residuals (f64 measurement of the f32 state)
    a64 = np.asarray(a, np.complex128)
    def _res(vi):
        v = np.asarray(vi, np.complex128)
        th = (np.conj(v) @ (a64 @ v)).real
        return float(np.linalg.norm(a64 @ v - th * v))

    r_start = max(_res(V0[i]) for i in range(k))
    assert r_start > 1e-5  # genuinely at the floor

    evals, V, resids, info = rr_refine_dev(op, V0, op_args=(a,),
                                           iters=3, depth=2)
    # ~5x residual reduction per iteration measured at depth 2 on this
    # operator; 3 iterations must beat the start by >50x (the
    # 4e-5 -> 1e-6 production polish is ~3 such iterations)
    assert resids.max() < 6e-4, resids
    assert resids.max() < r_start / 50, (resids.max(), r_start)
    np.testing.assert_allclose(np.sort(evals), lam[:k],
                               rtol=1e-4, atol=2e-7)


def test_refine_lattice_operator_f32():
    """Refine eigs_hermitian_dev output for a staggered normal op in
    f32 on a small lattice: residuals drop below the device-Lanczos
    result."""
    from qex_tpu.eigens.lanczos import eigs_hermitian_dev
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import eo, group
    from qex_tpu.physics import staggered as st

    lat = Lattice((4, 4, 4, 8))
    key = jax.random.PRNGKey(5)
    u = jnp.stack([group.random_unitary(jax.random.fold_in(key, i),
                                        lat.dims, lat.nc,
                                        jnp.complex64)
                   for i in range(lat.nd)])

    def a_op(v, u):
        s = st.new_stag_eo(lat, u, "pppp")
        return -st.dslash_eo(s, st.dslash_eo(s, v, parity_out=1),
                             parity_out=0)

    z = jnp.zeros(lat.vector_shape(), jnp.complex64)
    ze, _ = eo.pack(z, lat.nd)
    evals, vecs, info = eigs_hermitian_dev(a_op, ze, 4, m=30,
                                           tol=1e-6, max_restarts=80,
                                           op_args=(u,))
    # tiny clustered eigenvalues (~1e-6..2e-4 under lambda_max ~ 7):
    # the regime where subspace polish stalls (even exact f64 RR over
    # the f32 span keeps ~1e-4 residuals -- measured) and the
    # deflated inverse iteration is the production polish
    ev2, V2, res2, _ = refine_inverse_dev(a_op, vecs, op_args=(u,),
                                          iters=3, r2req=1e-12,
                                          maxits=800)
    # f64 ground-truth residuals of the refined pairs
    u64 = u.astype(jnp.complex128)

    def a64(v):
        s = st.new_stag_eo(lat, u64, "pppp")
        return -st.dslash_eo(s, st.dslash_eo(s, v, parity_out=1),
                             parity_out=0)

    before = []
    after = []
    for i in range(4):
        for V, ev, out in ((vecs, evals, before), (V2, ev2, after)):
            v64 = jnp.asarray(V[i], jnp.complex128)
            v64 = v64 / jnp.linalg.norm(v64.ravel())
            th = float(jnp.real(jnp.vdot(v64.ravel(),
                                         a64(v64).ravel())))
            out.append(float(jnp.linalg.norm(
                (a64(v64) - th * v64).ravel())))
    assert max(before) > 1e-4          # Lanczos f32 floor is real
    assert max(after) < max(before) / 5, (before, after)
    assert min(after) < 5e-6, after    # lowest pair near the f32 floor
