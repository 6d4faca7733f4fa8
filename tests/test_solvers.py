"""BiCGStab / GCR tests on the (non-hermitian) staggered operator and
random matrices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import staggered as st
from qex_tpu.solvers.bicgstab import bicgstab_solve
from qex_tpu.solvers.gcr import gcr_solve

DT = jnp.complex128


@pytest.fixture
def system(scope="module"):
    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(2)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    g = st.phase_links(lat, u, bc="pppp")
    b = (jax.random.normal(key, lat.vector_shape())
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  lat.vector_shape())).astype(DT)
    op = lambda v: st.d_full(lat, g, v, 0.3)
    return op, b


def test_bicgstab_staggered(system):
    op, b = system
    x, stats = bicgstab_solve(op, b, r2req=1e-20, maxits=2000)
    rel = float(linalg.norm2(op(x) - b)) / float(linalg.norm2(b))
    assert rel < 1e-16, (rel, int(stats.iterations))


def test_gcr_staggered(system):
    op, b = system
    x, stats = gcr_solve(op, b, r2req=1e-20, m=20, max_restarts=40)
    rel = float(linalg.norm2(op(x) - b)) / float(linalg.norm2(b))
    assert rel < 1e-16, (rel, int(stats.iterations))


def test_gcr_preconditioned_converges_faster(system):
    op, b = system
    # diagonal-ish preconditioner: a few Jacobi-like relaxation steps
    prec = lambda v: v / 0.3 - op(v) / (0.3 * 0.3 * 4.0)
    x1, s1 = gcr_solve(op, b, r2req=1e-16, m=16, max_restarts=40)
    x2, s2 = gcr_solve(op, b, precon=prec, r2req=1e-16, m=16,
                       max_restarts=40)
    assert float(linalg.norm2(op(x2) - b)) / float(linalg.norm2(b)) \
        < 1e-12
    # preconditioning shouldn't pessimize iteration count badly
    assert int(s2.iterations) <= int(s1.iterations) * 2


def test_bicgstab_random_nonhermitian():
    rng = np.random.default_rng(0)
    n = 100
    # keep the random part's spectral radius (~0.15*sqrt(n)) well
    # inside the diagonal so the system is safely non-singular
    a = np.eye(n) * 3.0 + 0.15 * rng.normal(size=(n, n))
    aj = jnp.asarray(a + 0j)
    b = jnp.asarray(rng.normal(size=n) + 0j)
    x, stats = bicgstab_solve(lambda v: aj @ v, b, r2req=1e-24)
    assert np.abs(np.asarray(aj @ x - b)).max() < 1e-9


def test_multishift_refined_mixed_precision():
    # cgm.cg_multishift_refined: a reduced-precision (c64-rounded)
    # sloppy pass + per-shift true-residual refinement reaches f64
    # residuals the sloppy operator alone cannot (the multishift analog
    # of QEX sloppySolve; production use: bf16-link Pallas base op in
    # stag_solve.solve_multi with params.sloppy)
    from functools import partial

    from qex_tpu.solvers import cgm

    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(5)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    s = st.new_stag_eo(lat, u)
    b = (jax.random.normal(jax.random.fold_in(key, 8),
                           (lat.nc,) + lat.dims[:-1]
                           + (lat.dims[-1] // 2,)) + 0j).astype(DT)
    base_true = partial(st.d2dd, s, parity=0)
    s32 = st.StaggeredEO(lat, s.g_e.astype(jnp.complex64),
                         s.g_o.astype(jnp.complex64))

    def base_sloppy(v):
        return st.d2dd(s32, v.astype(jnp.complex64), 0).astype(DT)

    shifts = [0.04, 0.25, 1.0]
    xs, stats = jax.jit(lambda bb: cgm.cg_multishift_refined(
        base_sloppy, base_true, bb, shifts, r2req=1e-26,
        sloppy_r2req=1e-10, maxits=600))(b)
    b2 = float(linalg.norm2(b))
    for sig, x in zip(shifts, xs):
        r = b - (base_true(x) + sig * x)
        rel = float(linalg.norm2(r)) / b2
        assert rel < 1e-24, (sig, rel)
    # the sloppy operator alone stalls well above that
    xs0, _ = jax.jit(lambda bb: cgm.cg_multishift(
        base_sloppy, bb, shifts, r2req=1e-26, maxits=600))(b)
    r0 = b - (base_true(xs0[0]) + shifts[0] * xs0[0])
    assert float(linalg.norm2(r0)) / b2 > 1e-18


def test_multishift_refined_closes_past_sloppy_stall():
    # When the sloppy operator is so coarse that eps_sloppy *
    # kappa(A + sigma) > 1 for the lightest shift, sloppy-inner
    # iterative refinement mathematically STALLS (measured on the chip:
    # bf16 links at 32^4, lightest mass stuck at 1e-5 true r2).  The
    # hybrid closure (true-operator inner solves aimed at the original
    # absolute target via stop2) must still reach r2req -- and must
    # cost ~nothing for shifts the sloppy refinement already closed.
    from qex_tpu.solvers import cgm

    rng = np.random.default_rng(7)
    n = 200
    # A = G^T G, SPD with condition ~2e4 at the lightest shift:
    # eigenvalues in [~0, 4], shift 2e-4 -> kappa ~ 2e4; bf16 eps
    # 3.9e-3 -> eps*kappa ~ 80 >> 1 (the stall regime).  The sloppy
    # operator rounds the FACTOR G (the bf16-LINK structure: D~^dag D~
    # stays exactly PSD), not the assembled matrix (which would break
    # definiteness — something bf16 links never do).
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    lam = np.linspace(0.0, 4.0, n)
    g = (q * np.sqrt(lam)) @ q.T
    gj = jnp.asarray(g, jnp.float64)
    # bf16-valued entries, f32 arithmetic (the Pallas sloppy kernel's
    # exact structure: bf16 links, f32 spinors)
    g16 = gj.astype(jnp.bfloat16).astype(jnp.float32)

    def base_true(v):
        return gj.T @ (gj @ v)

    def base_sloppy(v):
        w = g16 @ v.astype(jnp.float32)
        return (g16.T @ w).astype(v.dtype)

    b = jnp.asarray(rng.normal(size=n), jnp.float64)
    shifts = [2e-4, 0.25, 1.0]
    xs, stats = jax.jit(lambda bb: cgm.cg_multishift_refined(
        base_sloppy, base_true, bb, shifts, r2req=1e-20,
        sloppy_r2req=1e-4, maxits=4000, refine_restarts=4))(b)
    b2 = float(linalg.norm2(b))
    for sig, x in zip(shifts, xs):
        rel = float(linalg.norm2(b - (base_true(x) + sig * x))) / b2
        assert rel < 1e-20, (sig, rel)
