"""Two-grid multigrid tests: transfer-operator identities and
preconditioned-solve convergence on the Wilson operator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.mg import mg_setup, mg_solve
from qex_tpu.mg.twogrid import coarse_op, prolong, restrict
from qex_tpu.ops import group, linalg
from qex_tpu.physics import wilson as wl
from qex_tpu.solvers.gcr import gcr_solve

DT = jnp.complex128


@pytest.fixture
def system():
    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(12)
    u = jnp.stack([
        linalg.expm(0.4 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    w = wl.new_wilson(lat, u, m=0.1, bc="pppp")
    op = lambda v: wl.wilson_d(w, v)
    b = (jax.random.normal(key, lat.dirac_shape())
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  lat.dirac_shape())).astype(DT)
    return lat, op, b


def test_transfer_identities(system):
    """R P = identity on the coarse space (block orthonormality), and
    P R is a projector."""
    lat, op, b = system
    setup = mg_setup(lat, op, nvec=4, bs=2, dtype=DT)
    key = jax.random.PRNGKey(5)
    c = (jax.random.normal(key, (4, 2, 2, 2, 2))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  (4, 2, 2, 2, 2))).astype(DT)
    c_back = restrict(setup, prolong(setup, c))
    assert float(linalg.norm2(c_back - c)) < 1e-20 * float(
        linalg.norm2(c))
    v = b
    pv = prolong(setup, restrict(setup, v))
    ppv = prolong(setup, restrict(setup, pv))
    assert float(linalg.norm2(ppv - pv)) < 1e-20 * float(
        linalg.norm2(pv))


def test_coarse_op_galerkin(system):
    """D_c c == R D P c by construction."""
    lat, op, b = system
    setup = mg_setup(lat, op, nvec=4, bs=2, dtype=DT)
    dc = coarse_op(setup, op)
    key = jax.random.PRNGKey(6)
    c = (jax.random.normal(key, (4, 2, 2, 2, 2)) + 0j).astype(DT)
    ref = restrict(setup, op(prolong(setup, c)))
    assert float(linalg.norm2(dc(c) - ref)) == 0.0


def test_mg_solve_converges(system):
    lat, op, b = system
    x, stats, setup = mg_solve(lat, op, b, nvec=6, bs=2, r2req=1e-16,
                               m=10, max_restarts=30)
    rel = float(linalg.norm2(op(x) - b)) / float(linalg.norm2(b))
    assert rel < 1e-12, (rel, int(stats.iterations))


def test_mg_beats_plain_gcr_iterations(system):
    """The two-grid preconditioner must reduce outer iterations."""
    lat, op, b = system
    x1, s1 = gcr_solve(op, b, r2req=1e-12, m=10, max_restarts=30)
    x2, s2, _ = mg_solve(lat, op, b, nvec=6, bs=2, r2req=1e-12, m=10,
                         max_restarts=30)
    assert int(s2.iterations) < int(s1.iterations), (
        int(s1.iterations), int(s2.iterations))


def test_chiral_setup_transfer_identities(system):
    """Chirality-split prolongator: R P = I on the (doubled) coarse
    space, and the split preserves gamma5-invariance of span(P):
    g5 P c is still in span(P)."""
    lat, op, b = system
    setup = mg_setup(lat, op, nvec=3, bs=2, dtype=DT, chiral=True)
    assert setup.nvec == 6  # doubled
    key = jax.random.PRNGKey(7)
    c = (jax.random.normal(key, (6, 2, 2, 2, 2))
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  (6, 2, 2, 2, 2))).astype(DT)
    c_back = restrict(setup, prolong(setup, c))
    assert float(linalg.norm2(c_back - c)) < 1e-20 * float(
        linalg.norm2(c))
    # g5-invariance: P R (g5 P c) == g5 P c
    from qex_tpu.physics.wilson import gamma_matrices
    g5 = jnp.asarray(gamma_matrices()[4], DT)
    v = prolong(setup, c)
    g5v = jnp.einsum("st,tc...->sc...", g5, v)
    proj = prolong(setup, restrict(setup, g5v))
    assert float(linalg.norm2(proj - g5v)) < 1e-18 * float(
        linalg.norm2(g5v))


def test_kcycle_converges_and_beats_plain(system):
    """Multi-level K-cycle (chiral, 2 coarsening steps) converges and
    reduces outer iterations vs unpreconditioned GCR."""
    from qex_tpu.mg import mg_solve_kcycle
    lat, op, b = system
    x1, s1 = gcr_solve(op, b, r2req=1e-12, m=10, max_restarts=30)
    x2, s2, h = mg_solve_kcycle(lat, op, b, nlevels=2, nvec=3, bs=2,
                                chiral=True, r2req=1e-12, m=10,
                                max_restarts=30)
    rel = float(linalg.norm2(op(x2) - b)) / float(linalg.norm2(b))
    assert rel < 1e-10, rel
    assert int(s2.iterations) < int(s1.iterations), (
        int(s1.iterations), int(s2.iterations))
    assert len(h.setups) == 2


def test_backend_mg_dispatch_beats_cgne_iterations(system):
    """SolverParams(backend="mg") reaches the K-cycle from the
    wilson.solve/solve_eo surface and cuts iteration counts vs plain
    CGNE (QEX solverBase.nim:14,50-53 backend switch ->
    mg/wilsonmg.nim:58-104 solve driver role).

    The full 8^3x16 light-mass A/B is a probe, not a suite test (CPU
    wall: ~26 min): measured m=0.005 weak field -- CGNE 77 its vs MG
    15 outer its at equal 1e-8 rel r2 (ROUND4.md).
    """
    from qex_tpu.solvers.base import MGParams, SolverParams

    lat, op, b = system
    key = jax.random.PRNGKey(12)
    u = jnp.stack([
        linalg.expm(0.4 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    w = wl.new_wilson(lat, u, m=0.1, bc="pppp")

    x_cg, s_cg = wl.solve(w, b, SolverParams(r2req=1e-10, maxits=2000,
                                             restarts=1))
    p_mg = SolverParams(r2req=1e-10, maxits=300, backend="mg",
                        mg=MGParams(nlevels=1, nvec=4, relax_iters=10,
                                    m=10))
    x_mg, s_mg = wl.solve(w, b, p_mg)
    for x in (x_cg, x_mg):
        r = float(linalg.norm2(wl.wilson_d(w, x) - b)) / float(
            linalg.norm2(b))
        assert r < 1e-8, r
    assert int(s_mg.iterations) < int(s_cg.iterations), (
        int(s_cg.iterations), int(s_mg.iterations))

    # the eo entry point dispatches too
    weo = wl.new_wilson_eo(lat, u, m=0.1, bc="pppp")
    x_eo, _ = wl.solve_eo(weo, b, p_mg)
    r = float(linalg.norm2(wl.wilson_d(w, x_eo) - b)) / float(
        linalg.norm2(b))
    assert r < 1e-8, r
