"""Hasenbusch mass-preconditioning tests.

Key identities verified:
1. The ratio action S_h = |phi|^2 + (m2^2-m1^2) phi^dag A(m1)^{-1} phi
   equals the full-lattice form |D(m1)^{-1} D(m2) phi|^2 for even phi.
2. Heatbath distribution: E[S_h] = #dofs (the covariance derivation
   Cov(phi_e) = A1 A2^{-1} is exact).
3. The chain (ratio + heavy fermion) has the same total expected action
   as the single-mass fermion (both represent det A(m1)).
4. Force matches finite differences.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.physics import stag_hmc, stag_solve, staggered as st
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128
SP = SolverParams(r2req=1e-18, maxits=4000, restarts=2)


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(55)
    return jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])


def test_ratio_action_identity(lat, u):
    """Even-reduced ratio action == |D(m1)^{-1} D(m2) phi|^2."""
    m1, m2 = 0.3, 0.8
    h = stag_hmc.StagHasenbusch(lat, m1, m2, "pppp", SP)
    phi = h.heatbath(jax.random.PRNGKey(1), u)
    s_red = float(h.action(u, phi))
    # full-lattice evaluation
    s = st.new_stag_eo(lat, u, "pppp")
    b_e = m2 * phi
    b_o = st.dslash_eo(s, phi, parity_out=1)
    psi_e, psi_o, _ = stag_solve.solve_eo(s, b_e, b_o, m1, SP)
    s_full = float(linalg.norm2(psi_e) + linalg.norm2(psi_o))
    assert s_red == pytest.approx(s_full, rel=1e-8)


def test_heatbath_distribution(lat, u):
    m1, m2 = 0.3, 0.8
    h = stag_hmc.StagHasenbusch(lat, m1, m2, "pppa", SP)
    dofs = lat.nc * lat.volume // 2
    vals = [float(h.action(u, h.heatbath(jax.random.PRNGKey(i), u)))
            for i in range(4)]
    mean = np.mean(vals)
    assert abs(mean - dofs) < 6 * np.sqrt(dofs / 4), (mean, dofs)


def test_force_finite_diff(lat, u):
    m1, m2 = 0.3, 0.8
    h = stag_hmc.StagHasenbusch(lat, m1, m2, "pppa", SP)
    s_act = h.make_action_fn()
    phi = h.heatbath(jax.random.PRNGKey(3), u)
    frc = stag_hmc.fermion_force(s_act, u, phi)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(5), lat.nd))

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(s_act(jnp.einsum("dab...,dbc...->dac...", ex, u),
                           phi))

    hstep = 1e-5
    num = (s_at(hstep) - s_at(-hstep)) / (2 * hstep)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", frc, p))))
    assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (num, ana)


def test_hisq_ratio_action_identity(lat, u):
    """HISQ ratio action == |D3(m1)^{-1} D3(m2) phi|^2 for even phi
    (the hisqhmc_h.nim Hasenbusch algebra over the naik operator)."""
    m1, m2 = 0.4, 0.9
    h = stag_hmc.HisqHasenbusch(lat, m1, m2, "pppp", params=SP)
    phi = h.heatbath(jax.random.PRNGKey(2), u)
    s_red = float(h.action(u, phi))
    # full-lattice evaluation over the same HISQ links
    f1 = h._ferm(m1)
    fl, ll = f1._links(u)
    s3 = st.new_stag3_eo(lat, fl, ll)
    b_e = m2 * phi
    b_o = st.dslash3_eo(s3, phi, parity_out=1)
    rhs = m1 * b_e - st.dslash3_eo(s3, b_o, parity_out=0)
    psi_e = f1.solve_ee(u, rhs, m=m1)
    psi_o = (b_o - st.dslash3_eo(s3, psi_e, parity_out=1)) / m1
    s_full = float(linalg.norm2(psi_e) + linalg.norm2(psi_o))
    assert s_red == pytest.approx(s_full, rel=1e-8)


def test_hisq_heatbath_distribution(lat, u):
    m1, m2 = 0.4, 0.9
    h = stag_hmc.HisqHasenbusch(lat, m1, m2, "pppa", params=SP)
    dofs = lat.nc * lat.volume // 2
    vals = [float(h.action(u, h.heatbath(jax.random.PRNGKey(i), u)))
            for i in range(4)]
    mean = np.mean(vals)
    assert abs(mean - dofs) < 6 * np.sqrt(dofs / 4), (mean, dofs)


def test_hisq_chain_in_theory(lat, u):
    """kind='hisq' with hmasses composes (hisqhmc_h.nim role)."""
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import FermionSpec, GaugeActionSpec, \
        LatticeFieldTheory

    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=12, scheme="2MN"),
        fermions=[FermionSpec("hisq", mass=0.4, steps=6, scheme="2MN",
                              hmasses=(0.9,))],
        smear=None, bc="pppa",
        solver_params=SolverParams(r2req=1e-14, maxits=2000,
                                   restarts=2), tau=0.3)
    assert len(theory.terms) == 3  # gauge + hisq ratio + heavy hisq
    u1, stt = theory.hmc_step(jax.random.PRNGKey(7), u)
    assert abs(float(stt.dH)) < 0.5, float(stt.dH)


def test_chain_in_theory(lat, u):
    """A Hasenbusch-split fermion runs a stable trajectory."""
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import FermionSpec, GaugeActionSpec, \
        LatticeFieldTheory

    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=16, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.3, steps=8,
                              scheme="2MN", smeared=False,
                              hmasses=(0.8,))],
        smear=None, bc="pppa", solver_params=SP, tau=0.4)
    assert len(theory.terms) == 3  # gauge + ratio + heavy
    u1, stt = theory.hmc_step(jax.random.PRNGKey(7), u)
    assert abs(float(stt.dH)) < 0.5, float(stt.dH)
