"""Fermionic HMC tests: heatbath distribution, implicit-diff forces,
multi-timescale scheduling, full dynamical trajectory.

Mirrors the reference's HMC correctness contract (SURVEY.md §4.6):
seeded trajectories with dH/reversibility checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge.smear import HypCoefs
from qex_tpu.hmc import hmc as hmc_mod
from qex_tpu.hmc.integrators import get_integrator
from qex_tpu.mcmc import (ActionTerm, FermionSpec, GaugeActionSpec,
                          LatticeFieldTheory, build_schedule,
                          run_trajectory)
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_hmc
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128
SP = SolverParams(r2req=1e-16, maxits=2000, restarts=2)


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(77)
    return jnp.stack([
        linalg.expm(0.6 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])


def test_fermion_heatbath_distribution(lat, u):
    """E[S_f] = #complex dofs on even sites (tr of identity)."""
    f = stag_hmc.StagFermion(lat, m=0.5, bc="pppa", params=SP)
    dofs = lat.nc * lat.volume // 2
    vals = []
    for i in range(4):
        phi = f.heatbath(jax.random.PRNGKey(i), u)
        vals.append(float(f.action(u, phi)))
    mean = np.mean(vals)
    # var of phi^dag A^-1 phi is dofs (sum of exp(1) vars); 4 samples
    assert abs(mean - dofs) < 6 * np.sqrt(dofs / 4), (mean, dofs)


def test_boson_heatbath_distribution(lat, u):
    b = stag_hmc.StagBoson(lat, m=0.7, bc="pppa", params=SP)
    dofs = lat.nc * lat.volume // 2
    vals = [float(b.action(u, b.heatbath(jax.random.PRNGKey(i), u)))
            for i in range(4)]
    mean = np.mean(vals)
    assert abs(mean - dofs) < 6 * np.sqrt(dofs / 4), (mean, dofs)


def test_fermion_force_finite_diff(lat, u):
    """Implicit-function VJP force vs finite differences of the solved
    action (QEX fforce oracle)."""
    f = stag_hmc.StagFermion(lat, m=0.5, bc="pppa", params=SP)
    s_act = f.make_action_fn()
    phi = f.heatbath(jax.random.PRNGKey(1), u)
    frc = stag_hmc.fermion_force(s_act, u, phi)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(5), lat.nd))

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(s_act(jnp.einsum("dab...,dbc...->dac...", ex, u), phi))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", frc, p))))
    assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (num, ana)


def test_boson_force_finite_diff(lat, u):
    b = stag_hmc.StagBoson(lat, m=0.7, bc="pppa", params=SP)
    s_act = b.make_action_fn()
    phi = b.heatbath(jax.random.PRNGKey(2), u)
    frc = stag_hmc.fermion_force(s_act, u, phi)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(6), lat.nd))

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(s_act(jnp.einsum("dab...,dbc...->dac...", ex, u), phi))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", frc, p))))
    assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (num, ana)


def test_build_schedule_structure():
    """Schedule advances sum to tau; leapfrog on 2 timescales lands
    kicks at the right times."""
    t1 = ActionTerm("a", None, None, steps=2, scheme="LF")
    t2 = ActionTerm("b", None, None, steps=4, scheme="LF")
    sched = build_schedule([t1, t2], tau=1.0)
    assert abs(sum(dt for dt, _ in sched) - 1.0) < 1e-12
    # LF kicks: term a at t=0(.25), 0.5(.5), 1.0(.25); term b at
    # 0(.125), .25(.25), .5, .75, 1.0(.125)
    kicks = {}
    t = 0.0
    for dt, group_ in sched:
        t += dt
        for (i, cdt, _) in group_:
            kicks.setdefault(round(t, 9), []).append((i, round(cdt, 9)))
    assert kicks[0.0] == [(0, 0.25), (1, 0.125)]
    assert kicks[0.25] == [(1, 0.25)]
    assert kicks[0.5] == [(0, 0.5), (1, 0.25)]
    assert kicks[1.0] == [(0, 0.25), (1, 0.125)]


def test_multiscale_matches_single_scale(lat, u):
    """With every term on the same (steps, scheme), run_trajectory must
    reproduce the single-scale integrator exactly."""
    c = ga.wilson(5.0)
    from functools import partial
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(8), lat.nd))
    term = ActionTerm("g", lambda uu, _: act(uu),
                      lambda uu, _: frc(uu), steps=4, scheme="2MN")
    u1, p1 = run_trajectory([term], u, p, [None], 1.0,
                            hmc_mod.gauge_update_u)
    u2, p2 = __import__("qex_tpu.hmc.integrators", fromlist=["integrate"]
                        ).integrate(get_integrator("2MN"), u, p, 1.0, 4,
                                    frc, hmc_mod.gauge_update_u)
    assert float(linalg.norm2(u1 - u2)) < 1e-24
    assert float(linalg.norm2(p1 - p2)) < 1e-24


def test_dynamical_hmc_trajectory(lat, u):
    """Full gauge+fermion+PV theory: dH small and reversible-ish at
    fine steps (QEX staghmc_spv trajectory contract)."""
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=16, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.5, steps=8, scheme="2MN",
                              smeared=False),
                  FermionSpec("boson", mass=0.75, steps=8, scheme="2MN",
                              smeared=False)],
        smear=None, bc="pppa", solver_params=SP, tau=0.5)
    key = jax.random.PRNGKey(99)
    u1, st = theory.hmc_step(key, u)
    # measured -0.26 at these steps with O(dt^2) scaling verified
    assert abs(float(st.dH)) < 0.5, float(st.dH)
    assert np.isfinite(float(st.h_old))


def test_dynamical_hmc_smeared(lat, u):
    """nHYP-smeared fermion force through the full AD chain drives a
    stable trajectory (the staghmc_spv configuration)."""
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=8, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.5, steps=4, scheme="2MN",
                              smeared=True)],
        smear=HypCoefs(0.4, 0.5, 0.5), bc="pppa",
        solver_params=SP, tau=0.3)
    u1, st = theory.hmc_step(jax.random.PRNGKey(13), u)
    # measured -0.21 at these steps
    assert abs(float(st.dH)) < 0.5, float(st.dH)


def test_stout_smeared_theory(lat, u):
    """Stout per-action smearing (the mcmcTypes.nim:183-196 nhyp|stout
    choice): a stout-smeared staggered fermion runs a stable,
    reversible trajectory, and the JSON builder accepts
    smearing='stout'."""
    from qex_tpu.gauge.smear import StoutCoefs
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=12, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.3, steps=6,
                              scheme="2MN", smeared=True)],
        smear=StoutCoefs(0.12), bc="pppa", solver_params=SP, tau=0.3)
    u1, stt = theory.hmc_step(jax.random.PRNGKey(5), u)
    assert abs(float(stt.dH)) < 0.5, float(stt.dH)

    import json, tempfile
    from qex_tpu.mcmc.builder import theory_from_json
    deck = {
        "hmc": {"lattice-geometry": list(lat.dims),
                "trajectory-length": 0.3},
        "action": {"smearing": "stout",
                   "smearing-coefficients": [0.12],
                   "boundary-conditions": "pppa"},
        "gauge": {"beta": 5.0, "steps": 12},
        "staggered-fermions": {"mass": 0.3, "steps": 6},
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(deck, f)
        path = f.name
    _lat, th2, _meta = theory_from_json(path)
    assert isinstance(th2.smear_coefs, StoutCoefs)
    assert th2.smear_coefs.rho == 0.12


def test_hmc_step_split_matches_fused(lat, u):
    """The split-step dispatcher (Python loop of small jits, for
    volumes where the whole-trajectory program OOMs the XLA compiler)
    reproduces the fused jit trajectory: same key => same dH and same
    accepted configuration."""
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=8, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.5, steps=4, scheme="2MN",
                              smeared=True),
                  FermionSpec("boson", mass=0.75, steps=4, scheme="2MN",
                              smeared=True)],
        smear=HypCoefs(0.4, 0.5, 0.5), bc="pppa",
        solver_params=SP, tau=0.4)
    key = jax.random.PRNGKey(21)
    u1, st1 = jax.jit(theory.hmc_step)(key, u)
    u2, st2 = theory.hmc_step_split(key, u)
    assert abs(float(st1.dH) - float(st2.dH)) < 5e-5 * (
        1.0 + abs(float(st1.dH))), (float(st1.dH), float(st2.dH))
    assert float(linalg.norm2(u1 - u2)) < 1e-8


def test_nhyp_preproj_stages_compose(lat, u):
    """nhyp_stages_preproj composes to exactly nhyp_smear (the
    split-projection pullback path used by hmc_step_split)."""
    import jax.numpy as jnp
    from qex_tpu.gauge.smear import nhyp_smear, nhyp_stages_preproj
    c = HypCoefs(0.4, 0.5, 0.5)
    (p1, p2, p3), proj = nhyp_stages_preproj(c, lat)

    def stack_proj(w):
        return jnp.stack([proj(w[j]) for j in range(w.shape[0])])

    v = stack_proj(p3(u, stack_proj(p2(u, stack_proj(p1(u))))))
    ref = nhyp_smear(c, lat, u)
    assert float(linalg.norm2(v - ref)) < 1e-20 * float(
        linalg.norm2(ref))


def test_hmc_step_split_forward_slabs_matches_fused(lat, u, monkeypatch):
    """The per-output slab-list nHYP FORWARDS (huge-volume mode,
    md.FWD_SPLIT_MIN_SITES gate) reproduce the fused trajectory --
    forced on at test volume by monkeypatching the gate to 0."""
    from qex_tpu.mcmc import md as mdmod
    monkeypatch.setattr(mdmod, "FWD_SPLIT_MIN_SITES", 0)
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=8, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.5, steps=4,
                              scheme="2MN", smeared=True)],
        smear=HypCoefs(0.4, 0.5, 0.5), bc="pppa",
        solver_params=SP, tau=0.4)
    key = jax.random.PRNGKey(23)
    u1, st1 = jax.jit(theory.hmc_step)(key, u)
    u2, st2 = theory.hmc_step_split(key, u)
    assert abs(float(st1.dH) - float(st2.dH)) < 5e-5 * (
        1.0 + abs(float(st1.dH))), (float(st1.dH), float(st2.dH))
    assert float(linalg.norm2(u1 - u2)) < 1e-8
