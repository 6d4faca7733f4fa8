"""Gauge action / force / integrator / flow tests.

Oracles mirror the reference's strategy (SURVEY.md §4): analytic values
on unit gauge, gauge invariance, finite-difference force checks (QEX
gaugeAction.nim:763-860 numeric-diff pattern), Hamiltonian-conservation
order scaling, and exact reversibility (hmc/hmc.nim:8).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import flow as gf
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group, linalg
from qex_tpu.ops.shifts import shift

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(11)
    return jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                      lat.nc, DT) for i in range(lat.nd)])


def rand_tah_gauge(key, lat):
    return jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(key, lat.nd))


def test_wilson_action_unit_gauge(lat):
    beta = 5.5
    uu = group.unit_gauge(lat, DT)
    s = ga.gauge_action(ga.wilson(beta), lat, uu)
    # unit links: retr P = nc per plane-site; S = -(beta/nc)*6V*nc
    expect = -beta * 6 * lat.volume
    assert abs(float(s) - expect) < 1e-9 * abs(expect)


def test_action_gauge_invariance(lat, u):
    """S(U^g) == S(U) for all terms (plaq, rect, pgm, adjplaq)."""
    key = jax.random.PRNGKey(5)
    g = group.random_su(key, lat.dims, lat.nc, DT)
    ug = jnp.stack([
        linalg.mul(linalg.mul(g, u[mu]),
                   linalg.adj(shift(g, mu, +1, lat.nd)))
        for mu in range(lat.nd)])
    c = ga.GaugeActionCoeffs(plaq=1.3, rect=-0.25, pgm=0.1)
    s0 = ga.gauge_action(c, lat, u)
    s1 = ga.gauge_action(c, lat, ug)
    assert abs(float(s0 - s1)) < 1e-9 * abs(float(s0))
    ca = ga.GaugeActionCoeffs(plaq=1.0, adjplaq=0.7)
    a0 = ga.action_a(ca, lat, u)
    a1 = ga.action_a(ca, lat, ug)
    assert abs(float(a0 - a1)) < 1e-9 * max(1.0, abs(float(a0)))


def test_action_a_consistency(lat, u):
    """actionA with adjplaq=0 differs from gauge_action by the constant
    c.plaq * a0 (QEX normalization parity, gaugeAction.nim:680)."""
    beta = 2.1
    s1 = ga.gauge_action(ga.wilson(beta), lat, u)
    s2 = ga.action_a(ga.GaugeActionCoeffs(plaq=beta), lat, u)
    a0 = 0.5 * lat.nd * (lat.nd - 1) * lat.volume
    assert abs(float(s2) - (beta * a0 + float(s1))) < 1e-8 * abs(float(s2))


@pytest.mark.parametrize("coeffs", [
    ga.GaugeActionCoeffs(plaq=5.5),
    ga.GaugeActionCoeffs(plaq=1.0, rect=-0.33),
    ga.GaugeActionCoeffs(plaq=1.0, rect=-0.1, pgm=0.05),
    ga.GaugeActionCoeffs(plaq=1.0, adjplaq=0.6),
])
def test_force_vs_finite_difference(lat, u, coeffs):
    """dS/dt along U(t)=exp(t P)U at t=0 equals sum retr(-F P)."""
    from functools import partial
    act = partial(ga.full_action, coeffs, lat)
    f = ga.gauge_force(coeffs, lat, u)
    key = jax.random.PRNGKey(17)
    p = rand_tah_gauge(key, lat)

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        ut = jnp.einsum("dab...,dbc...->dac...", ex, u)
        return float(act(ut))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", f, p))))
    assert abs(num - ana) < 1e-6 * max(1.0, abs(num)), (num, ana)


def test_hmc_energy_conservation_order(lat, u):
    """Leapfrog dH ~ O(dt^2): halving dt cuts |dH| ~4x; 2MN smaller
    than LF at same cost; reversibility exact to roundoff."""
    from functools import partial
    beta = 5.0
    c = ga.wilson(beta)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    key = jax.random.PRNGKey(23)
    p = rand_tah_gauge(key, lat)
    h0 = float(hmc.kinetic_energy(p) + act(u))

    def dh(scheme, nsteps):
        u1, p1 = integrators.integrate(scheme, u, p, 1.0, nsteps, frc,
                                       hmc.gauge_update_u)
        return float(hmc.kinetic_energy(p1) + act(u1)) - h0

    lf = integrators.get_integrator("LF")
    d8, d16 = dh(lf, 8), dh(lf, 16)
    assert abs(d16) < abs(d8) / 2.5, (d8, d16)
    mn = integrators.get_integrator("2MN")
    assert abs(dh(mn, 8)) < abs(d8)
    # 4th-order scheme: dt halving cuts |dH| ~16x (allow slack)
    fv = integrators.get_integrator("4MN5FV")
    d4, d8b = dh(fv, 4), dh(fv, 8)
    assert abs(d8b) < abs(d4) / 8.0, (d4, d8b)


def test_reversibility(lat, u):
    from functools import partial
    c = ga.wilson(5.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    p = rand_tah_gauge(jax.random.PRNGKey(29), lat)
    rep = hmc.check_reverse(u, p, act, frc, integrators.get_integrator("LF"),
                            0.5, 10)
    assert float(rep["u_dev2"]) < 1e-22
    assert abs(float(rep["dH_rev"])) < 1e-9


def test_hmc_step_runs_and_accepts(lat, u):
    from functools import partial
    c = ga.wilson(5.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    step = jax.jit(lambda k, uu: hmc.hmc_step(
        k, uu, act, frc, integrators.get_integrator("2MN"), 0.5, 20))
    key = jax.random.PRNGKey(31)
    uu, st = step(key, u)
    assert abs(float(st.dH)) < 0.5, float(st.dH)
    # chain a few steps; plaquette should stay in (-1, 1] and field SU(3)
    for i in range(2):
        key = jax.random.fold_in(key, i)
        uu, st = step(key, uu)
    dev = group.check_su(uu[0])
    assert dev["unitarity_dev2_per_site"] < 1e-18


def test_flow_smooths_and_descends(lat, u):
    c = gf.wilson_flow_coeffs(lat.nc)
    p0 = float(loops.plaquette(lat, u))
    u1, ms = gf.flow(c, lat, u, eps=0.02, steps=5)
    pl = np.asarray(ms.plaq)
    assert pl[0] > p0
    assert all(np.diff(pl) > 0), pl  # monotone smoothing
    assert float(ms.t[-1]) == pytest.approx(0.1, rel=1e-6)
    # t^2 E positive and finite, topo charge finite
    assert np.all(np.asarray(ms.t2e_clover) > 0)


def test_flow_rk_order(lat, u):
    """RK3 per-step error O(eps^3) -> global error at fixed t O(eps^2):
    halving eps cuts the deviation ~4x (allow slack)."""
    c = gf.wilson_flow_coeffs(lat.nc)
    t_end = 0.08
    def run(eps):
        uu, _ = gf.flow(c, lat, u, eps, int(round(t_end / eps)),
                        measure=False)
        return uu
    u_a = run(0.04)
    u_b = run(0.02)
    u_c = run(0.01)
    e_ab = float(linalg.norm2(u_a - u_c))
    e_bc = float(linalg.norm2(u_b - u_c))
    assert e_bc < e_ab / 3.0


def test_integrator_factory_params():
    i = integrators.get_integrator("2MN,0.20")
    assert i.steps[0] == ("V", 0.20)
    with pytest.raises(ValueError):
        integrators.get_integrator("nope")


def test_yoshida_order_scaling(lat, u):
    """Yoshida4 ~ dt^4 and Yoshida6 better than Yoshida4 at same dt."""
    from functools import partial
    c = ga.wilson(5.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    p = rand_tah_gauge(jax.random.PRNGKey(77), lat)
    h0 = float(hmc.kinetic_energy(p) + act(u))

    def dh(scheme, nsteps):
        u1, p1 = integrators.integrate(scheme, u, p, 1.0, nsteps, frc,
                                       hmc.gauge_update_u)
        return float(hmc.kinetic_energy(p1) + act(u1)) - h0

    # asymptotic regime needs moderately fine steps (the negative
    # Yoshida substeps amplify coarse-step error)
    y4 = integrators.get_integrator("YOSHIDA4")
    d8, d16 = dh(y4, 8), dh(y4, 16)
    assert abs(d16) < abs(d8) / 8.0, (d8, d16)  # ~16x for dt^4
    y6 = integrators.get_integrator("YOSHIDA6")
    assert abs(dh(y6, 16)) < abs(d16)
    # 6MN7FV is a genuine named-structure implementation (no warning)
    assert integrators.get_integrator("6MN7FV").name == "6MN7FV"
    # the 7-stage Yoshida-A scheme is genuinely high order: halving dt
    # cuts |dH| far faster than 4th order would
    s7 = integrators.get_integrator("S7ODR6")
    d8s, d16s = dh(s7, 8), dh(s7, 16)
    assert abs(d16s) < abs(d8s) / 20.0, (d8s, d16s)


def test_fg_exact_kick_order_and_consistency(lat, u):
    """FGI with the exact jvp force-gradient kick: 4th-order dH
    scaling, and agreement with the shifted-force approximation to
    higher order in dt (they share the dt^3 term by construction)."""
    from functools import partial
    from qex_tpu.hmc.integrators import fg_force
    c = ga.wilson(5.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    p = rand_tah_gauge(jax.random.PRNGKey(99), lat)
    h0 = float(hmc.kinetic_energy(p) + act(u))

    def dh(scheme, nsteps):
        u1, p1 = integrators.integrate(scheme, u, p, 1.0, nsteps, frc,
                                       hmc.gauge_update_u)
        return float(hmc.kinetic_energy(p1) + act(u1)) - h0

    fgi = integrators.get_integrator("FGI")
    d4, d8 = dh(fgi, 4), dh(fgi, 8)
    assert abs(d8) < abs(d4) / 8.0, (d4, d8)   # ~16x for dt^4

    # exact jvp kick vs shifted-force kick: identical dt^3 content
    a = 0.02
    exact = fg_force(u, a, frc, hmc.gauge_update_u)
    f1 = frc(u)
    shifted = frc(hmc.gauge_update_u(u, f1, -a))
    base = frc(u)
    # both differ from the plain force at O(a), but from each other
    # only at O(a^2)
    d_exact = float(linalg.norm2(exact - base))
    d_cross = float(linalg.norm2(exact - shifted))
    assert d_cross < 0.05 * d_exact, (d_cross, d_exact)


@pytest.mark.parametrize("coeffs", [
    ga.wilson(5.5),
    ga.adjoint_action(5.0, -0.25),
    ga.symanzik(4.8),
])
def test_hand_staple_force_matches_ad(lat, u, coeffs):
    """gauge_force/gauge_grad (hand staples for plaq/adjplaq + AD
    remainder) == pure-AD force/grad to machine precision."""
    from functools import partial
    f_ad = ga.force_from_action(partial(ga.full_action, coeffs, lat), u)
    f_h = ga.gauge_force(coeffs, lat, u)
    np.testing.assert_allclose(np.asarray(jnp.max(jnp.abs(f_ad - f_h))),
                               0.0, atol=1e-12)
    g_ad = jax.grad(partial(ga.full_action, coeffs, lat))(u)
    g_h = ga.gauge_grad(coeffs, lat, u)
    np.testing.assert_allclose(np.asarray(jnp.max(jnp.abs(g_ad - g_h))),
                               0.0, atol=1e-12)


def test_derived_fg_schemes_gauge_order(lat, u):
    """The self-derived minimum-norm FG schemes (4MN5F2GP best, plus
    one velocity variant) hold 4th order on the SU(3) gauge action
    through the production integrate() path with exact jvp kicks."""
    from functools import partial
    c = ga.wilson(5.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    p = rand_tah_gauge(jax.random.PRNGKey(77), lat)
    h0 = float(hmc.kinetic_energy(p) + act(u))

    for name in ("4MN5F2GP", "4MN4F2GV"):
        sch = integrators.get_integrator(name)

        def dh(nsteps):
            u1, p1 = integrators.integrate(sch, u, p, 1.0, nsteps,
                                           frc, hmc.gauge_update_u)
            return float(hmc.kinetic_energy(p1) + act(u1)) - h0

        # steps 3 is outside the asymptotic regime for these very
        # small-c5 schemes (dH changes sign); compare 4 vs 8
        d4, d8 = dh(4), dh(8)
        assert abs(d8) < abs(d4) / 8.0, (name, d4, d8)


def test_compensated_kicks_remove_f32_energy_drift():
    """Plain f32 kicks lose the sub-ulp part of each momentum
    increment with a bias: at fixed tau the trajectory dH acquires a
    systematic that grows ~n^4 with step count (measured -1.66+-0.04
    at 8^3x16 nsteps=48; DRIFT_CPU.json / DRIFT_CHIP.json).  The
    two-float kick accumulator (integrate(compensated=True)) must
    track the f64 trajectory where plain f32 drifts away from it.
    """
    from functools import partial
    from qex_tpu.ops import group as grp

    lat_ = Lattice((8, 8, 8, 8))
    beta = 6.0
    c = ga.wilson(beta)
    act = partial(ga.full_action, c, lat_)
    frc = partial(ga.gauge_force, c, lat_)
    scheme = integrators.get_integrator("2MN")

    # equilibrate a bit in f32 (the drift needs |kick| << |p|, i.e. a
    # thermal config, not the cold start)
    @jax.jit
    def warm_step(key, uu):
        u1, _ = hmc.hmc_step(key, uu, act, frc, scheme, 1.0, 10,
                             always_accept=jnp.bool_(True))
        return u1

    u32 = jax.jit(lambda: grp.unit_gauge(lat_, jnp.complex64))()
    key = jax.random.PRNGKey(3)
    for _ in range(12):
        key, k = jax.random.split(key)
        u32 = warm_step(k, u32)

    p32 = rand_tah_gauge(jax.random.PRNGKey(17), lat_).astype(
        jnp.complex64)
    n = 48

    def dh(uu, pp, comp):
        u1, p1 = integrators.integrate(scheme, uu, pp, 1.0, n, frc,
                                       hmc.gauge_update_u,
                                       compensated=comp)
        # measure H in f64 so the comparison isolates the DYNAMICS
        h64 = lambda a, b: float(
            hmc.kinetic_energy(b.astype(jnp.complex128))
            + act(a.astype(jnp.complex128)))
        return h64(u1, p1) - h64(uu, pp)

    d_plain = dh(u32, p32, False)
    d_comp = dh(u32, p32, True)
    d_true = dh(u32.astype(jnp.complex128), p32.astype(jnp.complex128),
                False)
    # f64 dH at these settings is tiny; plain f32 shows the drift
    # (~ -0.8 at this volume), compensated kicks must recover most of
    # it (remaining error: u-update rounding, unbiased)
    assert abs(d_plain - d_true) > 0.25, (d_plain, d_true)
    assert abs(d_comp - d_true) < 0.4 * abs(d_plain - d_true), (
        d_plain, d_comp, d_true)
