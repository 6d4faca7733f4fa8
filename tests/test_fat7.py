"""fat7 / HISQ link-building tests: gauge covariance, unit-gauge
closed forms, naik operator structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import fat7
from qex_tpu.ops import eo, group, linalg
from qex_tpu.ops.shifts import shift
from qex_tpu.physics import staggered as st

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(31)
    return jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])


def gauge_transform(lat, u, g):
    return jnp.stack([
        linalg.mul(linalg.mul(g, u[mu]),
                   linalg.adj(shift(g, mu, +1, lat.nd)))
        for mu in range(lat.nd)])


def test_fat7_gauge_covariance(lat, u):
    c = fat7.set_hisq_fat7(2.0, 1.0)
    g = group.random_su(jax.random.PRNGKey(2), lat.dims, lat.nc, DT)
    f1, l1 = fat7.make_imp_links(lat, gauge_transform(lat, u, g), c,
                                 naik=-1.0 / 24.0)
    f2, l2 = fat7.make_imp_links(lat, u, c, naik=-1.0 / 24.0)
    f2 = gauge_transform(lat, f2, g)
    # long links transform with g(x) ... g(x+3mu)^dag
    l2t = jnp.stack([
        linalg.mul(linalg.mul(g, l2[mu]),
                   linalg.adj(shift(g, mu, +1, lat.nd, dist=3)))
        for mu in range(lat.nd)])
    assert float(linalg.norm2(f1 - f2)) / float(linalg.norm2(f2)) < 1e-20
    assert float(linalg.norm2(l1 - l2t)) / float(linalg.norm2(l2t)) < 1e-20


def test_fat7_unit_gauge_closed_form(lat):
    """On unit gauge every path is the identity; the fat link equals
    (c1-6cL + 6c3 + 12cL + 24c5 + 48c7) * I, with path multiplicities
    3-staple 6, Lepage 12, 5-staple 24, 7-staple 48."""
    c = fat7.Fat7lCoefs(one_link=0.7, three_staple=0.11,
                        five_staple=0.013, seven_staple=0.0017,
                        lepage=0.19)
    uu = group.unit_gauge(lat, DT)
    fl, _ = fat7.make_imp_links(lat, uu, c)
    w = (c.one_link - 6 * c.lepage + 6 * c.three_staple
         + 12 * c.lepage + 24 * c.five_staple + 48 * c.seven_staple)
    ref = w * uu
    assert float(linalg.norm2(fl - ref)) < 1e-18 * float(linalg.norm2(ref))


def test_naik_long_links(lat, u):
    """ll[mu](x) = naik * U(x) U(x+mu) U(x+2mu)."""
    naik = -1.0 / 24.0
    _, ll = fat7.make_imp_links(lat, u, fat7.Fat7lCoefs(one_link=1.0),
                                naik=naik)
    mu = 2
    ref = naik * linalg.mul(
        u[mu], linalg.mul(shift(u[mu], mu, +1, lat.nd),
                          shift(u[mu], mu, +1, lat.nd, dist=2)))
    assert float(linalg.norm2(ll[mu] - ref)) < 1e-20


def test_hisq_links_finite_and_covariant(lat, u):
    fl, ll = fat7.hisq_links(lat, u)
    assert np.all(np.isfinite(np.asarray(fl)))
    assert np.all(np.isfinite(np.asarray(ll)))
    g = group.random_su(jax.random.PRNGKey(9), lat.dims, lat.nc, DT)
    f1, _ = fat7.hisq_links(lat, gauge_transform(lat, u, g))
    f2 = gauge_transform(lat, fl, g)
    assert float(linalg.norm2(f1 - f2)) / float(linalg.norm2(f2)) < 1e-16


def test_stag3_eo_matches_full(lat, u):
    """eo-packed fat+naik Dslash == full-lattice oracle, and the
    normal operator is hermitian."""
    fl, ll = fat7.hisq_links(lat, st.phase_links(lat, u, bc="pppp"))
    s3 = st.new_stag3_eo(lat, fl, ll)
    key = jax.random.PRNGKey(4)
    x = (jax.random.normal(key, lat.vector_shape())
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  lat.vector_shape())).astype(DT)
    d_ref = st.dslash3_full(lat, fl, ll, x)
    de_ref, do_ref = eo.pack(d_ref, lat.nd)
    xe, xo = eo.pack(x, lat.nd)
    de = st.dslash3_eo(s3, xo, parity_out=0)
    do = st.dslash3_eo(s3, xe, parity_out=1)
    assert float(linalg.norm2(de - de_ref)) < 1e-18 * float(
        linalg.norm2(de_ref))
    assert float(linalg.norm2(do - do_ref)) < 1e-18 * float(
        linalg.norm2(do_ref))
    # normal op hermitian positive
    ye = st.d2ee3(s3, xe, 0.1)
    h = linalg.dot(xe, ye)
    assert abs(jnp.imag(h)) < 1e-9 * abs(h)
    assert float(jnp.real(h)) > 0


def test_hisq_fermion_action(lat, u):
    """HISQ pseudofermion: heatbath distribution + implicit-diff force
    vs finite differences (AD through the full two-level smear)."""
    import jax
    from qex_tpu.physics import stag_hmc
    from qex_tpu.solvers.base import SolverParams
    f = stag_hmc.HisqFermion(lat, m=0.5, bc="pppp",
                             params=SolverParams(r2req=1e-16,
                                                 maxits=2000,
                                                 restarts=2))
    phi = f.heatbath(jax.random.PRNGKey(1), u)
    dofs = lat.nc * lat.volume // 2
    s0 = float(f.action(u, phi))
    assert abs(s0 - dofs) < 6 * np.sqrt(dofs), (s0, dofs)
    s_act = f.make_action_fn()
    frc = stag_hmc.fermion_force(s_act, u, phi)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(5), lat.nd))

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(s_act(jnp.einsum("dab...,dbc...->dac...", ex, u),
                           phi))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", frc,
                                             p))))
    assert abs(num - ana) < 1e-4 * max(1.0, abs(num)), (num, ana)


def test_hisq_multimass(lat, u):
    import jax
    from qex_tpu.physics import stag_hmc
    from qex_tpu.solvers.base import SolverParams
    from qex_tpu.physics import staggered as stg
    from qex_tpu.gauge.fat7 import hisq_links
    f = stag_hmc.HisqFermion(lat, m=0.1, bc="pppp",
                             params=SolverParams(r2req=1e-18,
                                                 maxits=3000))
    key = jax.random.PRNGKey(9)
    b = (jax.random.normal(key, (lat.nc,) + lat.dims[:-1]
                           + (lat.dims[-1] // 2,)) + 0j).astype(DT)
    masses = [0.1, 0.4]
    xs, stats = f.solve_multi(u, b, masses)
    g = stg.phase_links(lat, u, "pppp")
    fl, ll = hisq_links(lat, g)
    s3 = stg.new_stag3_eo(lat, fl, ll)
    for m, x in zip(masses, xs):
        r = stg.d2ee3(s3, x, m) - b
        assert float(linalg.norm2(r)) / float(linalg.norm2(b)) < 1e-12


def test_hisq_links_lowmem_matches_fused(lat, u):
    """Per-direction chunked fattening (the large-volume OOM-avoidance
    path) is bit-compatible with the fused differentiable path."""
    fl1, ll1 = jax.jit(lambda uu: fat7.hisq_links(lat, uu))(u)
    fl2, ll2 = fat7.hisq_links_lowmem(lat, u)
    assert float(jnp.max(jnp.abs(fl1 - fl2))) < 1e-12
    assert float(jnp.max(jnp.abs(ll1 - ll2))) < 1e-12


def test_hisq_sloppy_param_fallback(lat, u):
    """SolverParams.sloppy on the HISQ action: on CPU (no Pallas) the
    bf16 inner op is unavailable and the solve must fall back to the
    plain f32 path with identical results."""
    import jax
    from qex_tpu.physics import stag_hmc
    from qex_tpu.solvers.base import SolverParams
    f32 = stag_hmc.HisqFermion(lat, m=0.5, bc="pppp",
                               params=SolverParams(r2req=1e-16,
                                                   maxits=2000,
                                                   restarts=2))
    fsl = stag_hmc.HisqFermion(lat, m=0.5, bc="pppp",
                               params=SolverParams(r2req=1e-16,
                                                   maxits=2000,
                                                   restarts=2,
                                                   sloppy=True))
    phi = f32.heatbath(jax.random.PRNGKey(4), u)
    a0, a1 = float(f32.action(u, phi)), float(fsl.action(u, phi))
    assert abs(a0 - a1) < 1e-8 * max(1.0, abs(a0)), (a0, a1)
    # the routing helper returns no bf16 op off-TPU
    from qex_tpu.physics import stag_fast as sfst
    from qex_tpu.gauge.fat7 import hisq_links
    from qex_tpu.physics import staggered as stg
    g = stg.phase_links(lat, u, "pppp")
    fl, ll = hisq_links(lat, g)
    f3 = sfst.new_fast3(stg.new_stag3_eo(lat, fl, ll))
    _, _, ee_b = stag_hmc._fast3_ops_sloppy(f3)
    assert ee_b is None


def test_hisq_in_theory(lat, u):
    """kind='hisq' composes into a stable HMC trajectory (the hisqhmc
    example program role, reference src/examples/hisqhmc.nim) with the
    internal fat7+naik smearing and implicit-diff CG forces."""
    import jax
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import FermionSpec, GaugeActionSpec, \
        LatticeFieldTheory
    from qex_tpu.solvers.base import SolverParams

    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.0), steps=12, scheme="2MN"),
        fermions=[FermionSpec("hisq", mass=0.4, steps=6,
                              scheme="2MN")],
        smear=None, bc="pppa",
        solver_params=SolverParams(r2req=1e-14, maxits=2000,
                                   restarts=2),
        tau=0.3)
    u1, stt = theory.hmc_step(jax.random.PRNGKey(3), u)
    assert abs(float(stt.dH)) < 0.5, float(stt.dH)
