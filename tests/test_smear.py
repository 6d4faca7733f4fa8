"""Smearing tests: unitarity, gauge covariance, stout inverse, forces.

Oracles follow the reference's tests (tstoutderiv.nim, tstoutinverse.nim;
SURVEY.md §4): exact gauge covariance and invertibility are the
strongest cheap checks on a smearing implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops, smear
from qex_tpu.ops import group, linalg
from qex_tpu.ops.shifts import shift

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(3)
    # mildly rough field (exp of small TAH) so smearing is in its regime
    return jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])


def gauge_transform(lat, u, g):
    return jnp.stack([
        linalg.mul(linalg.mul(g, u[mu]),
                   linalg.adj(shift(g, mu, +1, lat.nd)))
        for mu in range(lat.nd)])


def test_nhyp_unitary_and_smooths(lat, u):
    c = smear.HypCoefs(0.4, 0.5, 0.5)
    v = smear.nhyp_smear(c, lat, u)
    dev = group.check_su(v[0])
    assert dev["unitarity_dev2_per_site"] < 1e-20
    p0 = float(loops.plaquette(lat, u))
    p1 = float(loops.plaquette(lat, v))
    assert p1 > p0


def test_nhyp_gauge_covariance(lat, u):
    c = smear.HypCoefs(0.4, 0.5, 0.5)
    g = group.random_su(jax.random.PRNGKey(9), lat.dims, lat.nc, DT)
    v1 = smear.nhyp_smear(c, lat, gauge_transform(lat, u, g))
    v2 = gauge_transform(lat, smear.nhyp_smear(c, lat, u), g)
    assert float(linalg.norm2(v1 - v2)) / float(linalg.norm2(v2)) < 1e-20


def test_nhyp_unit_gauge_fixed_point(lat):
    c = smear.HypCoefs(0.4, 0.5, 0.5)
    uu = group.unit_gauge(lat, DT)
    v = smear.nhyp_smear(c, lat, uu)
    assert float(linalg.norm2(v - uu)) < 1e-20


def test_stout_unitary_covariant_invertible(lat, u):
    c = smear.StoutCoefs(rho=0.08)
    v = smear.stout_smear(c, lat, u)
    dev = group.check_su(v[0])
    assert dev["unitarity_dev2_per_site"] < 1e-20
    # det stays 1 (exp of traceless)
    d = linalg.det(v[1])
    assert float(jnp.max(jnp.abs(d - 1.0))) < 1e-10
    # covariance
    g = group.random_su(jax.random.PRNGKey(4), lat.dims, lat.nc, DT)
    v1 = smear.stout_smear(c, lat, gauge_transform(lat, u, g))
    v2 = gauge_transform(lat, v, g)
    assert float(linalg.norm2(v1 - v2)) / float(linalg.norm2(v2)) < 1e-20
    # exact inverse (QEX tstoutinverse pattern)
    u_back = smear.stout_smear_inv(c, lat, v, iters=40)
    assert float(linalg.norm2(u_back - u)) / float(linalg.norm2(u)) < 1e-14


def test_smeared_force_matches_grad(lat, u):
    """smeared_force(chain) == d/dU action(smear(U)) when chain is the
    gradient at the smeared point (QEX smearGetForce closure parity)."""
    c = smear.HypCoefs(0.4, 0.5, 0.5)
    coeffs = ga.wilson(5.0)
    act = lambda v: ga.full_action(coeffs, lat, v)
    v = smear.nhyp_smear(c, lat, u)
    chain = jax.grad(act)(v)
    g1 = smear.smeared_force(c, lat, u, chain)
    g2 = jax.grad(lambda uu: act(smear.nhyp_smear(c, lat, uu)))(u)
    assert float(linalg.norm2(g1 - g2)) / float(linalg.norm2(g2)) < 1e-18


def test_smeared_action_force_finite_diff(lat, u):
    """Full chain: AD force of action(nhyp(U)) vs finite differences."""
    c = smear.HypCoefs(0.4, 0.5, 0.5)
    coeffs = ga.wilson(5.0)

    def act(uu):
        return ga.full_action(coeffs, lat, smear.nhyp_smear(c, lat, uu))

    f = ga.force_from_action(act, u)
    key = jax.random.PRNGKey(21)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(key, lat.nd))

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(act(jnp.einsum("dab...,dbc...->dac...", ex, u)))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", f, p))))
    assert abs(num - ana) < 1e-5 * max(1.0, abs(num)), (num, ana)
