"""Nambu HMC tests: generator algebra, adjoint projection round-trip,
Hamiltonian behavior of the Nambu integrator."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge.smear import StoutCoefs, stout_smear
from qex_tpu.hmc import nambu
from qex_tpu.ops import group, linalg

DT = jnp.complex128


def test_su_generators():
    g = nambu.su_generators(3)
    assert g.shape == (8, 3, 3)
    for a in range(8):
        # antihermitian, traceless
        assert np.allclose(g[a], -g[a].conj().T)
        assert abs(np.trace(g[a])) < 1e-14
        for b in range(8):
            want = -0.5 if a == b else 0.0
            assert np.trace(g[a] @ g[b]).real == pytest.approx(
                want, abs=1e-13)


def test_project_expand_roundtrip():
    lat = Lattice((2, 2, 2, 2))
    gens = jnp.asarray(nambu.su_generators(3), DT)
    key = jax.random.PRNGKey(1)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, 3, DT))(
        jax.random.split(key, 4))
    v = nambu.project_ta(p, gens)
    p2 = nambu.expand_ta(v, gens)
    assert float(linalg.norm2(p2 - p)) < 1e-24 * float(linalg.norm2(p))
    v2 = nambu.project_ta(p2, gens)
    assert float(jnp.sum((v2 - v) ** 2)) < 1e-24 * float(
        jnp.sum(v ** 2))


def test_nambu_dh_scales_and_small():
    """The Nambu integrator must approximately conserve the target H:
    |dH| decreases with step count; warmup trajectory runs."""
    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(3)
    u = jnp.stack([
        linalg.expm(0.3 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    target = partial(ga.full_action, ga.wilson(5.0), lat)

    def guide(uu):
        return ga.full_action(ga.wilson(5.0), lat,
                              stout_smear(StoutCoefs(0.08), lat, uu))

    gens = jnp.asarray(nambu.su_generators(3), DT)
    sys_ = nambu.NambuSystem(target, guide, gens)

    def dh_at(nsteps):
        _, dH, dG, _ = nambu.nambu_hmc_step(
            jax.random.PRNGKey(7), u, sys_, 0.5, nsteps,
            always_accept=True)
        return abs(float(dH))

    d20, d40 = dh_at(20), dh_at(40)
    assert d40 < d20, (d20, d40)
    assert d40 < 1.0, d40
