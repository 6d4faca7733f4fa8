"""Arbitrary-Nc generality (the reference's compile-time Nc knob,
base/globals.nim setDefaultNc): SU(2) and U(1) lattices must work
through the same code paths."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_solve, staggered as st
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.mark.parametrize("nc", [1, 2])
def test_gauge_sector_nc(nc):
    lat = Lattice((4, 4, 4, 4), nc=nc)
    key = jax.random.PRNGKey(nc)
    u = jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, nc, DT))
        for i in range(lat.nd)])
    # unitarity of exp(TAH)
    dev = group.check_su(u[0])
    assert dev["unitarity_dev2_per_site"] < 1e-20
    # plaquette on unit gauge == 1; gauge invariance
    uu = group.unit_gauge(lat, DT)
    assert float(loops.plaquette(lat, uu)) == pytest.approx(1.0)
    # force finite-diff for Wilson action
    c = ga.wilson(2.0)
    f = ga.gauge_force(c, lat, u)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, nc, DT))(
        jax.random.split(key, lat.nd))
    act = partial(ga.full_action, c, lat)

    def s_at(t):
        ex = jax.vmap(linalg.expm)(t * p)
        return float(act(jnp.einsum("dab...,dbc...->dac...", ex, u)))

    h = 1e-5
    num = (s_at(h) - s_at(-h)) / (2 * h)
    ana = float(-jnp.sum(jnp.real(jnp.einsum("dab...,dba...->", f, p))))
    assert abs(num - ana) < 1e-6 * max(1.0, abs(num))


def test_su2_hmc_and_staggered_solve():
    nc = 2
    lat = Lattice((4, 4, 4, 4), nc=nc)
    key = jax.random.PRNGKey(5)
    u = jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, nc, DT))
        for i in range(lat.nd)])
    c = ga.wilson(2.2)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    u1, stt = hmc.hmc_step(jax.random.PRNGKey(7), u, act, frc,
                           integrators.get_integrator("2MN"), 0.5, 10)
    assert abs(float(stt.dH)) < 0.5
    # staggered solve at nc=2
    s = st.new_stag_eo(lat, u, bc="pppp")
    b = (jax.random.normal(key, lat.vector_shape())
         + 0j).astype(DT)
    x, stats = stag_solve.solve(s, b, 0.2, SolverParams(r2req=1e-16))
    g = st.phase_links(lat, u, "pppp")
    r = st.d_full(lat, g, x, 0.2) - b
    assert float(linalg.norm2(r)) / float(linalg.norm2(b)) < 1e-12
