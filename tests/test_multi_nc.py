"""Nc-genericity of the gauge sector (the multi_nc.nim example role).

The reference runs the same gauge-force + exp-update loop over U(1),
SU(2) and SU(3) fields at once (reference: src/examples/multi_nc.nim).
Here: for nc in {1, 2, 4} (3 is everywhere else in the suite) check
that the hand-staple force matches AD, the force matches finite
differences, and one HMC trajectory conserves H and reverses exactly.
nc=4 also exercises the generic (non-closed-form) det/expm paths.
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group, linalg

DT = jnp.complex128


def make_u(lat, seed=11):
    key = jax.random.PRNGKey(seed)
    if lat.nc == 1:
        # U(1): SU(1) is trivial; use Haar-random phases
        return jnp.stack([
            group.random_unitary(jax.random.fold_in(key, i), lat.dims,
                                 1, DT) for i in range(lat.nd)])
    return jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc,
                        DT) for i in range(lat.nd)])


@pytest.mark.parametrize("nc", [1, 2, 4])
def test_force_matches_ad_and_fd(nc):
    lat = Lattice((4, 4, 4, 4), nc=nc)
    u = make_u(lat)
    c = ga.wilson(5.5)
    act = partial(ga.full_action, c, lat)

    f_hand = ga.gauge_force(c, lat, u)
    f_ad = ga.force_from_action(act, u)
    dev = float(linalg.norm2(f_hand - f_ad) / linalg.norm2(f_ad))
    assert dev < 1e-24

    # directional finite difference along a random TAH direction:
    # dS/dt along U -> exp(t p) U equals -<F, p> = sum retr(F p)
    key = jax.random.PRNGKey(7)
    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(key, lat.nd))
    eps = 1e-5

    def s_at(t):
        un = jax.vmap(lambda pp, uu: linalg.mul(linalg.expm(t * pp), uu)
                      )(p, u)
        return float(act(un))

    ds_fd = (s_at(eps) - s_at(-eps)) / (2 * eps)
    ds_an = float(jnp.sum(jax.vmap(
        lambda ff, pp: linalg.redot(ff, pp))(f_hand, p)))
    assert ds_fd == pytest.approx(ds_an, rel=1e-7)


@pytest.mark.parametrize("nc", [1, 2, 4])
def test_hmc_trajectory_conserves_and_reverses(nc):
    lat = Lattice((4, 4, 4, 4), nc=nc)
    u = make_u(lat, seed=3)
    c = ga.wilson(2.0 * nc if nc > 1 else 1.0)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    integ = integrators.get_integrator("2MN")

    step = jax.jit(lambda k, uu: hmc.hmc_step(k, uu, act, frc, integ,
                                              0.2, 20))
    u1, st = step(jax.random.PRNGKey(1), u)
    assert abs(float(st.dH)) < 0.05  # fine steps conserve H

    p = jax.vmap(lambda k: group.random_tah(k, lat.dims, lat.nc, DT))(
        jax.random.split(jax.random.PRNGKey(1), lat.nd))
    rev = hmc.check_reverse(u, p, act, frc, integ, 0.2, 10)
    assert abs(float(rev["dH_rev"])) < 1e-8
    assert float(rev["u_dev2"]) < 1e-20

    # links stay in the group
    chk = group.check_su(jnp.moveaxis(u1, 0, -1).reshape(
        (lat.nc, lat.nc, -1)))
    assert float(chk["unitarity_dev2_per_site"]) < 1e-18
