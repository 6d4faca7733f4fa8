"""North-star composition dryrun (VERDICT round-2 item 8).

One nHYP-smeared staggered + Pauli-Villars trajectory with
``SolverParams.mesh`` routing the fermion solves through the
physics/stag_shard shard_map kernels, on the 8-device CPU mesh, at a
shape with the SAME sharding structure as the 32^3x64 / v5p-32 north
star (x/y unsharded -- the fused kernels' merged Y*X minor axis --
z and t sharded): 8^3x16 over rank_geom (1, 1, 2, 4).

Asserts bit-level equality of the trajectory with the unsharded
(replicated, default-route) computation -- the capability QEX's whole
comms stack exists to provide (src/physics/stagD.nim:349-396 +
src/comms/halo.nim:62-115 under staghmc_spv).
"""

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.parallel import make_lattice_mesh, shard_field
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


def test_northstar_nhyp_pv_trajectory_sharded():
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge.smear import HypCoefs
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU test mesh")

    lat = Lattice((8, 8, 8, 16))
    lm = make_lattice_mesh(lat, devices=jax.devices()[:8],
                           rank_geom=(1, 1, 2, 4))
    key = jax.random.PRNGKey(41)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])

    def mk(mesh):
        sp = SolverParams(r2req=1e-16, maxits=300, restarts=2, mesh=mesh)
        return LatticeFieldTheory(
            lat,
            GaugeActionSpec(ga.wilson(5.6), steps=2, scheme="2MN"),
            fermions=[
                FermionSpec("fermion", 0.2, steps=1, scheme="2MN",
                            smeared=True),
                FermionSpec("boson", 0.75, steps=1, scheme="2MN",
                            smeared=True),
            ],
            smear=HypCoefs(0.4, 0.5, 0.5), bc="aaaa",
            solver_params=sp, tau=0.2)

    k = jax.random.PRNGKey(7)
    # default route, replicated arrays
    u1a, sta = jax.jit(lambda kk, uu: mk(None).hmc_step(kk, uu))(k, u)
    # stag_shard kernel route, GSPMD-sharded arrays (z/t)
    u1b, stb = jax.jit(lambda kk, uu: mk(lm).hmc_step(kk, uu))(
        k, shard_field(lm, u, 3))
    assert float(stb.dH) == pytest.approx(float(sta.dH), abs=1e-7)
    assert bool(sta.accepted) == bool(stb.accepted)
    dev = float(linalg.norm2(jnp.asarray(u1b) - u1a))
    assert dev < 1e-12 * float(linalg.norm2(u1a)), dev
