"""Generate golden values for the fermionic HMC regression chains.

The reference's de-facto fermionic correctness contract is 3 seeded
staggered trajectories diffed against committed logs at 2e-11
(/root/reference/tests/extra/staghmc_sh/run:20-44: three configs —
plain, Hasenbusch, different integrator/steps — sed out
MEASplaq/MEASpbp/H lines and numeric-diff them).

This tool runs the three 4^4 CPU/f64 compositions that
tests/test_golden.py pins (plain Nf=4+PV, Hasenbusch, nHYP-smeared
+PV) and prints the golden (dH, plaq, pbp) tuples to paste into the
test.  Regenerate ONLY on deliberate, documented convention changes
(RNG stream, force sign, action normalization, integrator
coefficients).

Run: JAX_PLATFORMS=cpu python tools/gen_golden_fermion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.gauge.smear import HypCoefs
from qex_tpu.mcmc import FermionSpec, GaugeActionSpec, LatticeFieldTheory
from qex_tpu.observables.condensate import pbp_staggered
from qex_tpu.ops import group, linalg
from qex_tpu.solvers.base import SolverParams

# Shared chain parameters (mirrored in tests/test_golden.py).
LAT = (4, 4, 4, 4)
SEED = 777
NTRAJ = 3
SP = SolverParams(r2req=1e-20, maxits=2000, restarts=3)


def compositions(lat):
    """The three staghmc_spv-composition chains of the golden contract
    (mirroring /root/reference/tests/extra/staghmc_sh/run:20-35's three
    configs: plain, Hasenbusch, alternate integrator/smearing)."""
    return {
        # Nf=4 staggered + one Pauli-Villars boson, unsmeared
        "plain_pv": LatticeFieldTheory(
            lat,
            gauge=GaugeActionSpec(ga.wilson(5.4), steps=10),
            fermions=[
                FermionSpec("fermion", mass=0.2, steps=5, smeared=False),
                FermionSpec("boson", mass=0.75, steps=5, smeared=False),
            ],
            solver_params=SP, tau=0.6),
        # Hasenbusch-split fermion (ratio m/h + plain at h)
        "hasenbusch": LatticeFieldTheory(
            lat,
            gauge=GaugeActionSpec(ga.wilson(5.4), steps=10),
            fermions=[FermionSpec("fermion", mass=0.1, hmasses=(0.4,),
                                  steps=5, smeared=False)],
            solver_params=SP, tau=0.6),
        # nHYP-smeared fermion + PV (the staghmc_spv production form)
        "nhyp_pv": LatticeFieldTheory(
            lat,
            gauge=GaugeActionSpec(ga.wilson(5.4), steps=8),
            fermions=[
                FermionSpec("fermion", mass=0.2, steps=4, smeared=True),
                FermionSpec("boson", mass=0.75, steps=4, smeared=True),
            ],
            smear=HypCoefs(0.4, 0.5, 0.5),
            solver_params=SP, tau=0.6),
    }


def run_chain(name, theory, lat):
    u = group.unit_gauge(lat, jnp.complex128)
    step = jax.jit(lambda k, uu: theory.hmc_step(k, uu))
    meas = jax.jit(lambda k, uu: (
        loops.plaquette(lat, uu),
        pbp_staggered(k, lat, uu, 0.2, params=SP)))
    rows = []
    for t in range(NTRAJ):
        k = jax.random.fold_in(jax.random.PRNGKey(SEED), t)
        t0 = time.time()
        u, st_ = step(k, u)
        pl, pbp = meas(jax.random.fold_in(k, 999), u)
        rows.append((float(st_.dH), float(pl), float(pbp)))
        print(f"# {name} traj {t}: dH={rows[-1][0]:.17g} "
              f"plaq={rows[-1][1]:.17g} pbp={rows[-1][2]:.17g} "
              f"acc={bool(st_.accepted)} ({time.time()-t0:.1f}s)",
              file=sys.stderr)
    return rows


def main():
    lat = Lattice(LAT)
    print("GOLDEN_FERMION = {")
    for name, theory in compositions(lat).items():
        rows = run_chain(name, theory, lat)
        print(f'    "{name}": [')
        for r in rows:
            print(f"        ({r[0]!r}, {r[1]!r}, {r[2]!r}),")
        print("    ],")
    print("}")


if __name__ == "__main__":
    main()
