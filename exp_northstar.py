"""North-star trajectory: 32^3x64 nHYP staggered + PV HMC, one chip.

VERDICT round-3 item 3's end condition: one trajectory of the
BASELINE.md north-star composition (nHYP-smeared staggered fermion +
Pauli-Villars boson + Wilson gauge action) completes end-to-end with
dH sane, via the split-step dispatcher with the slice-aware
per-addend smeared-force pullback (mcmc/md._pb_split +
gauge.smear.StageTerm + optimization-barrier sequencing).

Prints per-phase wall times (utils.profile tree), dH, acceptance, and
optionally runs the reversibility check.

Usage: python exp_northstar.py [ns nt] [--cpu] [--steps G F] [--rev]
"""

import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cpu = "--cpu" in argv
    if cpu:
        argv.remove("--cpu")
    rev = "--rev" in argv
    if rev:
        argv.remove("--rev")
    gsteps, fsteps = 4, 2
    if "--steps" in argv:
        i = argv.index("--steps")
        gsteps, fsteps = int(argv[i + 1]), int(argv[i + 2])
        del argv[i:i + 3]
    ns, nt = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (32, 64)

    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge.smear import HypCoefs
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)
    from qex_tpu.ops import group, linalg
    from qex_tpu.solvers.base import SolverParams
    from qex_tpu.utils.profile import Profiler

    lat = Lattice((ns, ns, ns, nt))
    dtype = jnp.complex64 if not cpu else jnp.complex64
    print(f"# north-star trajectory at {lat.dims} on "
          f"{jax.devices()[0].device_kind} g_steps={gsteps} "
          f"f_steps={fsteps}")

    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(7.0), steps=gsteps),
        fermions=[
            FermionSpec("fermion", 0.05, steps=fsteps, smeared=True),
            FermionSpec("boson", 0.5, steps=fsteps, smeared=True),
        ],
        smear=HypCoefs(0.4, 0.5, 0.5), bc="aaaa",
        solver_params=SolverParams(r2req=1e-8, maxits=1000, restarts=2,
                                   sloppy=not cpu),
        force_solver_params=SolverParams(r2req=1e-7, maxits=1000,
                                         restarts=2, sloppy=not cpu),
        tau=0.5)

    @jax.jit
    def hot(seed):
        key = jax.random.PRNGKey(seed)
        return jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
            for i in range(lat.nd)])

    u = hot(5)
    prof = Profiler()
    t0 = time.time()
    u1, st = theory.hmc_step_split(jax.random.PRNGKey(17), u,
                                   always_accept=True, prof=prof)
    dh = float(st.dH)
    t1 = time.time() - t0
    print(f"# trajectory 1 (cold compiles): {t1:.1f} s  dH={dh:+.6g} "
          f"h_old={float(st.h_old):.8g}")
    print(prof.report())
    prof.reset()

    t0 = time.time()
    u2, st2 = theory.hmc_step_split(jax.random.PRNGKey(18), u1,
                                    always_accept=True, prof=prof)
    dh2 = float(st2.dH)
    t2 = time.time() - t0
    print(f"# trajectory 2 (warm): {t2:.1f} s  dH={dh2:+.6g}")
    print(prof.report())

    if rev:
        rr = theory.reverse_check_split(jax.random.PRNGKey(18), u1)
        print(f"# REVCHECK dH_fwd={float(rr['dH_fwd']):+.6g} "
              f"dH_rev={float(rr['dH_rev']):+.3e} "
              f"u_dev2={float(rr['u_dev2']):.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
