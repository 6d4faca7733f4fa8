"""Pure-gauge HMC program.

TPU-native replacement for QEX's src/examples/puregaugehmc.nim (CLI
params: lattice size, beta, tau, steps, integrator, seed, ntraj) --
driver config #3 (16^3x32 quenched SU(3) HMC).

Usage:
    python -m qex_tpu.apps.puregauge_hmc --lattice 16 16 16 32 \
        --beta 6.0 --tau 1.0 --steps 20 --int 2MN --ntraj 10 [--cpu]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    # long-running app: line-buffer stdout so progress survives
    # pipes and timeouts
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    ap = argparse.ArgumentParser(prog="puregauge_hmc")
    ap.add_argument("--lattice", type=int, nargs="+",
                    default=[8, 8, 8, 8])
    ap.add_argument("--nc", type=int, default=3,
                    help="gauge group SU(nc); nc=1 gives the compact "
                         "U(1) examples (puregauge2du1 analog)")
    ap.add_argument("--beta", type=float, default=6.0)
    ap.add_argument("--c1", type=float, default=None)
    ap.add_argument("--adj", type=float, default=None)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--int", dest="integ", default="2MN")
    ap.add_argument("--ntraj", type=int, default=10)
    ap.add_argument("--seed", type=int, default=987654321)
    ap.add_argument("--start", default="cold", choices=["cold", "hot"])
    ap.add_argument("--warmup", type=int, default=1,
                    help="trajectories with Metropolis disabled")
    ap.add_argument("--save", help="checkpoint path to write at the end")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import loops
    from qex_tpu.hmc import hmc, integrators
    from qex_tpu.io import checkpoint as ckpt
    from qex_tpu.ops import group, linalg

    lat = Lattice(tuple(args.lattice), nc=args.nc)
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64

    if args.adj is not None:
        coeffs = ga.adjoint_action(args.beta, args.adj)
    elif args.c1 is not None:
        coeffs = ga.gauge_act_rect(args.beta, args.c1)
    else:
        coeffs = ga.wilson(args.beta)
    act = partial(ga.full_action, coeffs, lat)
    frc = partial(ga.gauge_force, coeffs, lat)
    scheme = integrators.get_integrator(args.integ)
    print(f"# puregauge_hmc {lat.dims} beta={args.beta} tau={args.tau} "
          f"steps={args.steps} int={scheme.name} "
          f"device={jax.devices()[0]}")

    if args.start == "cold":
        u = group.unit_gauge(lat, dtype)
    else:
        @jax.jit
        def hot(seed):
            key = jax.random.PRNGKey(seed)
            return jnp.stack([
                linalg.expm(0.7 * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
                for i in range(lat.nd)])
        u = hot(args.seed)

    @jax.jit
    def step(key, u, warm):
        u, st = hmc.hmc_step(key, u, act, frc, scheme, args.tau,
                             args.steps, always_accept=warm)
        pl = loops.plaquette(lat, u)
        return u, st, jnp.real(pl).astype(jnp.float32)

    n_acc = 0
    for traj in range(args.ntraj):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), traj)
        warm = traj < args.warmup
        u, st, pl = step(key, u, warm)
        acc = bool(st.accepted)
        n_acc += int(acc and not warm)
        print(f"traj {traj}: dH {float(st.dH):+.6g} "
              f"{'ACCEPT' if acc else 'REJECT'}{' [warmup]' if warm else ''}"
              f" MEASplaq {float(pl):.10g} ({time.time()-t0:.2f} s)")
    meas = args.ntraj - args.warmup
    if meas > 0:
        print(f"# acceptance {n_acc}/{meas} = {n_acc/meas:.3f}")
    if args.save:
        ckpt.save_checkpoint(args.save, u, {"seed": args.seed},
                             args.ntraj)
        print(f"# saved {args.save}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
