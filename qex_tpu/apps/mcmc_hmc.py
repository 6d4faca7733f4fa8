"""JSON-driven modular MCMC program (the mcmc-framework client).

TPU-native replacement for QEX's src/examples/NfxPV_HMC.nim /
gaugeBosonHMC.nim: build a LatticeFieldTheory from the same JSON deck
format and run HMC with measurements.

Usage:
    python -m qex_tpu.apps.mcmc_hmc --json input.json --ntraj 10 [--cpu]
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
    ap = argparse.ArgumentParser(prog="mcmc_hmc")
    ap.add_argument("--json", required=True)
    ap.add_argument("--ntraj", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.gauge import loops
    from qex_tpu.mcmc.builder import theory_from_json
    from qex_tpu.ops import group, linalg

    lat, theory, meta = theory_from_json(args.json)
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64
    print(f"# mcmc_hmc: {lat.dims} terms="
          f"{[t.name for t in theory.terms]} tau={meta['tau']} "
          f"device={jax.devices()[0]}")

    if meta["start"] == "cold":
        u = group.unit_gauge(lat, dtype)
    else:
        @jax.jit
        def hot(seed):
            key = jax.random.PRNGKey(seed)
            return jnp.stack([
                linalg.expm(0.7 * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
                for i in range(lat.nd)])
        u = hot(meta["parallel_seed"])

    if meta.get("mesh") is not None:
        # GSPMD-sharded chain over the deck's mpi-geometry rank split
        # (mcmcTypes.nim:905-907 newLayout(lat, mpiGeometry))
        from qex_tpu.parallel import shard_field
        lm = meta["mesh"]
        u = shard_field(lm, u, 3)
        print(f"# device mesh rank_geom={lm.rank_geom} "
              f"({len(lm.mesh.devices.flat)} devices)")

    step = jax.jit(lambda k, uu, warm: theory.hmc_step(
        k, uu, always_accept=warm))
    meas = jax.jit(lambda uu: (
        jnp.real(loops.plaquette(lat, uu)).astype(jnp.float32),
        jnp.real(loops.polyakov_loop(lat, uu)).astype(jnp.float32)))

    n_acc = 0
    for traj in range(args.ntraj):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.PRNGKey(meta["serial_seed"]),
                                 traj)
        warm = traj < args.warmup
        u, st = step(key, u, warm)
        pl, plp = meas(u)
        acc = bool(st.accepted)
        n_acc += int(acc and not warm)
        print(f"traj {traj}: dH {float(st.dH):+.6g} "
              f"{'ACCEPT' if acc else 'REJECT'}"
              f"{' [warmup]' if warm else ''} MEASplaq {float(pl):.10g} "
              f"MEASploop {float(plp):.8g} ({time.time()-t0:.2f} s)")
    done = args.ntraj - args.warmup
    if done > 0:
        print(f"# acceptance {n_acc}/{done} = {n_acc/done:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
