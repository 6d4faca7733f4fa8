"""Microbenchmarks: site linalg, shifts, gauge action/force, CG.

TPU-native replacement for QEX's src/bench/ programs:
  benchLinalg(S)  -> linalg section (per-op GB/s and GFLOP/s)
  benchGather     -> shift section (halo/roll bandwidth)
  benchGauge      -> gauge action + force timings
  benchStagProp   -> CG throughput with auto-calibrated run length
                     (the reference calibrates iterations to a
                     wall-time budget, benchStagProp.nim:61-71)

All timing follows the axon-safe recipe: jit + chained dependencies +
one real-scalar fetch per measurement.

Usage: python -m qex_tpu.bench.suite [--cpu] [--lat X Y Z T]
"""

from __future__ import annotations

import argparse
import sys
import time


def _timeit(fn, *args, budget_s: float = 1.0):
    """(secs_per_call, calls) with run length auto-calibrated to the
    budget (benchStagProp auto-calibration parity)."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    dt1 = time.perf_counter() - t0
    n = max(1, int(budget_s / max(dt1, 1e-5)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n, n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bench_suite")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lat", type=int, nargs=4, default=[16, 16, 16, 16])
    ap.add_argument("--budget", type=float, default=1.0,
                    help="seconds per measurement")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.ops import group, linalg
    from qex_tpu.ops.shifts import shift
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import staggered as st
    from qex_tpu.solvers import cg

    lat = Lattice(tuple(args.lat))
    dtype = jnp.complex64
    V = lat.volume
    print(f"# bench suite: {lat.dims} {jax.devices()[0].device_kind}")

    @jax.jit
    def setup(seed):
        key = jax.random.PRNGKey(seed)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
            for i in range(lat.nd)])
        m = linalg.expm(0.3 * group.random_tah(
            jax.random.fold_in(key, 9), lat.dims, lat.nc, dtype))
        v = jax.random.normal(key, lat.vector_shape(),
                              jnp.float32).astype(dtype)
        return u, m, v

    u, m, v = setup(0)

    # --- linalg (benchLinalg) ------------------------------------------
    def scal(x):
        return jnp.real(jnp.sum(jnp.abs(x) ** 2)).astype(jnp.float32)

    cases = {
        "mat*mat": jax.jit(lambda a: scal(linalg.mul(a, a))),
        "mat*vec": jax.jit(lambda a, b: scal(linalg.mv(a, b))),
        "expm": jax.jit(lambda a: scal(linalg.expm(0.1 * a))),
        "project_u": jax.jit(lambda a: scal(linalg.project_u(a))),
        "tah": jax.jit(lambda a: scal(group.tah(a))),
    }
    flops = {
        "mat*mat": V * (8 * 27 + 9 * 2),
        "mat*vec": V * (8 * 9 + 3 * 2),
        "expm": V * (8 * 27 * 16),
        "project_u": V * (8 * 27 * 3 * 15),
        "tah": V * 9 * 4,
    }
    for name, fn in cases.items():
        fargs = (m, v) if name == "mat*vec" else (m,)
        dt, n = _timeit(fn, *fargs, budget_s=args.budget)
        print(f"linalg {name:10s}: {dt*1e6:9.1f} us "
              f"{flops[name]/dt/1e9:8.1f} GF/s  (x{n})")

    # --- shifts (benchGather) ------------------------------------------
    for mu in range(lat.nd):
        f = jax.jit(lambda a, mu=mu: scal(shift(a, mu, +1, lat.nd)))
        dt, n = _timeit(f, v, budget_s=args.budget / 2)
        byt = 2 * V * lat.nc * 8
        print(f"shift mu={mu}: {dt*1e6:9.1f} us {byt/dt/1e9:8.1f} GB/s"
              f"  (x{n})")

    # --- gauge action + force (benchGauge) -----------------------------
    c = ga.symanzik(6.0)
    act = jax.jit(lambda uu: jnp.real(
        ga.full_action(c, lat, uu)).astype(jnp.float32))
    frc = jax.jit(lambda uu: scal(ga.gauge_force(c, lat, uu)))
    dt, n = _timeit(act, u, budget_s=args.budget)
    print(f"gauge action (symanzik): {dt*1e3:9.2f} ms  (x{n})")
    dt, n = _timeit(frc, u, budget_s=args.budget)
    print(f"gauge force  (AD):       {dt*1e3:9.2f} ms  (x{n})")

    # --- CG throughput (benchStagProp) ---------------------------------
    @jax.jit
    def cg_run(uu, vv):
        s = sf.new_fast(st.new_stag_eo(lat, uu))
        from qex_tpu.ops.eo import pack
        be, _ = pack(vv, lat.nd)
        bf = sf.to_fast(be, lat)
        x, stats = cg.cg_solve(lambda w: sf.d2ee_fast(s, w, 0.01), bf,
                               r2req=1e-8, maxits=300)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    r2, its = cg_run(u, v)
    float(r2)
    t0 = time.perf_counter()
    r2, its = cg_run(u, v)
    nits = float(its)
    dt = time.perf_counter() - t0
    fl = (lat.nd * 4 * 72 + 60) * (V // 2) * nits
    print(f"CG m=0.01: {dt:6.3f} s, {int(nits)} iters, "
          f"{fl/dt/1e9:8.1f} GF/s (QEX flop model)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
