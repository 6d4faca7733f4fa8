"""On-chip A/B: fused Wilson Pallas kernel vs the XLA fast layout.

Measures the hopping-term application (QEX wilsonD.nim flop model,
1344 flops/site) and a full eo CGNE solve through wilson.solve_eo's
TPU routing.  Same-process A/B (the tunnel's throughput swings ~1.5x
across hours).

Usage: python exp_wilson.py [L=24] [T=32] [reps=20]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import wilson as wl
from qex_tpu.physics import wilson_fast as wf
from qex_tpu.physics import wilson_pallas as wp

L = int(sys.argv[1]) if len(sys.argv) > 1 else 24
T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20


def main():
    lat = Lattice((L, L, L, T))
    vol_h = lat.volume // 2
    flops = 1344 * vol_h
    print(f"backend={jax.default_backend()} lat={lat.dims}", flush=True)
    key = jax.random.PRNGKey(11)

    @jax.jit
    def mk():
        u = jnp.stack([group.random_su(jax.random.fold_in(key, i),
                                       lat.dims, lat.nc, jnp.complex64)
                       for i in range(4)])
        from qex_tpu.ops import eo
        sgn = wl.bc_signs(lat, "pppa", jnp.float32)
        ge, go = eo.pack(u * sgn[:, None, None], 4)
        x = jax.random.normal(
            jax.random.fold_in(key, 9),
            (4, lat.nc) + lat.dims[:-1] + (lat.dims[-1] // 2,),
            jnp.float32).astype(jnp.complex64)
        return ge, go, x

    ge, go, x = mk()
    m = 0.1

    def fast_chain(ge_, go_, xf):
        fw = wf.FastWilsonEO(lat, sf.to_fast(ge_, lat),
                             sf.to_fast(go_, lat), m)
        y = xf
        for _ in range(REPS):
            y = wf.m_ee_fast(fw, y)
        return linalg.norm2(y)

    def pallas_chain(ge_, go_, xf):
        fw = wf.FastWilsonEO(lat, sf.to_fast(ge_, lat),
                             sf.to_fast(go_, lat), m)
        pw = wp.new_pallas_wilson(fw)
        y = wp._split(xf)
        for _ in range(REPS):
            y = wp.m_ee_pallas(pw, y)
        return linalg.norm2(wp._join(y))

    @jax.jit
    def xf_of(ge_, go_, x_):
        return sf.to_fast(x_, lat)

    xf = xf_of(ge, go, x)

    def time_chain(tag, fn):
        f = jax.jit(fn)
        float(f(ge, go, xf))  # compile + warm
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(ge, go, xf))
            dt = (time.perf_counter() - t0) / (2 * REPS)
            best = dt if best is None else min(best, dt)
        gfs = flops / best * 1e-9
        print(f"{tag}: {best*1e3:.3f} ms/hop, {gfs:.1f} GF/s",
              flush=True)
        return gfs

    # correctness on the real chip first (Mosaic, not interpret)
    @jax.jit
    def dev(ge_, go_, xf_):
        fw = wf.FastWilsonEO(lat, sf.to_fast(ge_, lat),
                             sf.to_fast(go_, lat), m)
        pw = wp.new_pallas_wilson(fw)
        a = wf.m_ee_fast(fw, xf_)
        bb = wp._join(wp.m_ee_pallas(pw, wp._split(xf_)))
        return linalg.norm2(a - bb) / linalg.norm2(a)

    d = float(dev(ge, go, xf))
    print(f"pallas-vs-fast m_ee rel dev: {d:.2e}", flush=True)
    assert d < 1e-9, d

    g_fast = time_chain("xla fast layout ", fast_chain)
    g_pal = time_chain("pallas fused    ", pallas_chain)
    print(f"kernel speedup: {g_pal / g_fast:.2f}x", flush=True)

    # full solve through the production routing
    b = jax.random.normal(
        jax.random.fold_in(key, 21),
        (4, lat.nc) + lat.dims, jnp.float32).astype(jnp.complex64)
    from qex_tpu.solvers.base import SolverParams

    for tag, sloppy in (("f32 ", False), ("bf16", True)):
        sp = SolverParams(r2req=1e-12, maxits=1000, restarts=3,
                          sloppy=sloppy)

        @partial(jax.jit, static_argnums=3)
        def solve(ge_, go_, b_, sp_):
            w_ = wl.WilsonEO(lat, ge_, go_, m)
            xsol, stats = wl.solve_eo(w_, b_, sp_)
            return xsol, stats.iterations, stats.r2

        xsol, its, r2 = solve(ge, go, b, sp)
        float(its)
        t0 = time.perf_counter()
        xsol, its, r2 = solve(ge, go, b, sp)
        itv = float(its)
        dt = time.perf_counter() - t0
        print(f"solve_eo ({tag} inner): {dt:.3f} s, its={itv:.0f}, "
              f"r2={float(r2):.2e}", flush=True)
    print("EXP_WILSON OK", flush=True)


if __name__ == "__main__":
    main()
