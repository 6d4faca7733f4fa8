"""On-chip A/B: mixed-precision (bf16-link) refined multishift vs plain
f32 multishift on the 8-term staggered operator.

The rooted-staggered rational term drives solve_multi; this measures
whether cg_multishift_refined with a bf16-link sloppy joint pass +
per-shift f32 refinements beats the pure f32 multishift at equal true
residuals (the v3 kernel is DMA-bound, so bf16 links pay here, unlike
the 16-term HISQ kernel -- CLAUDE.md perf notes).

Same-process A/B (the tunnel's throughput swings ~1.5x across hours).

Usage: python exp_msloppy.py [L=32]
"""

import sys
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import stag_solve, staggered as st
from qex_tpu.solvers.base import SolverParams

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
MASSES = [0.025, 0.05, 0.1, 0.2]
R2 = 1e-10


def main():
    lat = Lattice((L, L, L, L))
    print(f"backend={jax.default_backend()} lat={lat.dims} "
          f"masses={MASSES} r2req={R2}", flush=True)
    key = jax.random.PRNGKey(3)

    @jax.jit
    def mk():
        u = jnp.stack([group.random_su(jax.random.fold_in(key, i),
                                       lat.dims, lat.nc, jnp.complex64)
                       for i in range(lat.nd)])
        g = st.phase_links(lat, u)
        from qex_tpu.ops import eo
        ge, go = eo.pack(g, lat.nd)
        b = jax.random.normal(jax.random.fold_in(key, 9),
                              (lat.nc,) + lat.dims[:-1]
                              + (lat.dims[-1] // 2,), jnp.float32
                              ).astype(jnp.complex64)
        return ge, go, b

    ge, go, b = mk()
    s = st.StaggeredEO(lat, ge, go)

    def run(tag, sloppy):
        sp = SolverParams(r2req=R2, maxits=1200, restarts=3,
                          sloppy=sloppy)

        @jax.jit
        def solve(ge_, go_, b_):
            s_ = st.StaggeredEO(lat, ge_, go_)
            xs, stats = stag_solve.solve_multi(s_, b_, MASSES, sp)
            return jnp.stack(xs), stats.iterations, stats.r2

        xs, its, r2 = solve(ge, go, b)
        float(its)  # compile + warm
        t0 = time.perf_counter()
        xs, its, r2 = solve(ge, go, b)
        itv = float(its)
        dt = time.perf_counter() - t0

        # true residuals per mass; links enter as jit ARGUMENTS (a
        # closure capture becomes a compile constant the axon tunnel
        # cannot fetch) and scalars come back as a tuple (iterating a
        # device array is an eager op -- also unsupported)
        @jax.jit
        def resid(ge_, go_, xs_, b_):
            s_ = st.StaggeredEO(lat, ge_, go_)
            return tuple(
                linalg.norm2(st.d2ee(s_, xs_[i], m) - b_)
                / linalg.norm2(b_)
                for i, m in enumerate(MASSES))

        rs = [float(x) for x in resid(ge, go, xs, b)]
        print(f"{tag}: {dt:.3f} s, its={itv:.0f}, "
              f"true rel r2={['%.2e' % r for r in rs]}", flush=True)
        return dt, rs

    t_f32, r_f32 = run("f32 multishift (refined)", sloppy=False)
    t_b16, r_b16 = run("bf16 sloppy + f32 refine ", sloppy=True)
    print(f"speedup: {t_f32 / t_b16:.2f}x", flush=True)
    assert max(r_b16) < 3e-10, r_b16
    print("EXP_MSLOPPY OK", flush=True)


if __name__ == "__main__":
    main()
