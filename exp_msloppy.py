"""On-chip A/B: mixed-precision (bf16-link) refined multishift vs plain
f32 multishift on the 8-term staggered operator.

OUTCOME (measured 32^4, masses 0.025-0.2): the bf16 sloppy joint pass +
per-shift refinement is 0.69x -- SLOWER -- at light masses, because the
sloppy per-shift refinement stalls once eps_bf16 * kappa(A + sigma) > 1
(eps_bf16 ~ 3.9e-3; sigma = m^2 = 6e-4 gives kappa ~ 4e3) and the f32
closure solves cannot share a Krylov space the way the joint multishift
pass does.  stag_solve.solve_multi therefore routes params.sloppy
through bf16 ONLY when every shift satisfies the refinement criterion
(min sigma >= 2 * eps_bf16 * lambda_max); light-mass decks silently get
the pure-f32 refined path.  Single-mass solve_ee keeps the bf16 inner
pass (restarts re-anchor it; measured 1.58x at 24^4 m=0.05).

This script verifies both routes land identical true residuals and
reports the timing.  Usage: python exp_msloppy.py [L=32]
"""

import sys
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_solve, staggered as st
from qex_tpu.solvers.base import SolverParams

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
MASSES = [0.025, 0.05, 0.1, 0.2]
HEAVY = [0.4, 0.5, 0.7, 1.0]     # all shifts above the sloppy criterion
R2 = 1e-10


def main():
    lat = Lattice((L, L, L, L))
    print(f"backend={jax.default_backend()} lat={lat.dims} r2req={R2}",
          flush=True)
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

    def run(tag, masses, sloppy):
        sp = SolverParams(r2req=R2, maxits=1200, restarts=3,
                          sloppy=sloppy)

        @jax.jit
        def solve(ge_, go_, b_):
            s_ = st.StaggeredEO(lat, ge_, go_)
            xs, stats = stag_solve.solve_multi(s_, b_, masses, sp)
            return jnp.stack(xs), stats.iterations, stats.r2

        xs, its, r2 = solve(ge, go, b)
        float(its)  # compile + warm
        t0 = time.perf_counter()
        xs, its, r2 = solve(ge, go, b)
        itv = float(its)
        dt = time.perf_counter() - t0

        # true residuals per mass; links enter as jit ARGUMENTS (a
        # closure capture becomes a compile constant the axon tunnel
        # cannot fetch) and scalars come back as a tuple
        @jax.jit
        def resid(ge_, go_, xs_, b_):
            s_ = st.StaggeredEO(lat, ge_, go_)
            return tuple(
                linalg.norm2(st.d2ee(s_, xs_[i], m) - b_)
                / linalg.norm2(b_)
                for i, m in enumerate(masses))

        rs = [float(x) for x in resid(ge, go, xs, b)]
        print(f"{tag}: {dt:.3f} s, its={itv:.0f}, "
              f"true rel r2={['%.2e' % r for r in rs]}", flush=True)
        return dt, rs

    # light masses: sloppy=True must fall back to the f32 route
    t_f32, r_f32 = run("light f32        ", MASSES, sloppy=False)
    t_b16, r_b16 = run("light sloppy flag", MASSES, sloppy=True)
    print(f"light-mass ratio (expect ~1.0, fallback): "
          f"{t_f32 / t_b16:.2f}x", flush=True)
    # f32 closure floor at 32^4 is ~7e-10 (restarts=3); both routes
    # must land the same residuals
    assert max(r_b16) < 3e-9, r_b16
    assert max(abs(a - c) / max(a, c) for a, c in zip(r_f32, r_b16)) \
        < 0.5, (r_f32, r_b16)

    # heavy shifts: the bf16 joint pass + cheap refinements engage
    t_hf, r_hf = run("heavy f32        ", HEAVY, sloppy=False)
    t_hb, r_hb = run("heavy bf16 sloppy", HEAVY, sloppy=True)
    print(f"heavy-mass sloppy speedup: {t_hf / t_hb:.2f}x", flush=True)
    assert max(r_hb) < 3e-9, r_hb
    print("EXP_MSLOPPY OK", flush=True)


if __name__ == "__main__":
    main()
