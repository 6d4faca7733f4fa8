"""On-chip A/B: sloppy (bf16-link) vs plain f32 eo CG at 24^4.

24^4 is the staghmc_spv production volume (CONFIG4) and routes through
the z-blocked v1 Pallas kernel (YX % 128 != 0 so v3 doesn't apply) --
the one kernel path whose bf16-link variant had no same-process
measurement yet.  This is what the new `<solver><sloppy_solve>` deck
key toggles for the force/action solves.

Same-process A/B (the tunnel's throughput swings ~1.5x across hours).

Usage: python exp_sloppy24.py [L=24] [m=0.05]
"""

import sys
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_solve, staggered as st
from qex_tpu.solvers.base import SolverParams

L = int(sys.argv[1]) if len(sys.argv) > 1 else 24
M = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
R2 = 1e-12


def main():
    lat = Lattice((L, L, L, L))
    print(f"backend={jax.default_backend()} lat={lat.dims} m={M}",
          flush=True)
    key = jax.random.PRNGKey(11)

    @jax.jit
    def mk():
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc,
                jnp.complex64)) for i in range(lat.nd)])
        b = jax.random.normal(jax.random.fold_in(key, 9),
                              (2,) + lat.vector_shape(), jnp.float32)
        return u, b[0] + 1j * b[1]

    u, b = mk()

    def run(tag, sloppy):
        sp = SolverParams(r2req=R2, maxits=4000, restarts=5,
                          sloppy=sloppy)

        @jax.jit
        def solve(u, b):
            s = st.new_stag_eo(lat, u, "pppa")
            from qex_tpu.ops import eo
            b_e, _ = eo.pack(b, lat.nd)
            x, stats = stag_solve.solve_ee(s, b_e, M, sp)
            rel = linalg.norm2(st.d2ee(s, x, M) - b_e) / linalg.norm2(b_e)
            return stats.iterations.astype(jnp.float32), rel

        its, rel = solve(u, b)          # compile + warm
        its0, rel0 = float(its), float(rel)
        t0 = time.perf_counter()
        its, rel = solve(u, b)
        its1, rel1 = float(its), float(rel)
        dt = time.perf_counter() - t0
        print(f"{tag}: {dt:.3f} s  its={its1:.0f}  true rel_r2="
              f"{rel1:.3e}", flush=True)
        return dt

    t_f32 = run("plain f32    ", False)
    t_slp = run("sloppy bf16  ", True)
    print(f"speedup: {t_f32 / t_slp:.3f}x", flush=True)
    print("EXP_SLOPPY24 OK", flush=True)


if __name__ == "__main__":
    main()
