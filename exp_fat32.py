"""Real 32^4 two-level HISQ fattening + multishift on ONE chip.

Earlier rounds believed the 32^4 fattening exceeds a v5e's HBM and
used synthetic links for CONFIG6 (bench_configs.py).  Two fixes change
that: the MGS Haar sampler (no 57x-padded batched QR) and
hisq_links_lowmem's per-direction jits (temps freed between calls).
This experiment measures whether the REAL fattening fits and what the
full pipeline (fatten + 4-mass multishift) costs at the headline
volume.  Reference role: the 32^4 HISQ ladder entry
(src/physics/stagD.nim:543 newStag3 at scale).

Usage: python exp_fat32.py [L=32]
"""

import sys
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.gauge.fat7 import hisq_links_lowmem
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import stag_hmc
from qex_tpu.physics import staggered as st
from qex_tpu.solvers.base import SolverParams

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
T = int(sys.argv[2]) if len(sys.argv) > 2 else L
MASSES = (0.05, 0.1, 0.2, 0.4)


def main():
    lat = Lattice((L, L, L, T))
    print(f"backend={jax.default_backend()} lat={lat.dims}", flush=True)
    key = jax.random.PRNGKey(5)

    @jax.jit
    def mk_u():
        return jnp.stack([group.random_su(jax.random.fold_in(key, i),
                                          lat.dims, lat.nc,
                                          jnp.complex64)
                          for i in range(lat.nd)])

    t0 = time.perf_counter()
    u = mk_u()
    phase = jax.jit(lambda uu: st.phase_links(lat, uu))
    g = phase(u)
    # sync via a scalar fetch
    print(f"hot start + phases: plaq dev "
          f"{float(jax.jit(lambda x: linalg.norm2(x[0,0,0]))(g)):.3e} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    t0 = time.perf_counter()
    fl, ll = hisq_links_lowmem(lat, g)
    s = float(jax.jit(lambda a, b: jnp.real(jnp.sum(jnp.abs(a[0, 0, 0]))
                                            + jnp.sum(jnp.abs(b[0, 0, 0])))
              )(fl, ll))
    t_fat = time.perf_counter() - t0
    print(f"two-level fattening (lowmem, cold): {t_fat:.1f}s  "
          f"checksum {s:.4e}", flush=True)

    # free the first result BEFORE re-fattening: holding the old fl/ll
    # alive across the warm pass doubles the live set and OOMs 32^3x64
    del fl, ll
    t0 = time.perf_counter()
    fl, ll = hisq_links_lowmem(lat, g)
    s = float(jax.jit(lambda a, b: jnp.real(jnp.sum(jnp.abs(a[0, 0, 0]))
                                            + jnp.sum(jnp.abs(b[0, 0, 0])))
              )(fl, ll))
    print(f"two-level fattening (lowmem, warm): "
          f"{time.perf_counter()-t0:.2f}s  checksum {s:.4e}", flush=True)

    ferm = stag_hmc.HisqFermion(lat, MASSES[0],
                                params=SolverParams(r2req=1e-10,
                                                    maxits=600))

    @jax.jit
    def mk_b():
        b = jax.random.normal(jax.random.fold_in(key, 99),
                              (2, lat.nc, lat.dims[3] // 2, lat.dims[2],
                               lat.dims[1] * lat.dims[0]), jnp.float32)
        return sf.from_fast(b[0] + 1j * b[1], lat)

    b_e = mk_b()

    t0 = time.perf_counter()
    from qex_tpu.solvers import cgm
    f3 = None

    @jax.jit
    def multishift(fl, ll, b_e):
        s3 = st.new_stag3_eo(lat, fl, ll)
        f3l = sf.new_fast3(s3)
        _, base, _ = stag_hmc._fast3_ops_sloppy(f3l, None)
        xs, stats = cgm.cg_multishift(base, sf.to_fast(b_e, lat),
                                      [m * m for m in MASSES],
                                      r2req=1e-10, maxits=600)
        s3op = lambda v: st.d2ee3(s3, v, MASSES[0])
        x0 = sf.from_fast(xs[0], lat)
        rel = (linalg.norm2(s3op(x0) - b_e) / linalg.norm2(b_e))
        return stats.iterations, rel

    its, rel = multishift(fl, ll, b_e)
    its, rel = int(its), float(rel)
    t_ms = time.perf_counter() - t0
    print(f"4-mass multishift (cold): {t_ms:.1f}s  its={its} "
          f"rel_r2={rel:.3e}", flush=True)

    t0 = time.perf_counter()
    its, rel = multishift(fl, ll, b_e)
    its, rel = int(its), float(rel)
    t_ms = time.perf_counter() - t0
    print(f"4-mass multishift (warm): {t_ms:.2f}s  its={its} "
          f"rel_r2={rel:.3e}", flush=True)
    print("EXP_FAT32 OK", flush=True)


if __name__ == "__main__":
    main()
