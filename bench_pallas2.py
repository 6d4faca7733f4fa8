"""Benchmark the grid-major (v2) Pallas Dslash on TPU."""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas as sp
    from qex_tpu.physics import stag_pallas2 as sp2
    from qex_tpu.physics import staggered as st

    dims = (32, 32, 32, 32)
    lat = Lattice(dims)
    dtype = jnp.complex64
    iters = 50
    nzb = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, 5)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               dtype))
            for i in range(4)])
        s = sf.new_fast(st.new_stag_eo(lat, u))
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]),
                              jnp.float32).astype(dtype)
        ge = sp2.to_gridmajor_links(sp._split(s.g_e))
        go = sp2.to_gridmajor_links(sp._split(s.g_o))
        xg = sp2.to_gridmajor_spinor(sp._split(x))
        return ge, go, xg, s.g_e, s.g_o, x

    ge, go, xg, fe, fo, xc = setup(jax.random.PRNGKey(7))

    @jax.jit
    def check(ge, go, xg, fe, fo, xc):
        o1 = sp2.dslash_pallas2(sp2.PallasStagEO2(lat, ge, go), xg, 1,
                                nzb=nzb)
        o2 = sf.dslash_fast(sf.FastStagEO(lat, fe, fo), xc, 1)
        o2g = sp2.to_gridmajor_spinor(sp._split(o2))
        d = o1 - o2g
        return (jnp.sum(d * d) / jnp.sum(o1 * o1)).astype(jnp.float32)

    print(f"# on-chip rel dev^2 v2 vs fast: "
          f"{float(check(ge, go, xg, fe, fo, xc)):.3e}", flush=True)

    @jax.jit
    def chain(ge, go, v):
        so = sp2.PallasStagEO2(lat, ge, go)

        def body(v, _):
            w = sp2.dslash_pallas2(so, v, 1, nzb=nzb)
            w = sp2.dslash_pallas2(so, w, 0, nzb=nzb)
            w = w / jnp.sqrt(jnp.sum(w * w))
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.sum(v * v).astype(jnp.float32)

    float(chain(ge, go, xg))
    t0 = time.perf_counter()
    float(chain(ge, go, xg))
    dt = (time.perf_counter() - t0) / iters
    sites = lat.volume // 2
    byt = (8 * 72 + 8 * 24 + 24) * sites
    print(f"pallas2 nzb={nzb}: {dt*1e3:.3f} ms/app  "
          f"{byt/dt/1e9:.0f} GB/s eff  {594*sites/dt/1e9:.1f} GF/s "
          f"({100*byt/dt/1e9/819:.1f}% roofline)")


if __name__ == "__main__":
    main()
