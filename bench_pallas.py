"""Benchmark the Pallas Dslash kernel vs the XLA fast path on TPU."""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas as sp
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
        return (sp._split(s.g_e), sp._split(s.g_o), sp._split(x),
                s.g_e, s.g_o, x)

    gse, gso, xs, ge, go, xc = setup(jax.random.PRNGKey(7))
    ps = sp.PallasStagEO(lat, gse, gso)
    fs = sf.FastStagEO(lat, ge, go)

    # correctness on-chip
    @jax.jit
    def check(gse, gso, xs, ge, go, xc):
        o1 = sp.dslash_pallas(sp.PallasStagEO(lat, gse, gso), xs, 1,
                              nzb=nzb)
        o2 = sf.dslash_fast(sf.FastStagEO(lat, ge, go), xc, 1)
        d = o1 - jnp.stack([jnp.real(o2), jnp.imag(o2)]).astype(
            jnp.float32)
        return (jnp.sum(d * d) / jnp.sum(o1 * o1)).astype(jnp.float32)

    dev = float(check(gse, gso, xs, ge, go, xc))
    print(f"# on-chip rel dev^2 pallas vs fast: {dev:.3e}", flush=True)

    @jax.jit
    def chain_pallas(gse, gso, v):
        so = sp.PallasStagEO(lat, gse, gso)

        def body(v, _):
            w = sp.dslash_pallas(so, v, 1, nzb=nzb)
            w = sp.dslash_pallas(so, w, 0, nzb=nzb)
            w = w / jnp.sqrt(jnp.sum(w * w))
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.sum(v * v).astype(jnp.float32)

    float(chain_pallas(gse, gso, xs))
    t0 = time.perf_counter()
    float(chain_pallas(gse, gso, xs))
    dt = (time.perf_counter() - t0) / iters
    sites = lat.volume // 2
    byt = (8 * 72 + 8 * 24 + 24) * sites
    print(f"pallas nzb={nzb}: {dt*1e3:.3f} ms/app  "
          f"{byt/dt/1e9:.0f} GB/s eff  {594*sites/dt/1e9:.1f} GF/s "
          f"({100*byt/dt/1e9/819:.1f}% roofline)")


if __name__ == "__main__":
    main()
