"""Benchmark the v3 (manual-DMA) Pallas Dslash kernel on TPU."""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas3 as sp
    from qex_tpu.physics import staggered as st

    dims = (32, 32, 32, 32)
    lat = Lattice(dims)
    dtype = jnp.complex64
    iters = 50
    links_dtype = jnp.bfloat16 if "bf16" in sys.argv else jnp.float32
    ints = [int(a) for a in sys.argv[1:] if a.isdigit()]
    nslots = ints[0] if ints else 2
    nsplit = ints[1] if len(ints) > 1 else 3

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, 5)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               dtype))
            for i in range(4)])
        s = sf.new_fast(st.new_stag_eo(lat, u))
        p = sp.new_pallas3(s, links_dtype)
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]),
                              jnp.float32).astype(dtype)
        return (p.l_e, p.l_o, sp._split(x), s.g_e, s.g_o, x)

    le, lo, xs, ge, go, xc = setup(jax.random.PRNGKey(7))

    # correctness on-chip
    @jax.jit
    def check(le, lo, xs, ge, go, xc):
        o1 = sp.dslash_pallas3(sp.PallasStagEO3(lat, le, lo), xs, 1, nslots=nslots, nsplit=nsplit)
        o2 = sf.dslash_fast(sf.FastStagEO(lat, ge, go), xc, 1)
        d = o1 - jnp.stack([jnp.real(o2), jnp.imag(o2)]).astype(
            jnp.float32)
        return (jnp.sum(d * d) / jnp.sum(o1 * o1)).astype(jnp.float32)

    dev = float(check(le, lo, xs, ge, go, xc))
    print(f"# on-chip rel dev^2 pallas3 vs fast: {dev:.3e}", flush=True)

    @jax.jit
    def chain(le, lo, v):
        so = sp.PallasStagEO3(lat, le, lo)

        def body(v, _):
            w = sp.dslash_pallas3(so, v, 1, nslots=nslots, nsplit=nsplit)
            w = sp.dslash_pallas3(so, w, 0, nslots=nslots, nsplit=nsplit)
            w = w / jnp.sqrt(jnp.sum(w * w))
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.sum(v * v).astype(jnp.float32)

    float(chain(le, lo, xs))
    t0 = time.perf_counter()
    float(chain(le, lo, xs))
    dt = (time.perf_counter() - t0) / iters
    sites = lat.volume // 2
    lb = 2 if links_dtype == jnp.bfloat16 else 4
    byt = (8 * 18 * lb + 4 * 24) * sites
    model = (8 * 72 + 8 * 24 + 24) * sites
    print(f"pallas3 ({links_dtype.__name__} nslots={nslots} nsplit={nsplit}): {dt*1e3:.3f} ms/app  "
          f"{byt/dt/1e9:.0f} GB/s eff  {594*sites/dt/1e9:.1f} GF/s "
          f"({100*model/dt/1e9/819:.1f}% model roofline)")


if __name__ == "__main__":
    main()
