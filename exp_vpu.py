"""Same-process A/B of Dslash kernel variants on the TPU (32^4).

The tunneled chip's throughput swings ~1.5x over hours, so ONLY
same-process comparisons are meaningful (CLAUDE.md).  Variants:
  v3-f32   current headline kernel
  v3-bf16  bf16 links (sloppy inner kernel)
  v4-f32   fused-VPU kernel
  v4-bf16  fused-VPU kernel, bf16 links
  v4-bf16-co  compute-only diagnostic (1/8 link DMA) -> VPU floor
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas3 as sp3
    from qex_tpu.physics import stag_pallas4 as sp4
    from qex_tpu.physics import staggered as st

    dims = (32, 32, 32, 32)
    lat = Lattice(dims)
    dtype = jnp.complex64
    iters = 50
    mass = 0.1
    sites = lat.volume // 2
    flops = 594 * sites

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
                              jnp.float32)
        return s.g_e, s.g_o, x / jnp.sqrt(jnp.sum(x * x))

    from functools import partial

    @partial(jax.jit, static_argnums=2)
    def make_links(ge, go, bf16):
        p = sp3.new_pallas3(sf.FastStagEO(lat, ge, go),
                            links_dtype=jnp.bfloat16 if bf16
                            else jnp.float32)
        return p.l_e, p.l_o

    def chain_fn(dslash_fn):
        @jax.jit
        def chain(le, lo, v):
            so = sp3.PallasStagEO3(lat, le, lo)
            vs = jnp.stack([v, jnp.zeros_like(v)])

            def body(vs, _):
                t = dslash_fn(so, vs, 1)
                w = dslash_fn(so, t, 0)
                w = (mass * mass) * vs - w
                w = w / jnp.sqrt(jnp.sum(w * w))
                return w, None

            vs, _ = jax.lax.scan(body, vs, None, length=iters)
            return jnp.sum(vs * vs).astype(jnp.float32)
        return chain

    ge, go, x = setup(jax.random.PRNGKey(11))
    lf = make_links(ge, go, False)
    lb = make_links(ge, go, True)

    # correctness cross-check on chip (v4 vs v3, f32)
    @jax.jit
    def cross(le, lo, v):
        so = sp3.PallasStagEO3(lat, le, lo)
        vs = jnp.stack([v, jnp.zeros_like(v)])
        a = sp3.dslash_pallas3(so, vs, 1)
        b = sp4.dslash_pallas4(so, vs, 1)
        return (jnp.sum((a - b) ** 2) / jnp.sum(a * a)).astype(jnp.float32)

    print(f"# v4-vs-v3 on-chip rel dev: {float(cross(*lf, x)):.3e}",
          flush=True)

    variants = [
        ("v3-f32", chain_fn(sp3.dslash_pallas3), lf),
        ("v3-bf16", chain_fn(sp3.dslash_pallas3), lb),
        ("v4-f32", chain_fn(sp4.dslash_pallas4), lf),
        ("v4-bf16", chain_fn(sp4.dslash_pallas4), lb),
        ("v4-bf16-co", chain_fn(
            lambda s, v, p: sp4.dslash_pallas4(s, v, p,
                                               compute_only=True)), lb),
    ]
    for name, ch, links in variants:
        try:
            float(ch(*links, x))
            t0 = time.perf_counter()
            float(ch(*links, x))
            dt = (time.perf_counter() - t0) / (iters * 2)
            print(f"{name}: {dt*1e3:.3f} ms/app  "
                  f"{flops/dt/1e9:.1f} GF/s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
