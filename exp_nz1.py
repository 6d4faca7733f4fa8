"""Same-process A/B: s8 / HISQ streamed kernels with split z-grid
(nzb=8: psi_zm/zp neighbor blocks streamed) vs ONE full-Z block
(nz=1: z hops are pure periodic sublane rolls, the two neighbor psi
streams are dropped entirely -- ~10% of the 8-term bf16 model traffic).

VMEM at full-Z is fine under the 100MB scoped limit (8-term f32 32^4:
~44 MB double-buffered); the question is whether the coarser grid
(Th steps only) pipelines as well as the (Th, nz) grid.

Usage: python exp_nz1.py [L=32] [iters=50]   # plus 16-term at 24^3x48
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def run_stag8(L, iters):
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas_hisq as sph
    from qex_tpu.physics import staggered as st

    dims = (L, L, L, L)
    lat = Lattice(dims)
    mass = 0.1
    flops = 594 * (lat.volume // 2)
    print(f"== 8-term s8 {dims} ==", flush=True)

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, 5)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               jnp.complex64))
            for i in range(4)])
        s = sf.new_fast(st.new_stag_eo(lat, u))
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]), jnp.float32)
        return s.g_e, s.g_o, x / jnp.sqrt(jnp.sum(x * x))

    @partial(jax.jit, static_argnums=(2,))
    def make_links(ge, go, bf16):
        ldt = jnp.bfloat16 if bf16 else jnp.float32
        p = sph.new_pallas_stag8(sf.FastStagEO(lat, ge, go),
                                 links_dtype=ldt)
        return p.l_e, p.l_o

    def chain_fn(nzb):
        @jax.jit
        def chain(le, lo, v):
            so = sph.PallasStag3EO(lat, le, lo)
            vs = jnp.stack([v, jnp.zeros_like(v)])

            def body(vs, _):
                w = sph.d2ee_pallas_hisq(so, vs, mass, nzb=nzb)
                w = w / jnp.sqrt(jnp.sum(w * w))
                return w, None

            vs, _ = jax.lax.scan(body, vs, None, length=iters)
            return jnp.sum(vs * vs).astype(jnp.float32)
        return chain

    ge, go, x = setup(jax.random.PRNGKey(11))

    @jax.jit
    def cross(ge_, go_, v):
        p = sph.new_pallas_stag8(sf.FastStagEO(lat, ge_, go_))
        vs = jnp.stack([v, jnp.zeros_like(v)])
        a = sph.dslash_pallas_hisq(p, vs, 0, nzb=8)
        b = sph.dslash_pallas_hisq(p, vs, 0, nzb=dims[2])
        return (jnp.sum((a - b) ** 2) / jnp.sum(a * a)).astype(
            jnp.float32)

    dev = float(cross(ge, go, x))
    print(f"nz1-vs-split rel dev: {dev:.3e}", flush=True)
    assert dev < 1e-10, dev

    for bf16 in (False, True):
        le, lo = make_links(ge, go, bf16)
        for nzb in (8, dims[2]):
            ch = chain_fn(nzb)
            float(ch(le, lo, x))
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                float(ch(le, lo, x))
                dt = (time.perf_counter() - t0) / (2 * iters)
                best = dt if best is None else min(best, dt)
            tag = f"s8-{'bf16' if bf16 else 'f32 '}-nzb{nzb:>2}"
            print(f"{tag}: {best*1e3:.3f} ms/app "
                  f"{flops/best/1e9:7.1f} GF/s", flush=True)


def run_hisq(iters):
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas_hisq as sph
    from qex_tpu.physics import staggered as st

    dims = (24, 24, 24, 48)
    lat = Lattice(dims)
    flops = 1152 * (lat.volume // 2)
    print(f"== 16-term HISQ {dims} ==", flush=True)

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, 9)
        u = jnp.stack([
            linalg.expm(0.5 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               jnp.complex64))
            for i in range(4)])
        ul = jnp.stack([
            linalg.expm(0.5 * group.random_tah(ks[4 + i], lat.dims,
                                               lat.nc, jnp.complex64))
            for i in range(4)])
        f3 = sf.new_fast3(st.new_stag3_eo(lat, u, ul))
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]), jnp.float32)
        return (f3.gf_e, f3.gf_o, f3.gl_e, f3.gl_o,
                x / jnp.sqrt(jnp.sum(x * x)))

    @partial(jax.jit, static_argnums=(4,))
    def make_links(gfe, gfo, gle, glo, bf16):
        ldt = jnp.bfloat16 if bf16 else jnp.float32
        p = sph.new_pallas_hisq(sf.FastStag3EO(lat, gfe, gfo, gle, glo),
                                links_dtype=ldt)
        return p.l_e, p.l_o

    def chain_fn(nzb):
        @jax.jit
        def chain(le, lo, v):
            so = sph.PallasStag3EO(lat, le, lo)
            vs = jnp.stack([v, jnp.zeros_like(v)])

            def body(vs, _):
                w = sph.d2dd_pallas_hisq(so, vs, nzb=nzb)
                w = w / jnp.sqrt(jnp.sum(w * w))
                return w, None

            vs, _ = jax.lax.scan(body, vs, None, length=iters)
            return jnp.sum(vs * vs).astype(jnp.float32)
        return chain

    gfe, gfo, gle, glo, x = setup(jax.random.PRNGKey(12))
    for bf16 in (False, True):
        le, lo = make_links(gfe, gfo, gle, glo, bf16)
        for nzb in (8, dims[2]):
            ch = chain_fn(nzb)
            float(ch(le, lo, x))
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                float(ch(le, lo, x))
                dt = (time.perf_counter() - t0) / (2 * iters)
                best = dt if best is None else min(best, dt)
            tag = f"hisq-{'bf16' if bf16 else 'f32 '}-nzb{nzb:>2}"
            print(f"{tag}: {best*1e3:.3f} ms/app "
                  f"{flops/best/1e9:7.1f} GF/s", flush=True)


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    print(f"backend={jax.default_backend()}", flush=True)
    run_stag8(L, iters)
    run_hisq(iters)
    print("EXP_NZ1 OK", flush=True)


if __name__ == "__main__":
    main()
