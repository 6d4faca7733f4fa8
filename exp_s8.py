"""Same-process A/B at 32^4: v3 (manual-DMA, full-Z) vs s8 (streamed
z-vectorized 8-term stag_pallas_hisq variant), f32 and bf16 links.

The z-vectorized streamed structure made bf16 links WIN on the 16-term
HISQ kernel (980 GF/s at 24^3x48, exp_hisq.py); this measures whether
the same structure beats v3 on the 8-term headline operator.  The
tunneled chip's throughput swings ~1.5x over hours, so ONLY
same-process comparisons are meaningful (CLAUDE.md).

Usage: python exp_s8.py [L=32] [iters=50]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas as sp1
    from qex_tpu.physics import stag_pallas3 as sp3
    from qex_tpu.physics import stag_pallas_hisq as sph
    from qex_tpu.physics import staggered as st

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    dims = (L, L, L, L)
    lat = Lattice(dims)
    dtype = jnp.complex64
    mass = 0.1
    sites = lat.volume // 2
    flops = 594 * sites
    print(f"backend={jax.default_backend()} lat={dims}", flush=True)

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

    @partial(jax.jit, static_argnums=(2, 3))
    def make_links(ge, go, kind, bf16):
        ldt = jnp.bfloat16 if bf16 else jnp.float32
        f = sf.FastStagEO(lat, ge, go)
        p = {"v3": lambda: sp3.new_pallas3(f, links_dtype=ldt),
             "v1": lambda: sp1.new_pallas(f, links_dtype=ldt),
             "s8": lambda: sph.new_pallas_stag8(f, links_dtype=ldt),
             }[kind]()
        if kind == "v1":
            return p.g_e, p.g_o
        return p.l_e, p.l_o

    def chain_fn(kind):
        dslash = {"v3": sp3.dslash_pallas3, "v1": sp1.dslash_pallas,
                  "s8": sph.dslash_pallas_hisq}[kind]

        @jax.jit
        def chain(le, lo, v):
            so = {"v3": lambda: sp3.PallasStagEO3(lat, le, lo),
                  "v1": lambda: sp1.PallasStagEO(lat, le, lo),
                  "s8": lambda: sph.PallasStag3EO(lat, le, lo)}[kind]()
            vs = jnp.stack([v, jnp.zeros_like(v)])

            def body(vs, _):
                t = dslash(so, vs, 1)
                w = dslash(so, t, 0)
                w = (mass * mass) * vs - w
                w = w / jnp.sqrt(jnp.sum(w * w))
                return w, None

            vs, _ = jax.lax.scan(body, vs, None, length=iters)
            return jnp.sum(vs * vs).astype(jnp.float32)
        return chain

    ge, go, x = setup(jax.random.PRNGKey(11))

    # correctness cross-check on chip (s8 vs v3, f32)
    ref_kind = "v3" if sp3.fits(lat) else "v1"

    @jax.jit
    def cross(ge_, go_, v):
        f = sf.FastStagEO(lat, ge_, go_)
        p8 = sph.new_pallas_stag8(f)
        vs = jnp.stack([v, jnp.zeros_like(v)])
        if ref_kind == "v3":
            a = sp3.dslash_pallas3(sp3.new_pallas3(f), vs, 0)
        else:
            a = sp1.dslash_pallas(sp1.new_pallas(f), vs, 0)
        b = sph.dslash_pallas_hisq(p8, vs, 0)
        return (jnp.sum((a - b) ** 2) / jnp.sum(a * a)).astype(
            jnp.float32)

    dev = float(cross(ge, go, x))
    print(f"s8-vs-{ref_kind} rel dev: {dev:.3e}", flush=True)
    assert dev < 1e-10, dev

    for kind in (ref_kind, "s8"):
        for bf16 in (False, True):
            le, lo = make_links(ge, go, kind, bf16)
            ch = chain_fn(kind)
            float(ch(le, lo, x))  # compile + warm
            best = None
            for _ in range(5):
                t0 = time.perf_counter()
                float(ch(le, lo, x))
                dt = (time.perf_counter() - t0) / (2 * iters)
                best = dt if best is None else min(best, dt)
            tag = f"{kind}-{'bf16' if bf16 else 'f32 '}"
            print(f"{tag}: {best*1e3:.3f} ms/app "
                  f"{flops/best/1e9:7.1f} GF/s", flush=True)
    print("EXP_S8 OK", flush=True)


if __name__ == "__main__":
    main()
