"""On-chip check of the shard_map kernel path (physics/stag_shard).

Runs on the real TPU with a 1-device mesh (the tunnel exposes one
chip): proves pl.pallas_call composes with shard_map + the fixup code
and matches the GSPMD fast-layout operator, and times it against the
plain kernel call.  Multi-device correctness is covered by
tests/test_stag_shard.py on the 8-device CPU mesh.

Usage: python exp_shard.py [L=16]
"""

import sys
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.parallel import make_lattice_mesh
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import stag_pallas_hisq as sph
from qex_tpu.physics import stag_shard as sh
from qex_tpu.physics import staggered as st
from qex_tpu.physics.stag_pallas import _split

L = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def main():
    lat = Lattice((L, L, L, L))
    lm = make_lattice_mesh(lat, devices=jax.devices()[:1],
                           rank_geom=(1, 1, 1, 1))
    print(f"backend={jax.default_backend()} lat={lat.dims} "
          f"rank_geom={lm.rank_geom}", flush=True)

    key = jax.random.PRNGKey(3)

    @jax.jit
    def mk():
        u = jnp.stack([group.random_su(jax.random.fold_in(key, i),
                                       lat.dims, lat.nc, jnp.complex64)
                       for i in range(lat.nd)])
        g = st.phase_links(lat, u)
        x = jax.random.normal(jax.random.fold_in(key, 9),
                              (2, lat.nc, lat.dims[3] // 2, lat.dims[2],
                               lat.dims[1] * lat.dims[0]), jnp.float32)
        return g, x

    g, xs = mk()

    @jax.jit
    def build(g):
        from qex_tpu.ops import eo
        ge, go = eo.pack(g, lat.nd)
        fs = sf.FastStagEO(lat, sf.to_fast(ge, lat), sf.to_fast(go, lat))
        ps = sph.new_pallas_stag8(fs)
        return fs.g_e, fs.g_o, ps.l_e, ps.l_o

    ge_f, go_f, l_e, l_o = build(g)
    m = 0.1

    # links enter as jit ARGUMENTS: closure-captured device arrays
    # become compile-time constants, which the axon tunnel cannot
    # fetch back to host (UNIMPLEMENTED on non-scalar transfers)
    @jax.jit
    def f_fast_j(ge, go, v):
        fs = sf.FastStagEO(lat, ge, go)
        return sf.d2ee_fast(fs, v[0] + 1j * v[1], m)

    @jax.jit
    def f_shard_j(le, lo, v):
        ps = sph.PallasStag3EO(lat, le, lo)
        return sh.d2ee_sharded(lm, ps, v, m, use_pallas=True)

    @jax.jit
    def f_plain_j(le, lo, v):
        ps = sph.PallasStag3EO(lat, le, lo)
        return sph.d2ee_pallas_hisq(ps, v, m)

    f_fast = lambda v: f_fast_j(ge_f, go_f, v)
    f_shard = lambda v: f_shard_j(l_e, l_o, v)
    f_plain = lambda v: f_plain_j(l_e, l_o, v)

    ref = f_fast(xs)
    got = f_shard(xs)
    gp = f_plain(xs)
    dev = jax.jit(lambda a, b: linalg.norm2(a[0] + 1j * a[1] - b)
                  / linalg.norm2(b))
    print("shard-vs-fast rel dev :", float(dev(got, ref)), flush=True)
    print("shard-vs-plain rel dev:",
          float(jax.jit(lambda a, b: linalg.norm2(a - b)
                        / linalg.norm2(b))(got, gp)), flush=True)

    # chain timing: shard_map-wrapped kernel vs plain kernel.  Links
    # are scan-carried jit arguments (not trace constants, see above).
    def chain(f2, a, b, v, n=50):
        @jax.jit
        def run(a, b, v):
            def body(c, _):
                return f2(a, b, c), None
            out, _ = jax.lax.scan(body, v, None, length=n)
            return linalg.norm2(out)
        float(run(a, b, v))  # compile+warm
        t0 = time.perf_counter()
        float(run(a, b, v))
        return (time.perf_counter() - t0) / n

    tp = chain(f_plain_j, l_e, l_o, xs)
    tsh = chain(f_shard_j, l_e, l_o, xs)
    gf = 2 * 594 * (lat.volume // 2) / 1e9
    print(f"plain kernel : {tp*1e3:.3f} ms/app  {gf/tp:.0f} GF/s",
          flush=True)
    print(f"shard_map    : {tsh*1e3:.3f} ms/app  {gf/tsh:.0f} GF/s",
          flush=True)

    # HISQ 16-term under shard_map
    @jax.jit
    def build3(g):
        from qex_tpu.ops import eo
        key2 = jax.random.PRNGKey(7)
        long = jnp.stack([group.random_su(jax.random.fold_in(key2, i),
                                          lat.dims, lat.nc, jnp.complex64)
                          for i in range(lat.nd)])
        fe, fo = eo.pack(g, lat.nd)
        le, lo = eo.pack(long, lat.nd)
        fs3 = sf.FastStag3EO(lat, sf.to_fast(fe, lat), sf.to_fast(fo, lat),
                             sf.to_fast(le, lat), sf.to_fast(lo, lat))
        ps3 = sph.new_pallas_hisq(fs3)
        return (fs3.gf_e, fs3.gf_o, fs3.gl_e, fs3.gl_o, ps3.l_e, ps3.l_o)

    a3 = build3(g)

    @jax.jit
    def f3_fast_j(links, v):
        fs3 = sf.FastStag3EO(lat, *links)
        return sf.d2ee3_fast(fs3, v[0] + 1j * v[1], m)

    @jax.jit
    def f3_shard_j(le, lo, v):
        ps3 = sph.PallasStag3EO(lat, le, lo)
        return sh.d2ee3_sharded(lm, ps3, v, m, use_pallas=True)

    print("hisq shard-vs-fast rel dev:",
          float(dev(f3_shard_j(a3[4], a3[5], xs),
                    f3_fast_j(a3[:4], xs))), flush=True)
    t3 = chain(f3_shard_j, a3[4], a3[5], xs)
    gf3 = 2 * 1152 * (lat.volume // 2) / 1e9
    print(f"hisq shard_map: {t3*1e3:.3f} ms/app  {gf3/t3:.0f} GF/s",
          flush=True)
    print("EXP_SHARD OK", flush=True)


if __name__ == "__main__":
    main()
