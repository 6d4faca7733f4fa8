"""Same-process A/B of the fat+naik (HISQ) operator on the TPU.

Config-5 geometry (24^3x48, BASELINE.md): XLA fast-layout d2dd3 vs the
fused 16-term Pallas stencil (stag_pallas_hisq), per-application chain
timing plus a full multishift solve (the production rational-action
op).  The tunneled chip's throughput swings ~1.5x over hours, so ONLY
same-process comparisons are meaningful (CLAUDE.md).

Usage: python exp_hisq.py [X Y Z T] (default 24 24 24 48)
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas_hisq as sph
    from qex_tpu.physics import staggered as st
    from qex_tpu.solvers import cgm

    dims = (tuple(int(a) for a in sys.argv[1:5])
            if len(sys.argv) >= 5 else (24, 24, 24, 48))
    lat = Lattice(dims)
    dtype = jnp.complex64
    iters = 25
    sites = lat.volume // 2
    flops = 1152 * sites
    masses = [0.05, 0.10, 0.25, 0.50]   # multishift ladder
    shifts = [m * m for m in masses]

    from qex_tpu.gauge import fat7

    @jax.jit
    def make_g(key):
        ks = jax.random.split(key, 5)
        u = jnp.stack([
            linalg.expm(0.3 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               dtype))
            for i in range(4)])
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]), jnp.float32)
        x = (x / jnp.sqrt(jnp.sum(x * x))).astype(dtype)
        return st.phase_links(lat, u), x

    @jax.jit
    def pack_fast(fl, ll):
        f3 = sf.new_fast3(st.new_stag3_eo(lat, fl, ll))
        return f3.gf_e, f3.gf_o, f3.gl_e, f3.gl_o

    def setup(key):
        g, x = make_g(key)
        fl, ll = fat7.hisq_links_lowmem(lat, g)  # per-dir jits (24^3x48 fits)
        return (*pack_fast(fl, ll), x)

    from functools import partial

    @partial(jax.jit, static_argnums=4)
    def make_pallas(gfe, gfo, gle, glo, bf16=False):
        p = sph.new_pallas_hisq(
            sf.FastStag3EO(lat, gfe, gfo, gle, glo),
            links_dtype=jnp.bfloat16 if bf16 else jnp.float32)
        return p.l_e, p.l_o

    @jax.jit
    def chain_fast(gfe, gfo, gle, glo, v):
        f3 = sf.FastStag3EO(lat, gfe, gfo, gle, glo)

        def body(v, _):
            w = sf.d2dd3_fast(f3, v, 0)
            return w / jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)).astype(w.dtype), None

        v, _ = jax.lax.scan(body, v, None, length=iters)
        return jnp.sum(jnp.abs(v) ** 2).astype(jnp.float32)

    @jax.jit
    def chain_pallas(le, lo, v):
        p = sph.PallasStag3EO(lat, le, lo)
        vs = sph._split(v)

        def body(vs, _):
            w = sph.d2dd_pallas_hisq(p, vs, 0)
            return w / jnp.sqrt(jnp.sum(w * w)), None

        vs, _ = jax.lax.scan(body, vs, None, length=iters)
        return jnp.sum(vs * vs).astype(jnp.float32)

    @jax.jit
    def cross(gfe, gfo, gle, glo, le, lo, v):
        f3 = sf.FastStag3EO(lat, gfe, gfo, gle, glo)
        p = sph.PallasStag3EO(lat, le, lo)
        a = sf.d2dd3_fast(f3, v, 0)
        b = sph._join(sph.d2dd_pallas_hisq(p, sph._split(v), 0))
        return (jnp.sum(jnp.abs(a - b) ** 2)
                / jnp.sum(jnp.abs(a) ** 2)).astype(jnp.float32)

    def ms_fast(gfe, gfo, gle, glo, v):
        f3 = sf.FastStag3EO(lat, gfe, gfo, gle, glo)
        xs, stats = cgm.cg_multishift(lambda x: sf.d2dd3_fast(f3, x, 0),
                                      v, shifts, r2req=1e-10,
                                      maxits=600)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    def ms_pallas(le, lo, v):
        p = sph.PallasStag3EO(lat, le, lo)
        op = lambda x: sph._join(
            sph.d2dd_pallas_hisq(p, sph._split(x), 0))
        xs, stats = cgm.cg_multishift(op, v, shifts, r2req=1e-10,
                                      maxits=600)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    args = setup(jax.random.PRNGKey(11))
    *links3, x = args
    lp = make_pallas(*links3)
    lb = make_pallas(*links3, True)
    print(f"# dims={dims} cross-check rel dev: "
          f"{float(cross(*links3, *lp, x)):.3e}", flush=True)

    for name, ch, a in (("fast-xla", chain_fast, (*links3, x)),
                        ("pallas-hisq", chain_pallas, (*lp, x)),
                        ("pallas-hisq-bf16", chain_pallas, (*lb, x))):
        float(ch(*a))
        t0 = time.perf_counter()
        float(ch(*a))
        dt = (time.perf_counter() - t0) / (iters * 2)  # per Dslash pair /2
        print(f"{name}: {dt*1e3:.3f} ms/d2dd  {flops*2/dt/1e9:.1f} GF/s",
              flush=True)

    for name, ms, a in (("multishift fast-xla", jax.jit(ms_fast),
                         (*links3, x)),
                        ("multishift pallas", jax.jit(ms_pallas),
                         (*lp, x))):
        r2, its = ms(*a)
        float(r2)
        t0 = time.perf_counter()
        r2, its = ms(*a)
        r2v = float(r2)
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f} s  its={int(float(its))} r2={r2v:.2e}",
              flush=True)

    # single-mass action solve: f32 vs bf16-inner sloppy (both to the
    # same 1e-12 TRUE residual via f32 true-residual restarts)
    from qex_tpu.solvers import cg as cgmod
    m0 = masses[0]

    @partial(jax.jit, static_argnums=5)
    def ee_solve(le, lo, lbe, lbo, v, sloppy):
        p = sph.PallasStag3EO(lat, le, lo)
        op = lambda w: sph._join(
            sph.d2ee_pallas_hisq(p, sph._split(w), m0))
        op_true, floor = None, 1e-12
        if sloppy:
            pb = sph.PallasStag3EO(lat, lbe, lbo)
            op_true, floor = op, 1e-5
            op = lambda w: sph._join(
                sph.d2ee_pallas_hisq(pb, sph._split(w), m0))
        xe, stats = cgmod.cg_solve_restarted(
            op, v, r2req=1e-12, maxits=800, restarts=3,
            op_true=op_true, inner_r2req_floor=floor)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    for name, sl in (("ee-solve f32", False), ("ee-solve sloppy-bf16",
                                               True)):
        r2, its = ee_solve(*lp, *lb, x, sl)
        float(r2)
        t0 = time.perf_counter()
        r2, its = ee_solve(*lp, *lb, x, sl)
        r2v = float(r2)
        dt = time.perf_counter() - t0
        print(f"{name}: {dt:.3f} s  its={int(float(its))} "
              f"true r2={r2v:.2e}", flush=True)


if __name__ == "__main__":
    main()
