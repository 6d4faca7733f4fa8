"""Wilson kernel roofline pass (VERDICT round-3 item 7).

Same-process A/B of the fused spin-projected Wilson kernel
(wilson_pallas) across its traffic knobs, with the measured stream
bandwidth and the bytes/site model printed so the roofline fraction
and the DMA-vs-VPU attribution are explicit:

  variants: f32 links z-blocked (the round-2 233 GF/s configuration),
            f32 links full-Z (zm/zp streams dropped, 1248 -> 1056 B),
            bf16 links z-blocked (960 B), bf16 full-Z (768 B).

A pure-compute attribution point: the full-Z bf16 variant re-timed at
tiny T (links resident in VMEM across t? no -- structural) is not
possible on this kernel; instead attribution is by the traffic model:
if time scales with model bytes across variants the kernel is
DMA-bound; a floor independent of bytes is the VPU bound.

Usage: python exp_wilson2.py [ns nt] [--cpu]
"""

import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cpu = "--cpu" in argv
    if cpu:
        argv.remove("--cpu")
    ns, nt = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (24, 32)

    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import wilson as wl
    from qex_tpu.physics import wilson_fast as wf
    from qex_tpu.physics import wilson_pallas as wp

    lat = Lattice((ns, ns, ns, nt))
    dtype = jnp.complex64
    interp = cpu
    iters = 30
    print(f"# Wilson kernel A/B at {lat.dims} on "
          f"{jax.devices()[0].device_kind}")

    @jax.jit
    def setup():
        key = jax.random.PRNGKey(3)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
            for i in range(lat.nd)])
        w = wl.new_wilson_eo(lat, u, m=0.1)
        fw = wf.new_fast_wilson(w)
        x = jax.random.normal(jax.random.fold_in(key, 9),
                              (2, 4, 3, lat.dims[3] // 2,
                               lat.dims[2], lat.dims[1] * lat.dims[0]),
                              jnp.float32)
        x = x / jnp.sqrt(jnp.sum(x * x))
        pf = wp.new_pallas_wilson(fw)
        pb = wp.new_pallas_wilson(fw, links_dtype=jnp.bfloat16)
        return pf.l_e, pf.l_o, pb.l_e, pb.l_o, x

    lfe, lfo, lbe, lbo, x = setup()

    def chain_fn(nzb):
        @jax.jit
        def chain(le, lo, v):
            p = wp.PallasWilsonEO(lat, le, lo, 0.1)

            def body(v, _):
                w = wp.m_ee_pallas(p, v, nzb=nzb, interpret=interp)
                return w / jnp.sqrt(jnp.sum(w * w)), None

            v, _ = jax.lax.scan(body, v, None, length=iters)
            return jnp.sum(v * v).astype(jnp.float32)
        return chain

    # measured stream bandwidth (roofline basis)
    nbw = 64 * 1024 * 1024

    @jax.jit
    def bw_chain():
        xb = jnp.ones((nbw,), jnp.float32)

        def body(xb, _):
            return xb * 1.000001 + 1e-9, None
        xb, _ = jax.lax.scan(body, xb, None, length=20)
        return jnp.sum(xb[:8]).astype(jnp.float32)

    float(bw_chain())
    t_bw = min(_t(bw_chain) for _ in range(3))
    bw = 20 * 2 * 4 * nbw / t_bw / 1e9
    print(f"# stream BW {bw:.0f} GB/s")

    sites = lat.volume // 2
    flops = 1344 * sites
    napp = 2 * iters  # m_ee = 2 hops
    results = {}
    for name, links, nzb, bytes_site in (
            ("f32 nzb=8", (lfe, lfo), 8, 8 * 72 + 6 * 96),
            ("f32 full-Z", (lfe, lfo), None, 8 * 72 + 4 * 96),
            ("bf16 nzb=8", (lbe, lbo), 8, 8 * 36 + 6 * 96),
            ("bf16 full-Z", (lbe, lbo), None, 8 * 36 + 4 * 96)):
        ch = chain_fn(nzb)
        float(ch(*links, x))  # compile+warm
        t = min(_t(lambda: ch(*links, x)) for _ in range(5)) / napp
        gf = flops / t / 1e9
        roof = bw * flops / (bytes_site * sites)
        results[name] = (t, gf, bytes_site, gf / roof)
        print(f"# {name:<12} {t*1e3:7.3f} ms/hop-pair-app "
              f"{gf:6.1f} GF/s  model {bytes_site} B/site  "
              f"{100*gf/roof:5.1f}% of measured-BW roofline")
    return 0


def _t(fn):
    t0 = time.perf_counter()
    float(fn())
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.exit(main())
