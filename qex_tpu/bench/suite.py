"""Microbenchmarks: site linalg, shifts, gauge action/force, CG.

TPU-native replacement for QEX's src/bench/ programs:
  benchLinalg(S)  -> linalg section (per-op GB/s and GFLOP/s)
  benchGather     -> shift section (halo/roll bandwidth)
  benchGauge      -> gauge action + force timings
  benchStagProp   -> CG throughput with auto-calibrated run length
                     (the reference calibrates iterations to a
                     wall-time budget, benchStagProp.nim:61-71)

All timing follows the axon-safe recipe: jit + chained dependencies +
one real-scalar fetch per measurement.

Usage: python -m qex_tpu.bench.suite [--cpu] [--lat X Y Z T]
"""

from __future__ import annotations

import argparse
import sys
import time


def _timeit(fn, *args, budget_s: float = 1.0):
    """(secs_per_call, calls) with run length auto-calibrated to the
    budget (benchStagProp auto-calibration parity)."""
    out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    out = fn(*args)
    float(out)
    dt1 = time.perf_counter() - t0
    n = max(1, int(budget_s / max(dt1, 1e-5)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / n, n


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="bench_suite")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lat", type=int, nargs=4, default=[16, 16, 16, 16])
    ap.add_argument("--budget", type=float, default=1.0,
                    help="seconds per measurement")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.ops import group, linalg
    from qex_tpu.ops.shifts import shift
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import staggered as st
    from qex_tpu.solvers import cg

    lat = Lattice(tuple(args.lat))
    dtype = jnp.complex64
    V = lat.volume
    print(f"# bench suite: {lat.dims} {jax.devices()[0].device_kind}")

    @jax.jit
    def setup(seed):
        key = jax.random.PRNGKey(seed)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
            for i in range(lat.nd)])
        m = linalg.expm(0.3 * group.random_tah(
            jax.random.fold_in(key, 9), lat.dims, lat.nc, dtype))
        v = jax.random.normal(key, lat.vector_shape(),
                              jnp.float32).astype(dtype)
        return u, m, v

    u, m, v = setup(0)

    # --- linalg (benchLinalg) ------------------------------------------
    def scal(x):
        return jnp.real(jnp.sum(jnp.abs(x) ** 2)).astype(jnp.float32)

    cases = {
        "mat*mat": jax.jit(lambda a: scal(linalg.mul(a, a))),
        "mat*vec": jax.jit(lambda a, b: scal(linalg.mv(a, b))),
        "expm": jax.jit(lambda a: scal(linalg.expm(0.1 * a))),
        "project_u": jax.jit(lambda a: scal(linalg.project_u(a))),
        "tah": jax.jit(lambda a: scal(group.tah(a))),
    }
    flops = {
        "mat*mat": V * (8 * 27 + 9 * 2),
        "mat*vec": V * (8 * 9 + 3 * 2),
        "expm": V * (8 * 27 * 16),
        "project_u": V * (8 * 27 * 3 * 15),
        "tah": V * 9 * 4,
    }
    for name, fn in cases.items():
        fargs = (m, v) if name == "mat*vec" else (m,)
        dt, n = _timeit(fn, *fargs, budget_s=args.budget)
        print(f"linalg {name:10s}: {dt*1e6:9.1f} us "
              f"{flops[name]/dt/1e9:8.1f} GF/s  (x{n})")

    # --- shifts (benchGather) ------------------------------------------
    for mu in range(lat.nd):
        f = jax.jit(lambda a, mu=mu: scal(shift(a, mu, +1, lat.nd)))
        dt, n = _timeit(f, v, budget_s=args.budget / 2)
        byt = 2 * V * lat.nc * 8
        print(f"shift mu={mu}: {dt*1e6:9.1f} us {byt/dt/1e9:8.1f} GB/s"
              f"  (x{n})")

    # --- gauge action + force (benchGauge) -----------------------------
    c = ga.symanzik(6.0)
    act = jax.jit(lambda uu: jnp.real(
        ga.full_action(c, lat, uu)).astype(jnp.float32))
    frc = jax.jit(lambda uu: scal(ga.gauge_force(c, lat, uu)))
    dt, n = _timeit(act, u, budget_s=args.budget)
    print(f"gauge action (symanzik): {dt*1e3:9.2f} ms  (x{n})")
    dt, n = _timeit(frc, u, budget_s=args.budget)
    print(f"gauge force  (AD):       {dt*1e3:9.2f} ms  (x{n})")

    # --- CG throughput (benchStagProp) ---------------------------------
    @jax.jit
    def cg_run(uu, vv):
        s = sf.new_fast(st.new_stag_eo(lat, uu))
        from qex_tpu.ops.eo import pack
        be, _ = pack(vv, lat.nd)
        bf = sf.to_fast(be, lat)
        x, stats = cg.cg_solve(lambda w: sf.d2ee_fast(s, w, 0.01), bf,
                               r2req=1e-8, maxits=300)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    r2, its = cg_run(u, v)
    float(r2)
    t0 = time.perf_counter()
    r2, its = cg_run(u, v)
    nits = float(its)
    dt = time.perf_counter() - t0
    fl = (lat.nd * 4 * 72 + 60) * (V // 2) * nits
    print(f"CG m=0.01: {dt:6.3f} s, {int(nits)} iters, "
          f"{fl/dt/1e9:8.1f} GF/s (QEX flop model)")

    # --- Wilson eo operator (wilsonD.nim flop model, 1344/site) --------
    from qex_tpu.physics import wilson as wlm
    from qex_tpu.physics import wilson_fast as wfm
    from qex_tpu.physics import wilson_pallas as wpal

    @jax.jit
    def wilson_setup(uu, vv):
        w = wlm.new_wilson_eo(lat, uu, m=0.1)
        fw = wfm.new_fast_wilson(w)
        x4 = jnp.stack([vv, jnp.roll(vv, 1, -1), jnp.roll(vv, 2, -1),
                        jnp.roll(vv, 3, -1)])
        from qex_tpu.ops.eo import pack
        xe, _ = pack(x4, lat.nd)
        return fw.g_e, fw.g_o, sf.to_fast(xe, lat)

    wge, wgo, wxe = wilson_setup(u, v)
    nchw = 10
    wfl = 1344 * (V // 2)

    def whop_fast(ge_, go_, x_):
        fw = wfm.FastWilsonEO(lat, ge_, go_, 0.1)

        def body(y, _):
            return wfm.m_ee_fast(fw, y) / 17.0, None
        y, _ = jax.lax.scan(body, x_, None, length=nchw)
        return scal(y)

    dt, n = _timeit(jax.jit(whop_fast), wge, wgo, wxe,
                    budget_s=args.budget)
    dt /= 2 * nchw  # m_ee = two hops
    print(f"wilson m_ee fast  : {dt*1e3:9.2f} ms/hop "
          f"{wfl/dt/1e9:8.1f} GF/s  (x{n})")
    if jax.default_backend() not in ("cpu",) and wpal.fits(lat):
        def whop_pal(ge_, go_, x_):
            fw = wfm.FastWilsonEO(lat, ge_, go_, 0.1)
            pw = wpal.new_pallas_wilson(fw)

            def body(y, _):
                return wpal.m_ee_pallas(pw, y) / 17.0, None
            y, _ = jax.lax.scan(body, wpal._split(x_), None,
                                length=nchw)
            return scal(wpal._join(y))

        dt, n = _timeit(jax.jit(whop_pal), wge, wgo, wxe,
                        budget_s=args.budget)
        dt /= 2 * nchw
        print(f"wilson m_ee pallas: {dt*1e3:9.2f} ms/hop "
              f"{wfl/dt/1e9:8.1f} GF/s  (x{n})")

    # --- lattice IO (benchQio) -----------------------------------------
    import os
    import tempfile

    import numpy as np

    from qex_tpu.io import lime

    un = np.asarray(u)
    with tempfile.TemporaryDirectory() as td:
        fn = os.path.join(td, "bench_gauge.lime")
        t0 = time.perf_counter()
        lime.save_gauge(fn, lat, un)
        t_w = time.perf_counter() - t0
        sz = os.path.getsize(fn)
        t0 = time.perf_counter()
        lime.load_gauge(fn, lat)
        t_r = time.perf_counter() - t0
        site_view = np.frombuffer(np.ascontiguousarray(
            lime._to_lex_sites(lat, un.astype(">c8"),
                               (lat.nd, lat.nc, lat.nc))).tobytes(),
            np.uint8).reshape(lat.volume, -1)
        t0 = time.perf_counter()
        lime.dml_checksum(site_view)
        t_c = time.perf_counter() - t0
        print(f"IO write: {t_w:6.3f} s {sz/t_w/1e6:7.0f} MB/s | "
              f"read(+cksum): {t_r:6.3f} s {sz/t_r/1e6:7.0f} MB/s | "
              f"dml_checksum: {t_c*1e3:7.1f} ms")

        # cooperative single-file writer/reader (parallelIo.nim role;
        # single-process here -- the N-process path is exercised by
        # tests/test_pario.py): same file format, memmap hyperrectangle
        # writes + partitioned DML checksum
        from qex_tpu.io import pario
        from qex_tpu.parallel import make_lattice_mesh

        lm = make_lattice_mesh(lat)
        ud = jax.device_put(un.astype("c8"))
        fn2 = os.path.join(td, "bench_gauge_par.lime")
        t0 = time.perf_counter()
        pario.save_gauge_parallel(fn2, lat, ud)
        t_pw = time.perf_counter() - t0
        t0 = time.perf_counter()
        pario.load_gauge_parallel(fn2, lat, lm)
        t_pr = time.perf_counter() - t0
        print(f"IO pario write: {t_pw:6.3f} s {sz/t_pw/1e6:7.0f} MB/s"
              f" | pario read(+cksum): {t_pr:6.3f} s "
              f"{sz/t_pr/1e6:7.0f} MB/s")

    # --- multi-device halo exchange (benchGather, sharded) -------------
    ndev = len(jax.devices())
    if ndev > 1:
        from functools import partial

        from jax import shard_map
        from qex_tpu.parallel import make_lattice_mesh, shard_field
        from qex_tpu.parallel.halo import dslash_full_sharded, shift_halo
        from qex_tpu.parallel.mesh import field_spec

        lm = make_lattice_mesh(lat)
        vs = shard_field(lm, v, 1)
        names = lm.mesh.axis_names
        sizes = [lm.mesh.shape[a] for a in names]
        nch = 20  # chained halo applications per fetch (one jit --
        #           queuing collectives asynchronously can deadlock the
        #           CPU in-process communicator and wastes fetch RTTs
        #           on the tunneled TPU)
        for mu in range(lat.nd):
            if sizes[mu] == 1:
                continue
            spec = field_spec(lm, 1)
            f = shard_map(
                partial(shift_halo, mu=mu, sign=1, nd=lat.nd,
                        axis_name=names[mu], nmesh=sizes[mu]),
                mesh=lm.mesh, in_specs=(spec,), out_specs=spec)

            @jax.jit
            def chain(a, f=f):
                def body(x, _):
                    return f(x), None
                a, _ = jax.lax.scan(body, a, None, length=nch)
                return scal(a)

            dt, n = _timeit(chain, vs, budget_s=args.budget / 2)
            dt /= nch
            face = V // lat.dims[mu] * lat.nc * 8
            print(f"halo mu={mu} ({sizes[mu]} dev): {dt*1e6:9.1f} us "
                  f"{face/dt/1e9:6.2f} GB/s face  (x{n})")
        gp = st.phase_links(lat, u)
        gps = shard_field(lm, gp, 3)

        @jax.jit
        def ds_chain(gg, xx):
            def body(x, _):
                w = dslash_full_sharded(lm, gg, x)
                return w / jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)).astype(
                    w.dtype), None
            xx, _ = jax.lax.scan(body, xx, None, length=nch)
            return scal(xx)

        dt, n = _timeit(ds_chain, gps, vs, budget_s=args.budget)
        dt /= nch
        print(f"sharded dslash ({ndev} dev): {dt*1e3:9.2f} ms "
              f"{594*V/dt/1e9:7.1f} GF/s  (x{n})")

        # the shard_map KERNEL path (stag_shard): eo normal operator
        # with explicit ppermute surface fixups on a z/t mesh
        from qex_tpu.physics import stag_fast as sfst
        from qex_tpu.physics import stag_pallas_hisq as sp3
        from qex_tpu.physics import stag_shard as shrd
        from qex_tpu.physics import staggered as stg

        Th, Z = lat.dims[3] // 2, lat.dims[2]
        gzs = [d for d in range(1, ndev + 1)
               if ndev % d == 0 and Z % d == 0 and (Z // d) % 2 == 0
               and Th % (ndev // d) == 0]
        if gzs:
            gz = max(gzs)
            lm2 = make_lattice_mesh(lat, rank_geom=(1, 1, gz, ndev // gz))

            @jax.jit
            def mk_links(uu):
                s2 = stg.new_stag_eo(lat, uu)
                p2 = sp3.new_pallas_stag8(sfst.new_fast(s2))
                return p2.l_e, p2.l_o

            le, lo = mk_links(u)
            le, lo = shrd.shard_links(lm2, le), shrd.shard_links(lm2, lo)
            from qex_tpu.ops import eo as eomod

            @jax.jit
            def mk_vec(w):
                we, _ = eomod.pack(w, lat.nd)
                wf = sfst.to_fast(we, lat)
                return jnp.stack([jnp.real(wf), jnp.imag(wf)]).astype(
                    jnp.float32)

            xs2 = shrd.shard_vec(lm2, mk_vec(v))

            @jax.jit
            def st_chain(a, b, xx):
                p2 = sp3.PallasStag3EO(lat, a, b)

                def body(x, _):
                    w = shrd.d2ee_sharded(lm2, p2, x, 0.1)
                    return (w / jnp.sqrt(jnp.sum(w * w))), None
                xx, _ = jax.lax.scan(body, xx, None, length=nch)
                return jnp.sum(xx * xx).astype(jnp.float32)

            dt, n = _timeit(st_chain, le, lo, xs2, budget_s=args.budget)
            dt /= nch
            print(f"stencil d2ee ({lm2.rank_geom} mesh): "
                  f"{dt*1e3:9.2f} ms {2*594*(V//2)/dt/1e9:7.1f} GF/s"
                  f"  (x{n})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
