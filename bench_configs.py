"""Run the driver's BASELINE.md config ladder end to end.

  1. 8^4  SU(3) staggered eo CG, m=0.1, hot start
  2. 16^4 Wilson-action gradient flow to t=1.0
  3. 16^3x32 quenched SU(3) HMC (Wilson + Omelyan 2MN)
  4. 24^4 nHYP staggered+PV HMC (one trajectory of the production app
     apps/staghmc_spv; split-jit dispatch, compiles for tens of
     minutes on first run -- not in the default set)
  5. 32^3x64 HISQ multi-mass CG (single chip) + sharded dryrun
  6. 32^4 HISQ multi-mass CG, synthetic SU(3) fat/long links (the
     headline-volume kernel point; the real two-level fattening at this
     volume exceeds one chip's HBM and belongs on the sharded mesh)

Prints one summary line per config.  Usage:
    python bench_configs.py [--cpu] [--configs 1 2 3 5 6] [--json OUT]

``--json OUT`` additionally writes one record per config (warm
seconds, solver iterations, dH, residuals, device) -- the committed
HMC sec/trajectory artifact the VERDICT asks for (QEX's per-trajectory
timer trees + solver stats, staghmc_spv.nim:1066-1090).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    import functools, builtins
    global print
    print = functools.partial(builtins.print, flush=True)
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--configs", type=int, nargs="+",
                    default=[1, 2, 3, 5, 6, 7])
    ap.add_argument("--json", default=None,
                    help="write per-config records to this JSON file")
    args = ap.parse_args(argv)
    recs: list[dict] = []

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import flow as gf
    from qex_tpu.gauge import loops
    from qex_tpu.hmc import hmc, integrators
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_solve, staggered as st
    from qex_tpu.solvers.base import SolverParams
    from functools import partial

    dtype = jnp.complex64
    dev = jax.devices()[0]
    print(f"# bench_configs on {dev.device_kind}")

    def hot(lat, seed=7, scale=0.7):
        @jax.jit
        def mk(s):
            key = jax.random.PRNGKey(s)
            return jnp.stack([
                linalg.expm(scale * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc,
                    dtype)) for i in range(lat.nd)])
        return mk(seed)

    def sync(x):
        return float(jnp.real(jnp.asarray(x)).ravel()[0])

    if 1 in args.configs:
        lat = Lattice((8, 8, 8, 8))
        u = hot(lat)
        s = st.new_stag_eo(lat, u, bc="pppp")
        b = jax.random.normal(jax.random.PRNGKey(1),
                              lat.vector_shape(), jnp.float32
                              ).astype(dtype)

        @jax.jit
        def cfg1(ge, go, bb):
            so = st.StaggeredEO(lat, ge, go)
            x, stats = stag_solve.solve(so, bb, 0.1,
                                        SolverParams(r2req=1e-12,
                                                     maxits=1000,
                                                     restarts=2))
            return jnp.real(stats.r2).astype(jnp.float32), \
                stats.iterations.astype(jnp.float32)

        r2, its = cfg1(s.g_e, s.g_o, b)
        sync(r2)
        t0 = time.perf_counter()
        r2, its = cfg1(s.g_e, s.g_o, b)
        r2v = sync(r2)
        dt = time.perf_counter() - t0
        print(f"CONFIG1 8^4 eo CG m=0.1: {dt:.3f} s, "
              f"its={int(sync(its))}, rel_r2={r2v:.2e}")
        recs.append({"config": 1, "name": "8c4_eo_cg_m0.1",
                     "warm_seconds": round(dt, 4),
                     "iterations": int(sync(its)), "rel_r2": r2v})

    if 2 in args.configs:
        lat = Lattice((16, 16, 16, 16))
        u = hot(lat, scale=0.3)
        c = gf.wilson_flow_coeffs(lat.nc)
        eps, steps = 0.02, 50

        @jax.jit
        def cfg2(uu):
            # measurement once at the end (per-step measurement makes
            # the remote-compile graph enormous)
            v, _ = gf.flow(c, lat, uu, eps, steps, measure=False)
            m = gf.measure_flow(lat, v, jnp.float32(eps * steps))
            return jnp.real(m.t2e_clover).astype(jnp.float32)

        t2e = cfg2(u)
        sync(t2e)
        t0 = time.perf_counter()
        t2e = cfg2(u)
        val = sync(t2e)
        dt = time.perf_counter() - t0
        print(f"CONFIG2 16^4 Wilson flow t=1.0 ({steps} RK3 steps): "
              f"{dt:.3f} s, t2E_clover={val:.5f}")
        recs.append({"config": 2, "name": "16c4_wilson_flow_t1",
                     "warm_seconds": round(dt, 4),
                     "t2e_clover": val})

    if 3 in args.configs:
        lat = Lattice((16, 16, 16, 32))
        c = ga.wilson(6.0)
        act = partial(ga.full_action, c, lat)
        frc = partial(ga.gauge_force, c, lat)
        u = group.unit_gauge(lat, dtype)
        scheme = integrators.get_integrator("2MN")

        act2 = partial(ga.full_action2, c, lat)

        @jax.jit
        def cfg3(key, uu, warm):
            # action2: compensated two-float Hamiltonian -- dH keeps
            # sub-ulp resolution at H ~ 6e6 in f32 (the round-3
            # artifact recorded dH = 58.0 exactly = ulp-locked)
            uu, stt = hmc.hmc_step(key, uu, act, frc, scheme, 1.0, 20,
                                   always_accept=warm,
                                   action2_fn=act2)
            return uu, stt.dH, jnp.real(
                loops.plaquette(lat, uu)).astype(jnp.float32)

        # forced-accept warmup escapes the cold-start transient (the
        # reference's no_metropolis_until); the timed trajectory then
        # reports an honest thermalized-ish dH
        warm_t = jnp.bool_(True)
        for i in range(4):
            u, dH, pl = cfg3(jax.random.PRNGKey(30 + i), u, warm_t)
        sync(pl)
        t0 = time.perf_counter()
        u, dH, pl = cfg3(jax.random.PRNGKey(4), u, jnp.bool_(False))
        plv = sync(pl)
        dt = time.perf_counter() - t0
        print(f"CONFIG3 16^3x32 quenched HMC (2MN, 20 steps): "
              f"{dt:.3f} s/traj, dH={sync(dH):+.4f}, plaq={plv:.5f}")
        recs.append({"config": 3, "name": "16c3x32_quenched_hmc",
                     "warm_sec_per_traj": round(dt, 4),
                     "dH": sync(dH), "plaq": plv})

    if 4 in args.configs:
        # the staghmc_spv production composition (2 smeared staggered
        # fields + 1 PV boson + smeared and unsmeared gauge action);
        # TWO trajectories so the second gives the WARM sec/trajectory
        # (all split-step jits compiled during the first)
        import os
        import re
        import subprocess
        # cold start: the hot (random) 24^4 start at tau=1.0 blew up
        # numerically (round-3 dH +7.1e9, a physics-parameter artifact
        # -- enormous forces on a random field); cold + one forced-
        # accept warmup trajectory gives an honest O(1)-dH warm number.
        cmd = [sys.executable, "-m", "qex_tpu.apps.staghmc_spv",
               "--ntraj", "2",
               "-ns=24", "-nt=24", "-beta=7.0", "-tau=1.0",
               "-nf=8", "-mass=0.05", "-num_pv=1", "-mass_pv=0.5",
               "-g_steps=24", "-f_steps=12", "-pv_steps=12",
               "-start=cold", "-no_metropolis_until=1",
               "-check_solvers=1"]
        if args.cpu:
            cmd.append("--cpu")
        # persistent compilation cache: the split dispatcher is ~190
        # small programs; first-ever run pays the serialized remote
        # compiles, every later process starts warm (exp_cache.py
        # validates the cache through the tunnel)
        env = dict(os.environ)
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       "/root/repo/.jax_cache")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS",
                       "0")
        t0 = time.perf_counter()
        r = subprocess.run(cmd, capture_output=True, text=True,
                           env=env)
        dt = time.perf_counter() - t0
        ok = r.returncode == 0
        plaq = [ln for ln in r.stdout.splitlines()
                if ln.startswith("MEASplaq ")]
        # per-trajectory seconds + dH from the app's ACCEPT/REJECT
        # lines; per-term solver its from the SOLVER lines
        trajs = re.findall(r"^(?:ACCEPT|REJECT): dH (\S+) "
                           r"\(([\d.]+) s\)", r.stdout, re.M)
        solvers = re.findall(r"^SOLVER (\S+): its (\d+) relr2 (\S+)",
                             r.stdout, re.M)
        warm = float(trajs[-1][1]) if len(trajs) >= 2 else None
        print(f"CONFIG4 24^4 nHYP stag+PV HMC: {dt:.1f} s total "
              f"(incl. compiles), warm traj "
              f"{warm if warm is not None else '?'} s, ok={ok}, "
              f"{plaq[-1] if plaq else r.stderr[-300:]}")
        recs.append({
            "config": 4, "name": "24c4_nhyp_stag_pv_hmc",
            "ok": ok,
            "total_seconds_incl_compiles": round(dt, 1),
            "warm_sec_per_traj": warm,
            "dH_per_traj": [float(d) for d, _ in trajs],
            "solver_its": {n: int(i) for n, i, _ in solvers},
            "solver_relr2": {n: float(x) for n, _, x in solvers},
            "plaq": (float(plaq[-1].split()[1]) if plaq else None)})

    def hisq_multishift(tag, lat, fl, ll, seed):
        """4-mass HISQ multishift through the production routing
        (fused 16-term Pallas stencil on TPU, XLA fast layout on CPU)."""
        from qex_tpu.solvers import cgm

        @jax.jit
        def solve(fl, ll, bb):
            from qex_tpu.physics import stag_fast as sfst
            from qex_tpu.physics.stag_hmc import _fast3_ops
            s3 = st.new_stag3_eo(lat, fl, ll)
            f3 = sfst.new_fast3(s3)
            _, base = _fast3_ops(f3)
            masses = [0.05, 0.1, 0.2, 0.4]
            xs, stats = cgm.cg_multishift(base, sfst.to_fast(bb, lat),
                                          [m * m for m in masses],
                                          r2req=1e-10, maxits=600)
            return (jnp.real(stats.r2).astype(jnp.float32),
                    stats.iterations.astype(jnp.float32))

        b = jax.random.normal(jax.random.PRNGKey(seed),
                              (lat.nc,) + lat.dims[:-1]
                              + (lat.dims[-1] // 2,), jnp.float32
                              ).astype(dtype)
        r2, its = solve(fl, ll, b)
        sync(r2)
        t0 = time.perf_counter()
        r2, its = solve(fl, ll, b)
        r2v = sync(r2)
        dt = time.perf_counter() - t0
        print(f"{tag} HISQ 4-mass multishift CG: {dt:.3f} s,"
              f" its={int(sync(its))}, worst rel_r2={r2v:.2e}")
        recs.append({"config": tag.split()[0], "name": tag,
                     "warm_seconds": round(dt, 4),
                     "iterations": int(sync(its)), "worst_rel_r2": r2v})

    if 5 in args.configs:
        # single-chip HISQ timing point with REAL fattening at 24^3x48
        # (CONFIG7 is the north-star 32^3x64 point, which also fits
        # one chip since the MGS sampler + per-direction jits)
        lat = Lattice((24, 24, 24, 48))
        u = hot(lat)
        from qex_tpu.gauge.fat7 import hisq_links_lowmem

        # fattening chunked per direction outside the solve jit: the
        # fused graph's lane-padded temps exceed one chip's HBM here
        phase = jax.jit(lambda uu: st.phase_links(lat, uu, "pppa"))
        fl, ll = hisq_links_lowmem(lat, phase(u))
        hisq_multishift("CONFIG5 24^3x48", lat, fl, ll, 5)

    if 6 in args.configs:
        # headline-volume point with the REAL two-level fattening: the
        # MGS Haar sampler (no padded batched QR) + hisq_links_lowmem's
        # per-direction jits fit 32^4 on one v5e chip (exp_fat32.py:
        # fatten 295 s incl. remote compiles, warm 4-mass multishift
        # 0.77 s / 318 its / rel_r2 4e-9)
        from qex_tpu.gauge.fat7 import hisq_links_lowmem
        from qex_tpu.physics import staggered as stg
        lat = Lattice((32, 32, 32, 32))
        u = hot(lat, seed=61)
        phase = jax.jit(lambda uu: stg.phase_links(lat, uu))
        fl, ll = hisq_links_lowmem(lat, phase(u))
        hisq_multishift("CONFIG6 32^4 (real HISQ links)", lat, fl, ll, 6)

    if 7 in args.configs:
        # the NORTH-STAR volume (BASELINE.md config 5: 32^3x64 HISQ
        # multi-mass CG) on ONE chip: measured warm fatten 4.2 s +
        # warm 4-mass multishift 1.61 s / 319 its / rel_r2 4e-9
        # (exp_fat32.py 32 64); the v5p-32 mesh path carries the same
        # ops via physics/stag_shard when more HBM/throughput is needed
        from qex_tpu.gauge.fat7 import hisq_links_lowmem
        from qex_tpu.physics import staggered as stg
        lat = Lattice((32, 32, 32, 64))
        u = hot(lat, seed=71)
        phase = jax.jit(lambda uu: stg.phase_links(lat, uu))
        t0 = time.perf_counter()
        fl, ll = hisq_links_lowmem(lat, phase(u))
        # block_until_ready is a silent no-op on the tunnel: sync by
        # fetching a jitted scalar
        sync(jax.jit(lambda a: jnp.real(jnp.sum(jnp.abs(a[0, 0, 0])))
                     )(fl))
        print(f"CONFIG7 32^3x64 two-level fattening: "
              f"{time.perf_counter()-t0:.1f} s (incl. compiles)")
        hisq_multishift("CONFIG7 32^3x64 (north-star volume)", lat,
                        fl, ll, 7)

    if args.json:
        out = {"device": str(dev.device_kind),
               "platform": dev.platform,
               "when": time.strftime("%Y-%m-%d %H:%M:%S"),
               "records": recs}
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {args.json} ({len(recs)} records)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
