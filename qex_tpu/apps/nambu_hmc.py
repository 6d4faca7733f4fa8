"""Pure-gauge Nambu HMC (two adjoint momenta, guide action).

TPU-native replacement for QEX's src/nhmc/puregaugenhmc.nim: Nambu-
bracket molecular dynamics (qex_tpu.hmc.nambu) whose guide action can
be any gauge action on stout-smeared links and/or a clover
topological-charge term; Metropolis on the exact target Hamiltonian.
QEX's hand-built stout force chain (purestout.smearedGaugeForce) is
jax.grad through qex_tpu.gauge.smear.stout_smear.

Usage (QEX letParam-style flags):
    python -m qex_tpu.apps.nambu_hmc -lat:8,8,8,8 -beta:6.0 \
        -nact:WilsonStout -nstout:3 -rho:0.1 -nbeta:6.0 \
        -tau:1.0 -steps:50 -trajs:10 [-cpu:true]
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    # long-running app: line-buffer stdout so progress survives
    # pipes and timeouts
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    from qex_tpu.utils.params import Params
    prm = Params(argv)

    lat_dims = prm.int_seq_param("lat", [8, 8, 8, 8], "lattice size")
    gact = prm.str_param("gact", "Wilson",
                         "target action: Wilson|Rect|Adjoint|...")
    nact = prm.str_param("nact", "WilsonStout",
                         "guide action (optionally *Stout, TopoClover*)")
    beta = prm.float_param("beta", 6.0, "target coupling")
    nbeta = prm.float_param("nbeta", 0.0, "guide coupling (0 -> beta)")
    adj_fac = prm.float_param("adjFac", -0.25, "adjoint ratio")
    rect_fac = prm.float_param("rectFac", -1.0 / 12.0, "rect c1")
    nstout = prm.int_param("nstout", 3, "stout steps in guide")
    rho = prm.float_param("rho", 0.1, "stout rho")
    beta_q = prm.float_param("betaQ", 1.0, "topo-term coefficient")
    tau = prm.float_param("tau", 1.0, "trajectory length")
    steps = prm.int_param("steps", 50, "MD steps")
    trajs = prm.int_param("trajs", 10, "trajectories")
    warmup = prm.int_param("noMetropolisUntil", 1, "warmup trajs")
    seed = prm.int_param("seed", 987654321, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU backend")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import loops
    from qex_tpu.gauge.smear import StoutCoefs, stout_smear
    from qex_tpu.hmc import nambu
    from qex_tpu.ops import group

    if prm.unknown():
        print(f"# warning: unused params {prm.unknown()}",
              file=sys.stderr)

    lat = Lattice(tuple(lat_dims))
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64
    nbeta = nbeta or beta

    def coeffs(name, b):
        n = (name.lower().replace("meta", "").replace("stout", "")
             .replace("topoclover", "wilson").replace("act", ""))
        table = {"wilson": ga.wilson(b), "": ga.wilson(b),
                 "rect": ga.gauge_act_rect(b, rect_fac),
                 "adjoint": ga.adjoint_action(b, adj_fac),
                 "symanzik": ga.symanzik(b),
                 "iwasaki": ga.iwasaki(b), "dbw2": ga.dbw2(b)}
        if n not in table:
            raise ValueError(f"unknown action {name!r}")
        return table[n]

    target = partial(ga.full_action, coeffs(gact, beta), lat)
    gcoef = coeffs(nact, nbeta)
    use_stout = "stout" in nact.lower()
    use_topo = "topoclover" in nact.lower()

    def guide(u):
        v = u
        if use_stout:
            for _ in range(nstout):
                v = stout_smear(StoutCoefs(rho), lat, v)
        if use_topo:
            q = loops.topo_charge_clover(lat, v)
            return beta_q * q * q
        return ga.full_action(gcoef, lat, v)

    use_meta = "meta" in nact.lower()
    amp = prm.float_param("amplitude", 1.0, "metadynamics bump height")
    sdev = prm.float_param("sdev", 5.0, "metadynamics bump width")
    gens = jnp.asarray(nambu.su_generators(lat.nc), dtype)
    print(f"# nambu_hmc {lat.dims} target={gact}@{beta} "
          f"guide={nact}@{nbeta} nstout={nstout} rho={rho} "
          f"meta={use_meta} device={jax.devices()[0]}")

    def smeared(uu):
        v = uu
        if use_stout:
            for _ in range(nstout):
                v = stout_smear(StoutCoefs(rho), lat, v)
        return v

    if use_meta:
        # NActTopoCloverStoutMeta: bias potential over the deposited
        # topological-charge history drives the dynamics
        hist = nambu.MetaHistory()

        @jax.jit
        def step(key, uu, centers, counts, warm):
            def guide_m(w):
                q = loops.topo_charge_clover(lat, smeared(w))
                return nambu.metadynamics_bias(q, centers, counts,
                                               amp, sdev)
            sys_m = nambu.NambuSystem(
                target, guide_m, gens,
                target_force=partial(ga.gauge_force,
                                     coeffs(gact, beta), lat))
            return nambu.nambu_hmc_step(key, uu, sys_m, tau, steps,
                                        always_accept=warm)
    else:
        tf = partial(ga.gauge_force, coeffs(gact, beta), lat)
        gf = (partial(ga.gauge_force, gcoef, lat)
              if not (use_stout or use_topo) else None)
        system = nambu.NambuSystem(target, guide, gens,
                                   target_force=tf, guide_force=gf)
        step = jax.jit(lambda k, uu, warm: nambu.nambu_hmc_step(
            k, uu, system, tau, steps, always_accept=warm))

    u = group.unit_gauge(lat, dtype)
    meas = jax.jit(lambda uu: (
        jnp.real(loops.plaquette(lat, uu)).astype(jnp.float32),
        jnp.real(loops.topo_charge_clover(lat, uu)).astype(jnp.float32)))

    n_acc = 0
    for traj in range(trajs):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.PRNGKey(seed), traj)
        warm = traj < warmup
        if use_meta:
            centers, counts = hist.arrays()
            u, dH, dG, acc = step(key, u, centers, counts, warm)
            _, qv = meas(u)
            hist.deposit(float(qv))
        else:
            u, dH, dG, acc = step(key, u, warm)
        pl, q = meas(u)
        accb = bool(acc)
        n_acc += int(accb and not warm)
        print(f"traj {traj}: dH {float(dH):+.6g} dG {float(dG):+.6g} "
              f"{'ACCEPT' if accb else 'REJECT'}"
              f"{' [warmup]' if warm else ''} MEASplaq "
              f"{float(pl):.10g} MEAStopo {float(q):.6g} "
              f"({time.time()-t0:.2f} s)")
    done = trajs - warmup
    if done > 0:
        print(f"# acceptance {n_acc}/{done} = {n_acc/done:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
