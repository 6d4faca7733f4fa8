"""XML-driven staggered + Pauli-Villars HMC (the production app).

TPU-native replacement for QEX's src/stagg_pv_hmc/staghmc_spv.nim
(2,413 LoC): nHYP-smeared staggered fermions (Nf, mass) + num_pv
Pauli-Villars bosons (mass_pv), unsmeared + optional smeared gauge
actions (Wilson / rect / adjoint), per-field integrators and step
counts, Metropolis warmup delay (no_metropolis_until), measurement
lines (MEASplaq / MEASploop), reversibility checks, and checkpointing.

Usage:
    python -m qex_tpu.apps.staghmc_spv --xml input_hmc.xml \
        [--ntraj N] [--cpu] [-key=value ...]

Output lines are grep-able tags in the reference's style
(staghmc_spv_meas.nim): MEASplaq, MEASploop, "Begin/End H", ACCEPT/REJECT.
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_theory(cfg, lat, dtype, mesh=None):
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge.smear import HypCoefs
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)
    from qex_tpu.solvers.base import SolverParams

    def coeffs(act, beta, c1, adj_fac):
        if act.lower() == "wilson":
            return ga.wilson(beta)
        if act.lower() == "rect":
            return ga.gauge_act_rect(beta, c1)
        if act.lower() == "adjoint":
            return ga.adjoint_action(beta, adj_fac)
        raise ValueError(f"unknown gauge action {act!r}")

    gauges = [GaugeActionSpec(coeffs(cfg.gauge_act, cfg.beta, cfg.c1,
                                     cfg.adj_fac),
                              steps=cfg.g_steps, scheme=cfg.gauge_int_alg,
                              smeared=False)]
    if cfg.sg_opt:
        gauges.append(GaugeActionSpec(
            coeffs(cfg.smeared_gauge_act, cfg.sm_beta, cfg.sm_c1,
                   cfg.sm_adj_fac),
            steps=cfg.sg_steps, scheme=cfg.smeared_gauge_int_alg,
            smeared=True))

    fermions = []
    matter_smeared = cfg.matter_smearing.lower() == "nhyp"
    # Nf staggered fermions: each field = 4 tastes; Nf%4 == 0 uses
    # Nf/4 plain (2-taste-pair) pseudofermion fields like the reference;
    # non-multiples use a rooted term.
    if cfg.nf > 0:
        if cfg.nf % 4 == 0:
            for _ in range(cfg.nf // 4):
                fermions.append(FermionSpec("fermion", cfg.mass,
                                            steps=cfg.f_steps,
                                            scheme=cfg.ferm_int_alg,
                                            smeared=matter_smeared))
        else:
            fermions.append(FermionSpec("rooted", cfg.mass,
                                        steps=cfg.f_steps,
                                        scheme=cfg.ferm_int_alg,
                                        smeared=matter_smeared,
                                        nf=cfg.nf))
    for _ in range(cfg.num_pv):
        fermions.append(FermionSpec("boson", cfg.mass_pv,
                                    steps=cfg.pv_steps,
                                    scheme=cfg.pv_int_alg,
                                    smeared=matter_smeared))

    smear = (HypCoefs(cfg.alpha_1, cfg.alpha_2, cfg.alpha_3)
             if (matter_smeared or cfg.gauge_smearing.lower() == "nhyp")
             else None)
    return LatticeFieldTheory(
        lat, gauges, fermions, smear=smear, bc=cfg.bc,
        solver_params=SolverParams(
            r2req=cfg.a_tol, maxits=cfg.a_maxits, restarts=3,
            mesh=mesh, sloppy=bool(cfg.sloppy_solve)),
        # MD-force solves at the (usually looser) f_tol/f_maxits
        # (QEX staghmc_spv_init_and_io.nim:482)
        force_solver_params=SolverParams(
            r2req=cfg.f_tol, maxits=cfg.f_maxits, restarts=3,
            mesh=mesh, sloppy=bool(cfg.sloppy_solve)),
        tau=cfg.tau)


def main(argv=None) -> int:
    # long-running app: line-buffer stdout so progress survives
    # pipes and timeouts
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    ap = argparse.ArgumentParser(prog="staghmc_spv")
    ap.add_argument("--xml", help="XML input deck (input_hmc.xml format)")
    ap.add_argument("--json", help="JSON input deck")
    ap.add_argument("--ntraj", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--profile", action="store_true",
                    help="print a per-trajectory phase timer tree "
                    "(heatbath/md/metropolis with per-kick children; "
                    "QEX profile.nim echoTimers role). Forces the "
                    "split-step dispatcher and adds one device sync "
                    "per phase.")
    ap.add_argument("overrides", nargs="*",
                    help="-key=value config overrides")
    args, unknown = ap.parse_known_args(argv)
    args.overrides = list(args.overrides) + [
        a for a in unknown if a.startswith("-") and "=" in a]
    bad = [a for a in unknown if not (a.startswith("-") and "=" in a)]
    if bad:
        ap.error(f"unrecognized arguments: {bad}")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import loops
    from qex_tpu.io import checkpoint as ckpt
    from qex_tpu.ops import group, linalg
    from qex_tpu.utils.config import HMCConfig

    if args.xml:
        cfg = HMCConfig.from_xml(args.xml)
    elif args.json:
        cfg = HMCConfig.from_json(args.json)
    else:
        cfg = HMCConfig()
    kvs = {}
    for ov in args.overrides:
        k, _, v = ov.lstrip("-").partition("=")
        kvs[k] = v
    cfg.override(kvs)
    ntraj = args.ntraj if args.ntraj is not None else cfg.num_trajectories

    lat = Lattice(cfg.dims)
    # Large-volume strategy (both measured at 24^4 nHYP+2PV on v5e):
    # the FUSED whole-trajectory jit with loop-expanded site linalg
    # OOM-kills the XLA compiler itself, while the einsum fallback
    # OOMs device HBM instead (batched 3x3 dot_generals tile-pad ~30x).
    # So above ~300k sites default to the SPLIT-STEP dispatcher, whose
    # small per-kick programs keep the compiler happy with the
    # device-efficient loop-expanded linalg.  QEX_TPU_SPLIT_TRAJ=0/1
    # and QEX_TPU_LINALG_EINSUM=0/1 override.
    split_env = os.environ.get("QEX_TPU_SPLIT_TRAJ")
    use_split = (split_env == "1" if split_env is not None
                 else lat.volume >= 300_000)
    if args.profile:
        use_split = True  # phase timing needs the split dispatcher
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64
    print(f"# staghmc_spv: lattice {lat.dims} nf={cfg.nf} "
          f"mass={cfg.mass} num_pv={cfg.num_pv} mass_pv={cfg.mass_pv} "
          f"beta={cfg.beta} tau={cfg.tau} device={jax.devices()[0]}")

    lm = None
    if cfg.rank_geom:
        import math

        from qex_tpu.parallel import make_lattice_mesh
        rg = tuple(int(x) for x in
                   cfg.rank_geom.replace("x", ",").split(",") if x)
        lm = make_lattice_mesh(lat, devices=jax.devices()[:math.prod(rg)],
                               rank_geom=rg)
    # on TPU, route the staggered solves through the shard_map Pallas
    # kernels (stag_shard); on CPU the GSPMD XLA path is the fast one
    theory = build_theory(cfg, lat, dtype,
                          mesh=(lm if (lm is not None and not on_cpu)
                                else None))

    # gauge start / resume
    start_traj = 0
    n_acc = 0
    if cfg.start_config > 0:
        fn = os.path.join(cfg.save_path,
                          f"{cfg.save_filename}_{cfg.start_config}")
        u, rng_state, start_traj = ckpt.load_checkpoint(fn, lat, dtype)
        # full chain state: counter-based RNG means (seed, traj) IS the
        # RNG state (the analog of QEX's saved RNG field,
        # staghmc_spv_rng.nim:60-182); acceptance counter restored too
        n_acc = int(rng_state.get("n_acc", 0))
        if int(rng_state.get("serial_seed", cfg.serial_seed)) \
                != cfg.serial_seed:
            print("# WARNING: checkpoint serial_seed "
                  f"{rng_state['serial_seed']} != deck {cfg.serial_seed};"
                  " using checkpoint value for chain continuity")
            cfg.serial_seed = int(rng_state["serial_seed"])
        print(f"# resumed from {fn} at trajectory {start_traj}")
    elif cfg.start == "cold":
        u = group.unit_gauge(lat, dtype)
    else:
        @jax.jit
        def hot(seed):
            key = jax.random.PRNGKey(seed)
            return jnp.stack([
                linalg.expm(0.7 * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
                for i in range(lat.nd)])
        u = hot(cfg.parallel_seed)

    if lm is not None:
        # GSPMD-sharded chain over the device mesh (QEX -rankgeom:,
        # layoutX.nim:83; sharded-vs-replicated equality pinned by
        # tests/test_sharded_hotpath.py and test_spv_parity.py)
        from qex_tpu.parallel import shard_field
        u = shard_field(lm, u, 3)
        print(f"# device mesh rank_geom={lm.rank_geom} "
              f"({len(lm.mesh.devices.flat)} devices)")

    @jax.jit
    def measure(u):
        pl = loops.plaquette(lat, u)
        ploop = loops.polyakov_loop(lat, u)
        plq6 = loops.plaquette_by_plane(lat, u)
        return (jnp.real(pl).astype(jnp.float32),
                jnp.real(ploop).astype(jnp.float32),
                jnp.imag(ploop).astype(jnp.float32),
                jnp.real(plq6).astype(jnp.float32))

    prof = None
    if args.profile:
        from qex_tpu.utils.profile import Profiler
        prof = Profiler()
    if use_split:
        print("# split-step trajectory dispatch (large volume)")
        step = lambda k, uu, warm: theory.hmc_step_split(
            k, uu, always_accept=warm, prof=prof)
    else:
        step = jax.jit(lambda k, uu, warm: theory.hmc_step(
            k, uu, always_accept=warm))

    check_jit = jax.jit(theory.solver_report) if cfg.check_solvers \
        else None
    rev_jit = jax.jit(theory.reverse_check) if cfg.rev_check_freq \
        else None

    for traj in range(start_traj, start_traj + ntraj):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.PRNGKey(cfg.serial_seed), traj)
        warmup = traj < cfg.no_metropolis_until
        u, st = step(key, u, warmup)
        dH = float(st.dH)
        acc = bool(st.accepted)
        n_acc += int(acc and not warmup)
        print(f"Begin H: {float(st.h_old):.10g}")
        print(f"End H: {float(st.h_new):.10g}")
        print(f"{'ACCEPT' if acc else 'REJECT'}: dH {dH:.6g} "
              f"({time.time()-t0:.2f} s){' [warmup]' if warmup else ''}")
        if prof is not None:
            # per-trajectory phase tree (QEX echoTimers,
            # profile.nim:411-554 @ staghmc_spv.nim:356-365)
            print("PROFILE trajectory phase tree:")
            print(prof.report())
            prof.reset()
        if check_jit is not None:
            # per-trajectory solver verification (QEX check_solvers,
            # staghmc_spv.nim:1066-1090): re-solve each term at a_tol
            # and report iterations + true residual
            for name, (its, rel) in check_jit(
                    jax.random.fold_in(key, 101), u).items():
                print(f"SOLVER {name}: its {int(its)} "
                      f"relr2 {float(rel):.4g}")
        if rev_jit is not None and (traj + 1) % cfg.rev_check_freq == 0:
            rev = rev_jit(jax.random.fold_in(key, 202), u)
            print(f"Reversed H: {float(rev['h2']):.10g}")
            print(f"REVCHECK dHrev {float(rev['dH_rev']):.6g} "
                  f"udev2 {float(rev['u_dev2']):.6g} "
                  f"pdev2 {float(rev['p_dev2']):.6g}")
        if cfg.plaq_freq and (traj + 1) % cfg.plaq_freq == 0:
            pl, plr, pli, plq6 = measure(u)
            print(f"MEASplaq {float(pl):.12g}")
            if cfg.plaq_verbose:
                print("MEASplaq6 " + " ".join(
                    f"{float(x):.10g}" for x in plq6))
        if cfg.ploop_freq and (traj + 1) % cfg.ploop_freq == 0:
            _, plr, pli, _ = measure(u)
            print(f"MEASploop {float(plr):.10g} {float(pli):.10g}")
        if cfg.pbp_freq and (traj + 1) % cfg.pbp_freq == 0:
            from qex_tpu.observables import condensate
            from qex_tpu.solvers.base import SolverParams
            pbp = condensate.pbp_staggered(
                jax.random.fold_in(jax.random.PRNGKey(
                    cfg.parallel_seed), 10_000 + traj),
                lat, u, cfg.mass, bc=cfg.bc,
                params=SolverParams(r2req=cfg.a_tol,
                                    maxits=cfg.a_maxits, restarts=3))
            print(f"MEASpbp {float(pbp):.10g}")
        if cfg.save_freq and (traj + 1) % cfg.save_freq == 0:
            fn = os.path.join(cfg.save_path,
                              f"{cfg.save_filename}_{traj + 1}")
            ckpt.save_checkpoint(fn, u,
                                 {"serial_seed": cfg.serial_seed,
                                  "parallel_seed": cfg.parallel_seed,
                                  "n_acc": n_acc},
                                 traj + 1)
            print(f"# saved {fn}")
    done = ntraj - min(cfg.no_metropolis_until - start_traj, ntraj)
    if done > 0:
        print(f"# acceptance: {n_acc}/{done} = {n_acc/max(1,done):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
