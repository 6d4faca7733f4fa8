"""Composable lattice field theory: gauge + smeared staggered matter HMC.

TPU-native replacement for QEX's mcmc builder
(``newLatticeFieldTheory``/``addGaugeAction``/``addMatterAction``,
src/mcmc/mcmcTypes.nim:924, src/mcmc/actions/latticeAction.nim:65-170)
and the production staghmc_spv composition (nHYP-smeared staggered
fermions + Pauli-Villars bosons + unsmeared gauge action,
src/stagg_pv_hmc/staghmc_spv.nim:36-58).

Each matter term acts on nHYP-smeared links; forces flow through the
smearing by AD (one shared forward smear per force time-group is left
to XLA CSE).  The Hamiltonian, heatbath, trajectory, and Metropolis
test are assembled into a single jittable ``hmc_step``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from ..gauge.action import (GaugeActionCoeffs, force_from_action,
                            full_action, full_action2)
from ..gauge.smear import (HypCoefs, StoutCoefs, nhyp_smear,
                           nhyp_stages, nhyp_stage_terms,
                           nhyp_stages_preproj, stout_smear)
from ..hmc import hmc as hmc_mod
from ..lattice import Lattice
from ..ops import dsum, group
from ..physics import stag_hmc
from ..solvers.base import SolverParams
from .md import ActionTerm, run_trajectory, run_trajectory_split


@dataclasses.dataclass(frozen=True)
class GaugeActionSpec:
    """Gauge action + its MD timescale (QEX addGaugeAction)."""

    coeffs: GaugeActionCoeffs
    steps: int = 10
    scheme: str = "2MN"
    smeared: bool = False  # smeared gauge action (staghmc_spv option)


@dataclasses.dataclass(frozen=True)
class FermionSpec:
    """One staggered matter field (QEX addStaggeredFermion /
    addStaggeredBoson)."""

    kind: str          # "fermion" | "boson" | "rooted" | "hisq"
    mass: float
    steps: int = 10
    scheme: str = "2MN"
    smeared: bool = True
    nf: int = 1        # rooted only: S = phi^dag A^{-nf/4} phi
    degree: int = 10   # rooted only: rational approximation degree
    hmasses: tuple = ()  # Hasenbusch preconditioner masses (ascending);
    #                      splits the fermion into ratio terms + one
    #                      plain term at the heaviest mass
    #                      (staghmc_sh hmasses parity)


class LatticeFieldTheory:
    """Gauge + matter HMC system.

    Args mirror the JSON/XML decks of the reference (lattice geometry,
    action coefficients, per-field masses/integrators/steps, smearing
    coefficients, boundary conditions).
    """

    def __init__(self, lat: Lattice,
                 gauge: GaugeActionSpec | Sequence[GaugeActionSpec],
                 fermions: Sequence[FermionSpec] = (),
                 smear: HypCoefs | StoutCoefs | None = None,
                 bc: str = "pppa",
                 solver_params: SolverParams = SolverParams(
                     r2req=1e-12, maxits=2000, restarts=3),
                 force_solver_params: SolverParams | None = None,
                 tau: float = 1.0):
        self.lat = lat
        self.gauges = ((gauge,) if isinstance(gauge, GaugeActionSpec)
                       else tuple(gauge))
        self.fermions = tuple(fermions)
        self.smear_coefs = smear
        self.bc = bc
        self.solver_params = solver_params
        # separate MD-force solve tolerance (QEX f_tol/f_maxits,
        # staghmc_spv_init_and_io.nim:482); None = same as action solves
        self.force_solver_params = force_solver_params
        self.tau = tau
        self.matter_bases: list[tuple[str, Any]] = []
        self.terms = self._build_terms()

    # -- construction ------------------------------------------------------
    def _smear(self, u: jax.Array) -> jax.Array:
        if self.smear_coefs is None:
            return u
        if isinstance(self.smear_coefs, StoutCoefs):
            # stout per-action smearing (mcmcTypes.nim:183-196 offers
            # nhyp OR stout); force = AD through the exp-staple map
            return stout_smear(self.smear_coefs, self.lat, u)
        return nhyp_smear(self.smear_coefs, self.lat, u)

    def _build_terms(self) -> list[ActionTerm]:
        lat = self.lat
        terms: list[ActionTerm] = []

        for gi, gspec in enumerate(self.gauges):
            gc = gspec.coeffs
            smeared = gspec.smeared and self.smear_coefs is not None

            def g_action(u, _phi, gc=gc, smeared=smeared):
                v = self._smear(u) if smeared else u
                return full_action(gc, lat, v)

            def g_force(u, _phi, gc=gc, smeared=smeared,
                        g_action=g_action):
                if not smeared:
                    # hand staple force (plaq/adjplaq) + AD remainder
                    from ..gauge.action import gauge_force
                    return gauge_force(gc, lat, u)
                return force_from_action(lambda uu: g_action(uu, None), u)

            def g_chain(v, _phi, gc=gc):
                from ..gauge.action import gauge_grad
                return gauge_grad(gc, lat, v)

            def g_action2(u, _phi, gc=gc, smeared=smeared):
                v = self._smear(u) if smeared else u
                return full_action2(gc, lat, v)

            name = "smeared_gauge" if smeared else "gauge"
            terms.append(ActionTerm(f"{name}{gi}", g_action, g_force,
                                    gspec.steps, gspec.scheme,
                                    smeared=smeared,
                                    chain_force=g_chain if smeared
                                    else None,
                                    action2=g_action2))

        for i, spec in enumerate(self.fermions):
            fp = self.force_solver_params
            if spec.kind == "fermion" and spec.hmasses:
                # Hasenbusch chain: ratio(m, h1), ratio(h1, h2), ...,
                # plain fermion at the heaviest mass
                ms = (spec.mass,) + tuple(spec.hmasses)
                bases = [stag_hmc.StagHasenbusch(
                    lat, ms[j], ms[j + 1], self.bc, self.solver_params,
                    force_params=fp)
                    for j in range(len(ms) - 1)]
                bases.append(stag_hmc.StagFermion(
                    lat, ms[-1], self.bc, self.solver_params,
                    force_params=fp))
                for j, hb in enumerate(bases):
                    self._add_matter_term(
                        terms, hb, f"fermion{i}_h{j}", spec)
                continue
            if spec.kind == "fermion":
                base = stag_hmc.StagFermion(lat, spec.mass, self.bc,
                                            self.solver_params,
                                            force_params=fp)
            elif spec.kind == "boson":
                base = stag_hmc.StagBoson(lat, spec.mass, self.bc,
                                          self.solver_params)
            elif spec.kind == "rooted":
                base = stag_hmc.StagRootedFermion(
                    lat, spec.mass, nf=spec.nf, bc=self.bc,
                    degree=spec.degree, params=self.solver_params,
                    force_params=fp)
            elif spec.kind == "hisq":
                # HISQ does its own (fat7+naik) smearing internally
                spec = dataclasses.replace(spec, smeared=False)
                if spec.hmasses:
                    # Hasenbusch chain over the naik operator
                    # (examples/hisqhmc_h.nim role)
                    ms = (spec.mass,) + tuple(spec.hmasses)
                    bases = [stag_hmc.HisqHasenbusch(
                        lat, ms[j], ms[j + 1], self.bc,
                        params=self.solver_params, force_params=fp)
                        for j in range(len(ms) - 1)]
                    bases.append(stag_hmc.HisqFermion(
                        lat, ms[-1], bc=self.bc,
                        params=self.solver_params, force_params=fp))
                    for j, hb in enumerate(bases):
                        self._add_matter_term(
                            terms, hb, f"hisq{i}_h{j}", spec)
                    continue
                base = stag_hmc.HisqFermion(lat, spec.mass, bc=self.bc,
                                            params=self.solver_params,
                                            force_params=fp)
            else:
                raise ValueError(f"unknown matter kind {spec.kind!r}")
            self._add_matter_term(terms, base,
                                  f"{spec.kind}{i}_m{spec.mass}", spec)
        return terms

    def _add_matter_term(self, terms, base, name, spec):
        s_act = base.make_action_fn()
        smeared = spec.smeared and self.smear_coefs is not None
        self.matter_bases.append((name, base, smeared))

        def f_action(u, phi, s_act=s_act, smeared=smeared):
            v = self._smear(u) if smeared else u
            return s_act(v, phi)

        def f_force(u, phi, f_action=f_action):
            return force_from_action(lambda uu: f_action(uu, phi), u)

        def f_chain(v, phi, s_act=s_act):
            return jax.grad(lambda vv: s_act(vv, phi))(v)

        def f_heat(key, u, base=base, smeared=smeared):
            v = self._smear(u) if smeared else u
            return base.heatbath(key, v)

        f_action2 = None
        if hasattr(base, "make_action2_fn"):
            s_act2 = base.make_action2_fn()

            def f_action2(u, phi, s_act2=s_act2, smeared=smeared):
                v = self._smear(u) if smeared else u
                return s_act2(v, phi)

        terms.append(ActionTerm(name, f_action, f_force, spec.steps,
                                spec.scheme, heatbath=f_heat,
                                smeared=smeared,
                                chain_force=f_chain if smeared
                                else None,
                                action2=f_action2))

    # -- HMC ---------------------------------------------------------------
    def heatbath(self, key: jax.Array, u: jax.Array) -> list[Any]:
        """Refresh all pseudofermion fields (QEX fermionHeatbath)."""
        phis: list[Any] = []
        keys = jax.random.split(key, len(self.terms))
        for term, k in zip(self.terms, keys):
            phis.append(term.heatbath(k, u) if term.heatbath else None)
        return phis

    def hamiltonian(self, u: jax.Array, p: jax.Array,
                    phis: Sequence[Any]) -> jax.Array:
        h = hmc_mod.kinetic_energy(p)
        for term, phi in zip(self.terms, phis):
            h = h + term.action(u, phi)
        return h

    def hamiltonian2(self, u: jax.Array, p: jax.Array,
                     phis: Sequence[Any]):
        """Two-float Hamiltonian (hi, lo): every site reduction
        compensated (ops.dsum), so Metropolis dH keeps sub-ulp
        resolution at volume in f32 (the reference carries H in f64,
        src/hmc/metropolis.nim:6-16).  Terms without an action2 twin
        fall back to their scalar action (lo = 0)."""
        h = hmc_mod.kinetic_energy2(p)
        for term, phi in zip(self.terms, phis):
            if term.action2 is not None:
                h = dsum.df_add(h, term.action2(u, phi))
            else:
                a = term.action(u, phi)
                h = dsum.df_add(h, (a, jnp.zeros_like(a)))
        return h

    def hmc_step(self, key: jax.Array, u: jax.Array, nsteps_scale: int = 1,
                 always_accept: bool | jax.Array = False):
        """One full trajectory: momenta + pseudofermion heatbath, MD,
        Metropolis (QEX runHamiltonianMonteCarlo :13-76).

        jit-safe; ``always_accept`` may be a TRACED boolean (warmup
        flag), so one compiled step serves both phases.  Returns
        (u', HMCState).
        """
        lat = self.lat
        kp, kf, ka = jax.random.split(key, 3)
        nd, nc = u.shape[0], u.shape[1]
        p = jax.vmap(lambda k: group.random_tah(
            k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))
        phis = self.heatbath(kf, u)
        h_old2 = self.hamiltonian2(u, p, phis)
        transform = (self._smear
                     if any(t.smeared for t in self.terms) else None)
        u1, p1 = run_trajectory(self.terms, u, p, phis, self.tau,
                                hmc_mod.gauge_update_u,
                                transform=transform)
        h_new2 = self.hamiltonian2(u1, p1, phis)
        # dH from the two-float pairs: the hi difference is exact
        # (Sterbenz), the lo difference restores sub-ulp resolution
        dH = dsum.df_value(dsum.df_sub(h_new2, h_old2))
        r = jax.random.uniform(ka, (), jnp.float32)
        acc = jnp.logical_or(jnp.asarray(always_accept),
                             jnp.log(r) < -dH)
        u_out = jnp.where(acc, u1, u)
        return u_out, hmc_mod.HMCState(accepted=acc, dH=dH,
                                       h_old=dsum.df_value(h_old2),
                                       h_new=dsum.df_value(h_new2))

    def reverse_check(self, key: jax.Array, u: jax.Array) -> dict:
        """Reversibility test over the FULL multi-timescale trajectory:
        integrate, flip momenta, integrate back; report H drift and
        field deviation.  QEX parity: staghmc_spv rev_check
        (staghmc_spv.nim:1091,1243-1245; hmc/hmc.nim:8-17).

        jit-safe; uses the same heatbath draw a real trajectory from
        ``key`` would use.
        """
        from ..ops import linalg
        kp, kf, _ = jax.random.split(key, 3)
        nd, nc = u.shape[0], u.shape[1]
        p = jax.vmap(lambda k: group.random_tah(
            k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))
        phis = self.heatbath(kf, u)
        transform = (self._smear
                     if any(t.smeared for t in self.terms) else None)
        h0 = self.hamiltonian2(u, p, phis)
        u1, p1 = run_trajectory(self.terms, u, p, phis, self.tau,
                                hmc_mod.gauge_update_u,
                                transform=transform)
        h1 = self.hamiltonian2(u1, p1, phis)
        u2, p2 = run_trajectory(self.terms, u1, -p1, phis, self.tau,
                                hmc_mod.gauge_update_u,
                                transform=transform)
        h2 = self.hamiltonian2(u2, p2, phis)
        return {"h0": dsum.df_value(h0), "h1": dsum.df_value(h1),
                "h2": dsum.df_value(h2),
                "dH_fwd": dsum.df_value(dsum.df_sub(h1, h0)),
                "dH_rev": dsum.df_value(dsum.df_sub(h2, h0)),
                "u_dev2": linalg.norm2(u2 - u) / linalg.norm2(u),
                "p_dev2": linalg.norm2(p2 + p) / linalg.norm2(p)}

    def solver_report(self, key: jax.Array, u: jax.Array) -> dict:
        """Per-term solver verification: heatbath a phi, re-solve at the
        action tolerance, return {term name: (iterations, true relative
        residual)}.  QEX parity: ``check_solvers`` per-trajectory solver
        stats (staghmc_spv.nim:1066-1090).  jit-safe (string keys are
        static pytree structure)."""
        out = {}
        keys = jax.random.split(key, max(1, len(self.matter_bases)))
        for (name, base, smeared), k in zip(self.matter_bases, keys):
            if not hasattr(base, "check_solve"):
                continue
            v = self._smear(u) if smeared else u
            phi = base.heatbath(k, v)
            out[name] = base.check_solve(v, phi)
        return out

    def reverse_check_split(self, key: jax.Array, u: jax.Array) -> dict:
        """:meth:`reverse_check` via the split-step dispatcher -- the
        only reversibility path that compiles at north-star volumes
        (the fused whole-trajectory VJP program exceeds the compiler's
        memory envelope at 24^4+)."""
        from ..ops import linalg
        lat = self.lat
        _cache, transform, stages = self._split_transform_stages()

        @jax.jit
        def begin(key, u):
            kp, kf, _ = jax.random.split(key, 3)
            nd, nc = u.shape[0], u.shape[1]
            p = jax.vmap(lambda k: group.random_tah(
                k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))
            phis = self.heatbath(kf, u)
            return p, phis, self.hamiltonian2(u, p, phis)

        ham = jax.jit(self.hamiltonian2)
        p, phis, h0 = begin(key, u)
        u1, p1 = run_trajectory_split(self.terms, u, p, phis, self.tau,
                                      hmc_mod.gauge_update_u,
                                      transform=transform,
                                      transform_stages=stages)
        h1 = ham(u1, p1, phis)
        u2, p2 = run_trajectory_split(self.terms, u1,
                                      jax.jit(lambda x: -x)(p1), phis,
                                      self.tau, hmc_mod.gauge_update_u,
                                      transform=transform,
                                      transform_stages=stages)
        h2 = ham(u2, p2, phis)

        @jax.jit
        def devs(u2, u, p2, p):
            return (linalg.norm2(u2 - u) / linalg.norm2(u),
                    linalg.norm2(p2 + p) / linalg.norm2(p))

        @jax.jit
        def finals(h0, h1, h2):
            return (dsum.df_value(h0), dsum.df_value(h1),
                    dsum.df_value(h2),
                    dsum.df_value(dsum.df_sub(h1, h0)),
                    dsum.df_value(dsum.df_sub(h2, h0)))

        ud, pd = devs(u2, u, p2, p)
        v0, v1, v2, dfw, drv = finals(h0, h1, h2)
        return {"h0": v0, "h1": v1, "h2": v2, "dH_fwd": dfw,
                "dH_rev": drv, "u_dev2": ud, "p_dev2": pd}

    def _split_transform_stages(self):
        """Cached (cache, transform, stages) for the split dispatcher.

        ONE bound-method object and ONE stages tuple per theory:
        ``self._smear`` makes a fresh bound method per attribute
        access, and rebuilding the stages tuple per call busted the
        md jit-bundle memo (keyed on object identity) every
        trajectory -- 160/181 programs recompiled on every warm
        trajectory (measured round 5)."""
        cache = getattr(self, "_split_jit_cache", None)
        if cache is None:
            cache = self._split_jit_cache = {}
        if "transform" not in cache:
            cache["transform"] = (
                self._smear
                if any(t.smeared for t in self.terms) else None)
        transform = cache["transform"]
        if "stages" not in cache:
            stages = None
            if transform is not None and isinstance(self.smear_coefs,
                                                    HypCoefs):
                pre, proj = nhyp_stages_preproj(self.smear_coefs,
                                                self.lat)
                stages = (pre, proj,
                          nhyp_stage_terms(self.smear_coefs,
                                           self.lat))
            cache["stages"] = stages
        return cache, transform, cache["stages"]

    def _split_begin_finish(self, transform, stages):
        """(begin, finish) built from SMALL per-term jits.

        Same math and the same key-splitting structure as the fused
        ``begin``/``finish`` (momenta from kp; per-term heatbath keys
        = split(kf, n_terms)), but the smear forward runs through the
        staged split path (md._smeared_split_jits, the same pieces the
        MD phase uses) and every heatbath / action2 term is its own
        program with the smeared links as an ARGUMENT.  Needed at the
        north-star volume, and cuts cold compile everywhere."""
        from . import md as md_mod
        from ..gauge.action import full_action2

        lat = self.lat
        terms = self.terms
        _sm, _add, _ch, _pb, sj = md_mod._smeared_split_jits(
            terms, transform, stages)
        j1s, j2s, j3s = sj
        big = lat.volume >= md_mod.FWD_SPLIT_MIN_SITES

        def smear_v(u):
            # per-stage dispatch throttles at big volumes: program
            # outputs are allocated at DISPATCH on the axon tunnel, so
            # an unthrottled begin pipeline pre-allocates every queued
            # stage's outputs and RESOURCE_EXHAUSTED s at 32^3x64 (see
            # md.dispatch_throttle)
            a1 = j1s(u)
            if big:
                md_mod.dispatch_throttle(a1)
            a2 = j2s(u, a1)
            del a1
            if big:
                md_mod.dispatch_throttle(a2)
            v = j3s(u, a2)
            if big:
                md_mod.dispatch_throttle(v)
            return v

        nterms = len(terms)
        any_sm = any(t.smeared for t in terms)

        @jax.jit
        def draw_p(kp, u):
            nd, nc = u.shape[0], u.shape[1]
            return jax.vmap(lambda k: group.random_tah(
                k, u.shape[3:], nc, u.dtype))(
                jax.random.split(kp, nd))

        @jax.jit
        def split3(key):
            return jax.random.split(key, 3)

        @jax.jit
        def splitn(key):
            return jax.random.split(key, nterms)

        kin2 = jax.jit(hmc_mod.kinetic_energy2)

        # per-term v-level jits, aligned with self.terms (gauges first,
        # then matter in matter_bases order)
        heats: list = []
        acts2: list = []
        for gspec in self.gauges:
            gc = gspec.coeffs
            heats.append(None)
            acts2.append(jax.jit(
                lambda w, _phi, gc=gc: full_action2(gc, lat, w)))
        for (_name, base, _sm_b) in self.matter_bases:
            heats.append(jax.jit(
                lambda k, w, base=base: base.heatbath(k, w)))
            if hasattr(base, "make_action2_fn"):
                s2 = base.make_action2_fn()
                acts2.append(jax.jit(
                    lambda w, phi, s2=s2: s2(w, phi)))
            else:
                s1 = base.make_action_fn()
                acts2.append(jax.jit(
                    lambda w, phi, s1=s1: (
                        lambda a: (a, jnp.zeros_like(a)))(s1(w, phi))))
        assert len(heats) == nterms, (len(heats), nterms)

        @jax.jit
        def combine(*pairs):
            h = pairs[0]
            for q in pairs[1:]:
                h = dsum.df_add(h, q)
            return h

        def hamiltonian2_split(u, p, phis, v=None):
            if v is None:
                v = smear_v(u) if any_sm else u
            pairs = [kin2(p)]
            for i, t in enumerate(terms):
                w = v if t.smeared else u
                pairs.append(acts2[i](w, phis[i]))
            return combine(*pairs)

        def begin(key, u):
            kp, kf, ka = split3(key)
            v = smear_v(u) if any_sm else u
            keys = splitn(kf)
            phis = []
            for i, t in enumerate(terms):
                if heats[i] is None:
                    phis.append(None)
                else:
                    w = v if t.smeared else u
                    phis.append(heats[i](keys[i], w))
                    if big:
                        md_mod.dispatch_throttle(phis[-1])
            # momenta drawn AFTER the smear + heatbath (604 MB less
            # live during the level-2 forward at 32^3x64); kp comes
            # from the same split3 slot, so chains are unchanged
            p = draw_p(kp, u)
            # reuse the already-smeared v for H0 (the smear forward is
            # a third of the heatbath phase at the north-star volume)
            return p, phis, hamiltonian2_split(u, p, phis, v), ka

        @jax.jit
        def metro(u, u1, h_old2, h_new2, ka, warm):
            dH = dsum.df_value(dsum.df_sub(h_new2, h_old2))
            r = jax.random.uniform(ka, (), jnp.float32)
            acc = jnp.logical_or(jnp.asarray(warm), jnp.log(r) < -dH)
            u_out = jnp.where(acc, u1, u)
            return u_out, hmc_mod.HMCState(
                accepted=acc, dH=dH, h_old=dsum.df_value(h_old2),
                h_new=dsum.df_value(h_new2))

        def finish(u, u1, p1, phis, h_old2, ka, warm):
            h_new2 = hamiltonian2_split(u1, p1, phis)
            return metro(u, u1, h_old2, h_new2, ka, warm)

        return begin, finish

    def hmc_step_split(self, key: jax.Array, u: jax.Array,
                       always_accept: bool | jax.Array = False,
                       prof=None):
        """:meth:`hmc_step` dispatched as a Python loop of small jits
        (md.run_trajectory_split): identical math, but no single
        whole-trajectory XLA program -- required at volumes where that
        program exceeds the compiler's own memory envelope (24^4+
        smeared multi-field theories).  Do NOT wrap in jax.jit.

        ``prof``: optional utils.profile.Profiler — records the
        heatbath / md (per-phase children) / metropolis timer tree
        (QEX's per-trajectory profile, staghmc_spv.nim:356-365)."""
        import os as _os
        lat = self.lat
        # jit bundles are cached per theory: rebuilding them per call
        # created fresh wrappers whose programs recompiled and
        # reloaded EVERY trajectory (174/184 programs on trajectory 2,
        # measured round 5) -- warm trajectories paid near-cold
        # compile cost, and the program churn between the heatbath and
        # MD phases RESOURCE_EXHAUSTED the 32^3x64 north-star.
        cache, transform, stages = self._split_transform_stages()

        use_split = (stages is not None
                     and not _os.environ.get("QEX_FUSED_BEGIN"))
        mode = "split" if use_split else "fused"
        if ("bf", mode) not in cache:
            if use_split:
                # SPLIT heatbath/Hamiltonian: the fused `begin` is one
                # giant program (full nHYP forward + every heatbath
                # solve + every action2 term); at 32^3x64 it left the
                # subsequent MD piece programs RESOURCE_EXHAUSTED
                # (round-5 north-star runs) and it dominates cold
                # compile.  Momentum draw, each term's heatbath, and
                # each two-float action term run as separate small
                # jits against a pre-smeared v threaded as an
                # ARGUMENT, reusing the staged split forward path.
                cache[("bf", mode)] = self._split_begin_finish(
                    transform, stages)
            else:
                @jax.jit
                def begin(key, u):
                    kp, kf, ka = jax.random.split(key, 3)
                    nd, nc = u.shape[0], u.shape[1]
                    p = jax.vmap(lambda k: group.random_tah(
                        k, u.shape[3:], nc, u.dtype))(
                        jax.random.split(kp, nd))
                    phis = self.heatbath(kf, u)
                    return p, phis, self.hamiltonian2(u, p, phis), ka

                @jax.jit
                def finish(u, u1, p1, phis, h_old2, ka, warm):
                    h_new2 = self.hamiltonian2(u1, p1, phis)
                    dH = dsum.df_value(dsum.df_sub(h_new2, h_old2))
                    r = jax.random.uniform(ka, (), jnp.float32)
                    acc = jnp.logical_or(jnp.asarray(warm),
                                         jnp.log(r) < -dH)
                    u_out = jnp.where(acc, u1, u)
                    return u_out, hmc_mod.HMCState(
                        accepted=acc, dH=dH,
                        h_old=dsum.df_value(h_old2),
                        h_new=dsum.df_value(h_new2))

                cache[("bf", mode)] = (begin, finish)
        begin, finish = cache[("bf", mode)]

        import contextlib

        def ptimer(name, sync=None):
            return (prof.timer(name, sync=sync) if prof is not None
                    else contextlib.nullcontext())

        from .md import FWD_SPLIT_MIN_SITES, dispatch_throttle
        big = lat.volume >= FWD_SPLIT_MIN_SITES
        with ptimer("heatbath"):
            p, phis, h_old, ka = begin(key, u)
            if prof is not None:
                from ..utils.profile import _device_sync
                _device_sync(h_old)
            elif big:
                dispatch_throttle(h_old)
        if big:
            # drain, then give the tunnel's buffer frees time to land
            # before MD's first big dispatch (begin's intermediates are
            # Python-dead here but their device frees are async; the
            # first MD piece allocated into a still-full arena at
            # 32^3x64)
            import gc as _gc
            _gc.collect()
            import time as _time
            _time.sleep(2.0)
        if _os.environ.get("QEX_SPLIT_DROP_BEGIN"):
            # diagnostic (north-star OOM): drop the giant fused
            # heatbath executable before the MD piece programs run --
            # costs a recompile on the next trajectory
            getattr(begin, "clear_cache", lambda: None)()
            import gc as _gc
            _gc.collect()
        with ptimer("md"):
            u1, p1 = run_trajectory_split(self.terms, u, p, phis,
                                          self.tau,
                                          hmc_mod.gauge_update_u,
                                          transform=transform,
                                          transform_stages=stages,
                                          prof=prof)
        with ptimer("metropolis"):
            out = finish(u, u1, p1, phis, h_old, ka,
                         jnp.asarray(always_accept))
            if prof is not None:
                from ..utils.profile import _device_sync
                _device_sync(out[1].dH)
        return out
