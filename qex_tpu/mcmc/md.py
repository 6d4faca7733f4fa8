"""Multi-timescale molecular dynamics scheduler.

TPU-native replacement for QEX's src/mcmc/mcmc/molecularDynamics.nim
(``trajectory`` :362-409 and ``mdStep`` :300) and the shared-update
optimization ``mdvAllfga`` of staghmc_spv.nim:947: each action term has
its OWN step count and integrator; the composite trajectory interleaves
all momentum kicks against one shared gauge-time axis.

How it works (the MDevolve semantics, compiled statically):

1. Every term expands its integrator pattern over its own step size
   dt_i = tau / steps_i into kick events at absolute gauge-times
   (the T coefficients advance time; V coefficients emit kicks).
2. All events are merged and sorted; U is advanced by exp(dt p) between
   consecutive event times; kicks at the same time are applied
   back-to-back (force evaluations of different terms at the same U are
   batched per unique time -- the ``mdvAllfga`` fusion).
3. The resulting flat [T-advance | kick...] schedule is unrolled under
   jit -- a fully static op sequence (SURVEY.md §7 hard part 4).

Force-gradient steps carry their (coeff, xi, dt) so the shifted-force
trick is applied per kick.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

from ..hmc.integrators import Integrator, get_integrator


@dataclasses.dataclass(frozen=True)
class ActionTerm:
    """One term of the total action with its own MD timescale.

    action(u, phi) -> real scalar; force(u, phi) -> TAH force field.
    ``phi`` is this term's (pytree of) pseudofermion fields, or None.
    heatbath(key, u) -> phi refresh (None for gauge terms).

    Smeared-sector sharing (QEX mdvAllfga fusion): terms acting on
    TRANSFORMED links V = transform(U) may also provide
    ``chain_force(v, phi) -> dS/dV`` (raw complex gradient in JAX's
    convention) and set ``smeared=True``.  The trajectory then computes
    ONE transform forward + ONE vjp per kick time-group, summing the
    (coefficient-weighted) chains of all smeared terms before
    backpropagating -- the chain rule is linear in the cotangent.
    """

    name: str
    action: Callable[[jax.Array, Any], jax.Array]
    force: Callable[[jax.Array, Any], jax.Array]
    steps: int
    scheme: Integrator | str = "2MN"
    heatbath: Callable[[jax.Array, jax.Array], Any] | None = None
    smeared: bool = False
    chain_force: Callable[[jax.Array, Any], jax.Array] | None = None
    # two-float measurement twin: action2(u, phi) -> (hi, lo) pair
    # (ops.dsum) for exact-Metropolis Hamiltonians at volume in f32;
    # None falls back to (action(u, phi), 0).
    action2: Callable[[jax.Array, Any], Any] | None = None

    def get_scheme(self) -> Integrator:
        s = self.scheme
        return get_integrator(s) if isinstance(s, str) else s


_EPS = 1e-9

# Site count above which the nHYP forward stages run as per-output
# slab-list jits instead of whole-level programs (whole-level forwards
# peak 6.1/9.8/6.3 GB at 24^4 c64 -- the north-star 32^3x64 cannot
# hold level 2; exp_nhyp_mem.py).  Tests monkeypatch this down to
# exercise the split path on small CPU lattices.
FWD_SPLIT_MIN_SITES = 1_000_000


def build_schedule(terms: Sequence[ActionTerm], tau: float):
    """Flatten all terms' integrator patterns into one sorted event list.

    Returns [(dt_advance, [(term_idx, coeff_dt, fg_a), ...]), ...]:
    advance U by dt, then apply the kicks.  ``fg_a`` (nonzero only for
    force-gradient kicks) is the force-shift magnitude a = 2 xi dt^2/c
    of hmc.integrators.fg_force.  Sum of advances == tau.
    """
    events: list[tuple[float, int, float, float]] = []
    for i, term in enumerate(terms):
        dt = tau / term.steps
        scheme = term.get_scheme()
        t = 0.0
        for _rep in range(term.steps):
            for st in scheme.steps:
                if st[0] == "T":
                    t += st[1] * dt
                elif st[0] == "V":
                    if st[1] != 0.0:
                        events.append((t, i, st[1] * dt, 0.0))
                elif st[0] == "FG":
                    c, xi = st[1], st[2]
                    if c != 0.0:
                        events.append((t, i, c * dt,
                                       2.0 * xi * dt * dt / c))
                else:  # pragma: no cover
                    raise ValueError(f"bad step kind {st[0]}")
        if abs(t - tau) > 1e-6 * max(1.0, abs(tau)):
            raise ValueError(
                f"term {term.name}: T coefficients sum to {t/dt} per step")
    events.sort(key=lambda e: e[0])

    schedule = []
    t_cur = 0.0
    k = 0
    while k < len(events):
        t_ev = events[k][0]
        group = []
        while k < len(events) and events[k][0] <= t_ev + _EPS:
            _, i, cdt, fg_a = events[k]
            # coalesce same-term kicks at the same time
            for j, (gi, gc, gx) in enumerate(group):
                if gi == i and gx == 0.0 and fg_a == 0.0:
                    group[j] = (gi, gc + cdt, 0.0)
                    break
            else:
                group.append((i, cdt, fg_a))
            k += 1
        schedule.append((t_ev - t_cur, group))
        t_cur = t_ev
    if tau - t_cur > _EPS:
        schedule.append((tau - t_cur, []))
    return schedule


def _shared_smeared_kick(transform, terms, kicks, u, p, phis):
    """Sum coefficient-weighted chains of all smeared kicks, apply one
    transform VJP, project TAH once: p += projTAH(U G^T)."""
    from ..ops import group

    v, vjp = jax.vjp(transform, u)
    chain = None
    for (i, cdt, _x) in kicks:
        c = cdt * terms[i].chain_force(v, phis[i])
        chain = c if chain is None else chain + c
    (gu,) = vjp(chain)
    from ..ops import linalg
    m = jax.vmap(lambda uu, gg: linalg.mul_na(uu, jnp.conj(gg)))(u, gu)
    return p + jax.vmap(group.tah)(m)


def _apply_schedule(schedule, terms, u, p, phis, update_u,
                    transform=None):
    for dt, kicks in schedule:
        if dt > _EPS:
            u = update_u(u, p, dt)
        shared = [k for k in kicks
                  if transform is not None and terms[k[0]].smeared
                  and terms[k[0]].chain_force is not None
                  and k[2] == 0.0]
        rest = [k for k in kicks if k not in shared]
        if shared:
            p = _shared_smeared_kick(transform, terms, shared, u, p,
                                     phis)
        for (i, cdt, fg_a) in rest:
            term = terms[i]
            if fg_a == 0.0:
                p = p - cdt * term.force(u, phis[i])
            else:
                from ..hmc.integrators import fg_force
                p = p - cdt * fg_force(
                    u, fg_a, lambda uu: term.force(uu, phis[i]),
                    update_u)
    return u, p


def run_trajectory(terms: Sequence[ActionTerm], u0: jax.Array,
                   p0: jax.Array, phis: Sequence[Any], tau: float,
                   update_u: Callable[[jax.Array, jax.Array, float],
                                      jax.Array],
                   use_scan: bool = True,
                   transform: Callable[[jax.Array], jax.Array] | None
                   = None,
                   ) -> tuple[jax.Array, jax.Array]:
    """Integrate the composite multi-timescale trajectory.

    QEX parity: molecularDynamics ``trajectory`` / staghmc_spv's
    MDevolve loop.  Static schedule; jit the caller.

    Compile-size control: the schedule is periodic with period
    tau / gcd(steps_i), so the trajectory runs as ONE macro period
    under ``lax.scan`` -- compile cost is 1/g of the unrolled graph.
    Kicks straddling a period boundary land at the same time and state
    in consecutive iterations, so repeating the full macro schedule is
    exact (forces at equal u are CSE'd by XLA).
    """
    import math
    from functools import reduce

    g = reduce(math.gcd, [t.steps for t in terms]) if use_scan else 1
    if g <= 1:
        schedule = build_schedule(terms, tau)
        return _apply_schedule(schedule, terms, u0, p0, phis, update_u,
                               transform)

    sub = [dataclasses.replace(t, steps=t.steps // g) for t in terms]
    schedule = build_schedule(sub, tau / g)

    def body(carry, _):
        u, p = carry
        u, p = _apply_schedule(schedule, sub, u, p, phis, update_u,
                               transform)
        return (u, p), None

    (u, p), _ = jax.lax.scan(body, (u0, p0), None, length=g)
    return u, p


# --- split-step trajectory (huge-volume compile control) --------------------
#
# At the largest volumes the whole-trajectory jit (even scan-compressed)
# can exceed the XLA compiler's own memory/time envelope: a 24^4
# nHYP-smeared 3-field trajectory graph OOM-killed the TPU compile
# helper.  The reference never meets this because it dispatches each MD
# kick eagerly (MDevolve calls V/T procs one at a time,
# staghmc_spv.nim:947).  This mode is the TPU analog: a PYTHON loop
# over the schedule calling a handful of small reusable jits -- one
# gauge update and one kick graph per kick *signature* (the set of
# terms kicked together), with the time-step coefficients passed as
# traced scalars so every kick time reuses the same executable.
# Dispatch costs ~ms/step; a smeared-force kick costs seconds -- noise.

def _kick_jit(terms, sig, update_u, transform):
    """Compiled momentum kick for the non-smeared part of signature
    ``sig`` = tuple of (term_index, is_force_gradient); coefficients
    arrive traced.  Smeared kicks are dispatched separately (see
    run_trajectory_split) so that no single program contains both the
    smear VJP and the solve chains."""

    rest = [(i, fg) for (i, fg) in sig
            if not (transform is not None and terms[i].smeared
                    and terms[i].chain_force is not None and not fg)]

    @jax.jit
    def kick(u, p, phis, cdts, fg_as):
        for j, (i, fg) in enumerate(sig):
            if (i, fg) not in rest:
                continue
            term = terms[i]
            if not fg:
                p = p - cdts[j] * term.force(u, phis[i])
            else:
                from ..hmc.integrators import fg_force
                p = p - cdts[j] * fg_force(
                    u, fg_as[j],
                    lambda uu: term.force(uu, phis[i]), update_u)
        return p

    return (kick if rest else None)


_SPLIT_JITS_MEMO: dict = {}


def _smeared_split_jits(terms, transform, transform_stages=None):
    """Memoized wrapper around :func:`_smeared_split_jits_build`.

    Re-dispatching a trajectory (or the split heatbath sharing the MD
    piece programs) must REUSE the already-compiled jits: rebuilding
    them produced fresh wrappers whose programs recompile and reload
    every call (measured 174/184 recompiles on trajectory 2 at 4^4,
    round 5) and doubled program residency between the heatbath and MD
    phases at 32^3x64.  Keyed on object identity; each entry keeps
    strong references to its key objects so ids cannot be recycled
    while the entry lives."""
    key = (id(terms), id(transform), id(transform_stages))
    hit = _SPLIT_JITS_MEMO.get(key)
    if hit is not None:
        return hit[0]
    out = _smeared_split_jits_build(terms, transform, transform_stages)
    if len(_SPLIT_JITS_MEMO) >= 16:
        _SPLIT_JITS_MEMO.pop(next(iter(_SPLIT_JITS_MEMO)))
    _SPLIT_JITS_MEMO[key] = (out, (terms, transform, transform_stages))
    return out


def _smeared_split_jits_build(terms, transform, transform_stages=None):
    """Jits for the smeared kick, split so each compiles alone:
    forward smear, one chain-force per term (contains the solves), an
    accumulating add, and the smear pullback (recomputes the forward
    inside the same program -- residuals cannot cross jit boundaries,
    and one extra smear is cheap next to the solves).

    With ``transform_stages`` (s1, s2, s3 with v = s3(u, s2(u, s1(u))),
    e.g. gauge.smear.nhyp_stages) the pullback is staged level by
    level: even the whole-smear forward+VJP program alone exceeds the
    XLA compiler's memory envelope at 24^4, while one level at a time
    compiles.  Intermediates cross jit boundaries as plain arrays."""
    from ..ops import group, linalg

    add = jax.jit(lambda a, b: a + b)

    def chain_i(i):
        @jax.jit
        def chain(v, phi, c):
            return c * terms[i].chain_force(v, phi)
        return chain

    chains = {i: chain_i(i) for i, t in enumerate(terms)
              if t.smeared and t.chain_force is not None}

    @jax.jit
    def finish_kick(u, p, gu):
        m = jax.vmap(lambda uu, gg: linalg.mul_na(uu, jnp.conj(gg)))(
            u, gu)
        return p + jax.vmap(group.tah)(m)

    if transform_stages is None:
        smear = jax.jit(transform)

        @jax.jit
        def _pullback_whole(u, p, chain):
            _, vjp = jax.vjp(transform, u)
            (gu,) = vjp(chain)
            return finish_kick(u, p, gu)

        def pullback_kick(u, p, chain, a1=None, a2=None):
            return _pullback_whole(u, p, chain)

        return smear, add, chains, pullback_kick, None

    split_proj = (len(transform_stages) in (2, 3)
                  and isinstance(transform_stages[0], tuple))
    stage_terms = None
    if split_proj:
        # ((p1, p2, p3), proj[, terms]): pre-projection stages + the
        # polar projection factored out + optional per-addend term
        # functions (gauge.smear.nhyp_stages_preproj / _stage_terms)
        if len(transform_stages) == 3:
            (p1, p2, p3), proj, stage_terms = transform_stages
        else:
            (p1, p2, p3), proj = transform_stages

        def _proj_stack(w):
            # plain inline stack: both lax.map (6.60 vs 6.13 GB) and
            # barrier-sequencing (6.26/10.10 vs 6.06/9.83 GB) measured
            # slightly WORSE on v5e at 24^4 (exp_nhyp_mem.py); the
            # staple-addend barriers inside pK (gauge.smear._bar) are
            # the ones that pay (L3 pre fwd 4.52 -> 3.49 GB)
            return jnp.stack([proj(w[j]) for j in range(w.shape[0])])

        s1 = lambda u: _proj_stack(p1(u))
        s2 = lambda u, a1: _proj_stack(p2(u, a1))
        s3 = lambda u, a2: _proj_stack(p3(u, a2))
    else:
        s1, s2, s3 = transform_stages
    j1, j2 = jax.jit(s1), jax.jit(s2)

    @jax.jit
    def j3(u, a2):
        return s3(u, a2)

    # Per-level pullbacks are further chunked over OUTPUT slices: the
    # stage outputs are independent given the inputs, so the total vjp
    # is the sum of per-slice vjps.  One full-level pullback program
    # peaked 15.9G HBM at 24^4 (186M over a v5e chip), and even the
    # direction-chunked FUSED piece (staple + Newton-Schulz projection
    # VJP in one program) sits exactly at the 15.75G capacity.  In
    # split_proj mode each chunk therefore runs as THREE separate jit
    # programs -- pre-projection forward, projection VJP, staple VJP --
    # none of which holds both backward chains at once.
    # donated slab add: x's buffer is reused for the output, so
    # accumulating N addends into a slab costs ZERO extra HBM (the
    # dense-stack .at[i].add accumulator measured a 2.14 GB temp per
    # call at 24^4 -- it copies the whole stack -- and would scale to
    # 13 GB at the north-star volume; exp_nhyp_mem.py)
    addslab = jax.jit(lambda x, y: x + y, donate_argnums=(0,))

    def _merge_slabs(dst, idx, slabs):
        for i, s in zip(idx, slabs):
            dst[i] = s if dst[i] is None else addslab(dst[i], s)

    def _pb_split(pre, nout, nchunks, u_only=False):
        """Pullback of proj(pre(...)) with the three parts in separate
        jit programs per chunk: pre-projection forward, projection VJP,
        pre VJP.  (Fused-chunk fallback for stages without per-addend
        terms; the production nHYP path uses :func:`_pb_terms`.)"""
        k = nout // nchunks

        def piece(c):
            lo = c * k
            if u_only:
                pre_c = jax.jit(lambda u: pre(u)[lo:lo + k])
            else:
                pre_c = jax.jit(lambda u, a: pre(u, a)[lo:lo + k])

            @jax.jit
            def projvjp(w, g_sl):
                _, vjp = jax.vjp(
                    lambda ww: jnp.stack([proj(ww[j])
                                          for j in range(k)]), w)
                return vjp(g_sl)[0]

            if u_only:
                @jax.jit
                def prevjp(u, gw):
                    _, vjp = jax.vjp(lambda uu: pre(uu)[lo:lo + k], u)
                    return vjp(gw)[0]
            else:
                @jax.jit
                def prevjp(u, a, gw):
                    _, vjp = jax.vjp(
                        lambda uu, aa: pre(uu, aa)[lo:lo + k], u, a)
                    return vjp(gw)
            return pre_c, projvjp, prevjp

        pieces = [piece(c) for c in range(nchunks)]

        if u_only:
            def run(u, g):
                gu = None
                for c, (pre_c, projvjp, prevjp) in enumerate(pieces):
                    w = pre_c(u)
                    gw = projvjp(w, g[c * k:(c + 1) * k])
                    gu_c = prevjp(u, gw)
                    gu = gu_c if gu is None else add(gu, gu_c)
                return gu
        else:
            def run(u, a, g):
                gu = ga = None
                for c, (pre_c, projvjp, prevjp) in enumerate(pieces):
                    w = pre_c(u, a)
                    gw = projvjp(w, g[c * k:(c + 1) * k])
                    gu_c, ga_c = prevjp(u, a, gw)
                    gu = gu_c if gu is None else add(gu, gu_c)
                    ga = ga_c if ga is None else add(ga, ga_c)
                return gu, ga
        return run

    def _pb_terms(pre, nout, terms, u_only=False, g_list=False,
                  pre_piece=None, projvjp1=None, slab_of=None):
        """Slab-list pullback of proj(pre(...)): one output per chunk,
        pre VJP split per ADDEND (smear.StageTerm), every gradient a
        LIST of (3, 3, *dims) slabs.  Each addend jit receives the
        full (shared, already-live) u/a buffers but slices out ONLY
        the slabs it reads and returns ONLY their gradients; slabs
        accumulate with the zero-copy donated add.  No dense gradient
        stack is ever materialized between levels -- a dense per-addend
        (gu, ga) out alone is 1.9 GB at 24^4 c64 and 12 GB at the
        north-star volume, and the fused per-direction level-3 piece
        peaks 15.3-16.9 GB = OOM on v5e (exp_nhyp_mem.py; the round-3
        CONFIG4 failure).

        ``g_list``: the incoming cotangent is itself a slab list from
        the level above (levels 1/2); level 3's cotangent is the dense
        4-stack chain.

        Compile-count discipline (the CONFIG4 cold-start lever): the
        projection VJP is c-independent, so all outputs of all levels
        share ONE ``projvjp1`` program; the dense level-3 cotangent is
        sliced by ONE traced-index ``slab_of`` program; and the
        pre-projection forward of each output comes from the SAME
        per-output jit the split forward path uses (``pre_piece``)
        instead of a per-output DCE slice of the whole level."""
        def piece(c):
            if pre_piece is not None:
                pre_c = pre_piece(c)
            elif u_only:
                pre_c = jax.jit(lambda u: pre(u)[c])
            else:
                pre_c = jax.jit(lambda u, a: pre(u, a)[c])

            def term_vjp(t):
                if u_only:
                    @jax.jit
                    def pv(u, gw1):
                        us = tuple(u[i] for i in t.u_idx)
                        _, vjp = jax.vjp(lambda uss: t.fn(uss, ()), us)
                        return vjp(gw1)[0]
                else:
                    @jax.jit
                    def pv(u, a, gw1):
                        us = tuple(u[i] for i in t.u_idx)
                        als = tuple(a[i] for i in t.a_idx)
                        _, vjp = jax.vjp(t.fn, us, als)
                        return vjp(gw1)
                return pv, t.u_idx, t.a_idx

            return pre_c, [term_vjp(t) for t in terms[c]]

        pieces = [piece(c) for c in range(nout)]
        na = 12  # level input stacks are 12 fields
        zslab = jax.jit(lambda u: jnp.zeros_like(u[0]))
        if projvjp1 is None:
            projvjp1 = jax.jit(
                lambda w, g: jax.vjp(proj, w)[1](g)[0])
        if slab_of is None:
            slab_of = jax.jit(
                lambda g, c: jax.lax.dynamic_slice_in_dim(
                    g, c, 1, 0)[0])

        def cot(g, c, u):
            if not g_list:
                # ONE traced-index slicer serves every dense-cotangent
                # output (c is runtime data, not a compile constant)
                return slab_of(g, c)
            return g[c] if g[c] is not None else zslab(u)

        # per-piece dispatch throttle at big volumes: each addend VJP
        # returns ~0.56 GiB of gradient slabs ALLOCATED AT DISPATCH,
        # and one level's unthrottled run loop queues ~28 programs
        # (~11 GiB of pending outputs at 32^3x64) -- see
        # dispatch_throttle
        if u_only:
            def run(u, g):
                big = _big_volume(u)
                gu = [None] * u.shape[0]
                for c, (pre_c, pvs) in enumerate(pieces):
                    w = pre_c(u)
                    gw = projvjp1(w, cot(g, c, u))
                    for pv, u_idx, _a_idx in pvs:
                        _merge_slabs(gu, u_idx, pv(u, gw))
                    if big:
                        dispatch_throttle(
                            [s for s in gu if s is not None])
                return gu
        else:
            def run(u, a, g):
                big = _big_volume(u)
                gu = [None] * u.shape[0]
                ga = [None] * na
                for c, (pre_c, pvs) in enumerate(pieces):
                    w = pre_c(u, a)
                    gw = projvjp1(w, cot(g, c, u))
                    for pv, u_idx, a_idx in pvs:
                        gus, gals = pv(u, a, gw)
                        _merge_slabs(gu, u_idx, gus)
                        _merge_slabs(ga, a_idx, gals)
                    if big:
                        dispatch_throttle(
                            [s for s in gu if s is not None]
                            + [s for s in ga if s is not None])
                return gu, ga
        return run

    def _pb_chunked(f, nout, nchunks):
        k = nout // nchunks

        def piece(c):
            @jax.jit
            def pb(u, a, g_sl):
                _, vjp = jax.vjp(
                    lambda uu, aa: f(uu, aa)[c * k:(c + 1) * k], u, a)
                return vjp(g_sl)
            return pb

        pieces = [piece(c) for c in range(nchunks)]

        def run(u, a, g):
            gu = ga = None
            for c, pb in enumerate(pieces):
                gu_c, ga_c = pb(u, a, g[c * k:(c + 1) * k])
                gu = gu_c if gu is None else add(gu, gu_c)
                ga = ga_c if ga is None else add(ga, ga_c)
            return gu, ga

        return run

    terms_mode = False
    if split_proj and stage_terms is not None:
        # production nHYP path: per-addend slab-list pullbacks at ALL
        # three levels.  (Round 2 kept level 3 as fused per-direction
        # pieces "at exactly the 15.75G capacity" -- re-measured at
        # 15.3-16.9 GB at 24^4 c64 on v5e = the CONFIG4 OOM; the
        # per-addend pieces are 2.8 GB each.)
        t1s, t2s, t3s = stage_terms

        # Shared programs across ALL levels/outputs (compile-count
        # lever: the split dispatcher's cold start is serialized
        # remote compiles; one projection VJP + one traced-index
        # cotangent slicer + one projection forward replace 28+28
        # per-output clones at 24^4)
        _projvjp1 = jax.jit(lambda w, g: jax.vjp(proj, w)[1](g)[0])
        _slab_of = jax.jit(lambda g, c: jax.lax.dynamic_slice_in_dim(
            g, c, 1, 0)[0])
        _projj1 = jax.jit(proj)

        _pre_cache: dict = {}

        def _pre_piece(level, o):
            """Per-(level, output) PRE-projection forward from the
            addend terms -- ONE program reused by both the split
            forward path and the pullback's w recomputation."""
            if (level, o) in _pre_cache:
                return _pre_cache[(level, o)]
            tl = (t1s, t2s, t3s)[level][o]
            if level == 0:
                @jax.jit
                def f(u):
                    acc = None
                    for t in tl:
                        us = tuple(u[i] for i in t.u_idx)
                        x = t.fn(us, ())
                        acc = x if acc is None else \
                            jax.lax.optimization_barrier(acc + x)
                    return acc
            else:
                @jax.jit
                def f(u, a):
                    acc = None
                    for t in tl:
                        us = tuple(u[i] for i in t.u_idx)
                        als = tuple(a[i] for i in t.a_idx)
                        x = t.fn(us, als)
                        acc = x if acc is None else \
                            jax.lax.optimization_barrier(acc + x)
                    return acc
            _pre_cache[(level, o)] = f
            return f

        pb3 = _pb_terms(p3, 4, t3s,
                        pre_piece=lambda c: _pre_piece(2, c),
                        projvjp1=_projvjp1, slab_of=_slab_of)
        pb2 = _pb_terms(p2, 12, t2s, g_list=True,
                        pre_piece=lambda c: _pre_piece(1, c),
                        projvjp1=_projvjp1, slab_of=_slab_of)
        pb1 = _pb_terms(p1, 12, t1s, u_only=True, g_list=True,
                        pre_piece=lambda c: _pre_piece(0, c),
                        projvjp1=_projvjp1, slab_of=_slab_of)
        terms_mode = True

        # Slab-list FORWARDS for huge volumes: the whole-level forward
        # jits peak 6.1/9.8/6.3 GB at 24^4 c64 (exp_nhyp_mem.py) --
        # at the north-star 32^3x64 (6.3x sites) level 2 alone would
        # exceed the chip.  One output per jit program (same donated
        # slab-list discipline as the pullback), stacked by a single
        # donated jit; gated on volume so smaller runs keep the 3-
        # program compile count.
        def _fwd_piece(level, o):
            # SAME per-output program as the pullback's w recomputation
            # (_pre_piece) + the one shared projection program: the
            # split forward adds ZERO extra compiles beyond the
            # pullback's set
            f = _pre_piece(level, o)
            return lambda *args: _projj1(f(*args))

        def _fwd_split(u):
            import numpy as _np
            return (int(_np.prod(u.shape[3:]))
                    >= FWD_SPLIT_MIN_SITES)
    elif split_proj:
        pb3 = _pb_split(p3, 4, 4)
        pb2 = _pb_split(p2, 12, 12)
        pb1 = _pb_split(p1, 12, 12, u_only=True)
    else:
        pb3 = _pb_chunked(s3, 4, 4)
        pb2 = _pb_chunked(s2, 12, 4)

        @jax.jit
        def pb1(u, g):
            _, vjp = jax.vjp(s1, u)
            return vjp(g)[0]  # gu1

    if terms_mode:
        _j1, _j2, _j3 = j1, j2, j3

        # Slab TUPLES, not a stacked array: jnp.stack cannot alias its
        # inputs into the contiguous output (the donate_argnums were
        # "not usable"), so stacking paid a full-level copy (1.8 GB at
        # 32^3x64) at EVERY stage boundary.  Downstream consumers
        # (stage pieces, pullback pieces, j3) only ever index a[i] at
        # trace time, which works identically on a tuple.
        def j1(u):
            if not _fwd_split(u):
                return _j1(u)
            return tuple(_fwd_piece(0, o)(u)
                         for o in range(len(t1s)))

        def j2(u, a1):
            if not _fwd_split(u):
                return _j2(u, a1)
            return tuple(_fwd_piece(1, o)(u, a1)
                         for o in range(len(t2s)))

        _stack4 = jax.jit(lambda *xs: jnp.stack(xs))

        def j3(u, a2):
            # level 3's output IS the smeared link field -- consumers
            # (chain forces, heatbaths, action terms) need the dense
            # (nd, nc, nc, *dims) array, so stack the 4 slabs (604 MB
            # copy at 32^3x64, vs 1.8 GB per level-1/2 stack avoided)
            if not _fwd_split(u):
                return _j3(u, a2)
            return _stack4(*[_fwd_piece(2, o)(u, a2)
                             for o in range(len(t3s))])

    def smear(u):
        return j3(u, j2(u, j1(u)))

    @jax.jit
    def finish_kick_slabs(u, p, gu_slabs):
        gu = jnp.stack(gu_slabs)
        m = jax.vmap(lambda uu, gg: linalg.mul_na(uu, jnp.conj(gg)))(
            u, gu)
        return p + jax.vmap(group.tah)(m)

    def pullback_kick(u, p, chain, a1=None, a2=None):
        # a1/a2 may be threaded from the kick's forward smear (the
        # same-time chain evaluation) to skip recomputing j1/j2 here;
        # at big volumes the caller frees them instead (holding both
        # through the chain solves breaks the HBM budget) and they
        # are recomputed here, throttled per stage
        big = _big_volume(u)
        if a1 is None:
            a1 = j1(u)
            if big:
                dispatch_throttle(a1)
        if a2 is None:
            a2 = j2(u, a1)
            if big:
                dispatch_throttle(a2)
        if terms_mode:
            if big:
                # hold only the level each pb consumes: a1 is cheap
                # to recompute (12 small programs) and 1.7 GiB to hold
                a1 = None
            gu, ga2 = pb3(u, a2, chain)
            if big:
                dispatch_throttle([g for g in ga2 if g is not None])
            a2 = chain = None
            if a1 is None:
                a1 = j1(u)
                if big:
                    dispatch_throttle(a1)
            gu2, ga1 = pb2(u, a1, ga2)
            if big:
                dispatch_throttle([g for g in ga1 if g is not None])
            a1 = ga2 = None
            gu1 = pb1(u, ga1)
            for lst in (gu2, gu1):
                idx = [i for i, s in enumerate(lst) if s is not None]
                _merge_slabs(gu, idx, [lst[i] for i in idx])
            return finish_kick_slabs(u, p, gu)
        gu3, ga2 = pb3(u, a2, chain)
        gu2, ga1 = pb2(u, a1, ga2)
        gu1 = pb1(u, ga1)
        return finish_kick(u, p, add(add(gu3, gu2), gu1))

    return smear, add, chains, pullback_kick, (j1, j2, j3)


_throttle_fetch = None


def dispatch_throttle(x) -> None:
    """Drain the dispatch queue by fetching one real scalar from ``x``.

    On the axon tunnel execution is asynchronous but program OUTPUT
    buffers are allocated synchronously at dispatch: an unthrottled
    Python loop of large-volume piece programs pre-allocates every
    enqueued program's outputs on top of the currently-executing
    program's temp arena, and the 32^3x64 split trajectory
    RESOURCE_EXHAUSTED s even though each piece fits alone (round-5
    capacity probes: ~14 GiB usable, piece peak 8.3 GiB, queued
    outputs several GiB).  One fetch per phase (~20-40 ms) bounds the
    queue at one phase's outputs.  Accepts any pytree; fetches from
    its first array leaf."""
    global _throttle_fetch
    if _throttle_fetch is None:
        _throttle_fetch = jax.jit(
            lambda a: jnp.real(jnp.ravel(a)[0]).astype(jnp.float32))
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(_throttle_fetch(leaves[0]))


def _big_volume(u) -> bool:
    import numpy as _np
    return int(_np.prod(u.shape[3:])) >= FWD_SPLIT_MIN_SITES


_TRAJ_JITS_MEMO: dict = {}


def _traj_jits(terms, update_u):
    """Memoized (upd, kick_fns) for :func:`run_trajectory_split` --
    the kick programs hold the MD force solves; rebuilding them per
    trajectory recompiled every one (see :func:`_smeared_split_jits`)."""
    key = (id(terms), id(update_u))
    hit = _TRAJ_JITS_MEMO.get(key)
    if hit is not None:
        return hit[0]
    upd = jax.jit(lambda u, p, dt: update_u(u, p, dt))
    out = (upd, {})
    if len(_TRAJ_JITS_MEMO) >= 16:
        _TRAJ_JITS_MEMO.pop(next(iter(_TRAJ_JITS_MEMO)))
    _TRAJ_JITS_MEMO[key] = (out, (terms, update_u))
    return out


def run_trajectory_split(terms: Sequence[ActionTerm], u0: jax.Array,
                         p0: jax.Array, phis: Sequence[Any], tau: float,
                         update_u, transform=None, transform_stages=None,
                         prof=None) -> tuple[jax.Array, jax.Array]:
    """Same math as :func:`run_trajectory`, dispatched as a Python loop
    of small jits (see comment above).  NOT jit-able itself.

    ``prof``: optional qex_tpu.utils.profile.Profiler — records a
    per-phase timer tree (update_u / smear / chain+pullback / per-term
    kicks) with a device sync per phase, the QEX profile.nim tic/toc
    role (profile.nim:411-554 consumed at staghmc_spv.nim:356-365).
    Leave None for production speed (each sync is a host round-trip).
    """
    schedule = build_schedule(terms, tau)
    rdt = jnp.finfo(u0.dtype).dtype  # match scan-path precision
    upd, kick_fns = _traj_jits(terms, update_u)
    smear = add = chains = pullback = stages = None
    if transform is not None:
        smear, add, chains, pullback, stages = _smeared_split_jits(
            terms, transform, transform_stages)

    if prof is None:
        import contextlib

        def ptimer(name, sync=None):
            return contextlib.nullcontext()
    else:
        def ptimer(name, sync=None):
            return prof.timer(name, sync=sync)

    big = _big_volume(u0)
    u, p = u0, p0
    for dt, kicks in schedule:
        if dt > _EPS:
            with ptimer("update_u"):
                u = upd(u, p, jnp.asarray(dt, rdt))
                if prof is not None:
                    _psync(u)
                elif big:
                    dispatch_throttle(u)
        if not kicks:
            continue
        shared = [(i, c) for (i, c, x) in kicks
                  if chains is not None and i in chains and x == 0.0]
        # chain-graph A/B: QEX_NO_CHAIN_SHARE=1 runs one smear
        # pullback PER chain instead of summing same-time chains into
        # one pullback (the production convention).  Checked at call
        # time -- no new programs, the pullback jits are identical.
        no_share = bool(os.environ.get("QEX_NO_CHAIN_SHARE"))
        if shared and no_share:
            with ptimer("smear_fwd"):
                if stages is not None:
                    j1, j2, j3 = stages
                    a1 = j1(u)
                    if big:
                        dispatch_throttle(a1)
                    a2 = j2(u, a1)
                    if big:
                        dispatch_throttle(a2)
                        a1 = None
                    v = j3(u, a2)
                    if big:
                        dispatch_throttle(v)
                        a2 = None
                else:
                    a1 = a2 = None
                    v = smear(u)
                if prof is not None:
                    _psync(v)
                elif big:
                    dispatch_throttle(v)
            for (i, c) in shared:
                with ptimer(f"chain:{terms[i].name}"):
                    ci = chains[i](v, phis[i], jnp.asarray(c, rdt))
                    if prof is not None:
                        _psync(ci)
                with ptimer("smear_pullback"):
                    p = pullback(u, p, ci, a1, a2)
                    if prof is not None:
                        _psync(p)
                    elif big:
                        dispatch_throttle(p)
        elif shared:
            with ptimer("smear_fwd"):
                if stages is not None:
                    # staged forward: keep a1/a2 for the pullback
                    # (skips recomputing the first two smear levels
                    # per kick) -- EXCEPT at big volumes, where
                    # holding both level stacks (3.4 GiB at 32^3x64)
                    # through the 5.6 GiB-temp chain-force solves
                    # breaks the ~14 GiB budget: free them and let
                    # pullback_kick recompute (one extra L1+L2
                    # forward per shared pullback)
                    j1, j2, j3 = stages
                    a1 = j1(u)
                    if big:
                        dispatch_throttle(a1)
                    a2 = j2(u, a1)
                    if big:
                        dispatch_throttle(a2)
                        a1 = None
                    v = j3(u, a2)
                    if big:
                        dispatch_throttle(v)
                        a2 = None
                else:
                    a1 = a2 = None
                    v = smear(u)
                if prof is not None:
                    _psync(v)
                elif big:
                    dispatch_throttle(v)
            total = None
            for (i, c) in shared:
                with ptimer(f"chain:{terms[i].name}"):
                    ci = chains[i](v, phis[i], jnp.asarray(c, rdt))
                    if prof is not None:
                        _psync(ci)
                    elif big:
                        dispatch_throttle(ci)
                total = ci if total is None else add(total, ci)
            if big:
                v = ci = None  # dead before the pullback's recomputes
            with ptimer("smear_pullback"):
                p = pullback(u, p, total, a1, a2)
                total = None
                if prof is not None:
                    _psync(p)
                elif big:
                    dispatch_throttle(p)
        sig = tuple((i, x != 0.0) for (i, c, x) in kicks)
        if sig not in kick_fns:
            kick_fns[sig] = _kick_jit(terms, sig, update_u, transform)
        if kick_fns[sig] is not None:
            cdts = jnp.asarray([c for (_i, c, _x) in kicks], rdt)
            xis = jnp.asarray([x for (_i, _c, x) in kicks], rdt)
            kname = "kick:" + "+".join(terms[i].name for (i, _) in sig)
            with ptimer(kname):
                p = kick_fns[sig](u, p, phis, cdts, xis)
                if prof is not None:
                    _psync(p)
                elif big:
                    dispatch_throttle(p)
    return u, p


def _psync(x) -> None:
    from ..utils.profile import _device_sync
    _device_sync(x)
