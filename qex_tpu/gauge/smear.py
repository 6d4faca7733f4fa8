"""Differentiable link smearing: nHYP and stout.

TPU-native replacement for QEX's src/gauge/hypsmear.nim (3-level nHYP
with U-projection, ``smear`` :260-274 and the hand-built force closure
:49-251) and src/gauge/stoutsmear.nim (stout, its exact inverse :36,
force ``smearDeriv`` :148).

Design stance (SURVEY.md §7): smearing is an ordinary differentiable
function of the gauge field.  HMC forces are obtained with ``jax.grad``
through ``action(smear(u))`` -- the chain rule through the 3 nHYP levels
and the polar projection (QEX's hardest hand-derived code,
``projectUDeriv``/``diffProjectTAH``) is automatic, with
:func:`qex_tpu.ops.linalg.project_u` built from differentiable
Newton-Schulz iterations.

Level structure and conventions follow hypsmear.nim:44-46 exactly
(QEX's alpha1 is the INNERMOST level; the common BSM choice is
alpha = (0.4, 0.5, 0.5), staghmc_sh.nim:188):

    L1[mu][nu]  = P((1-a1) U[mu] + (a1/2)   SS_nu(U, U[mu]))
    L2[mu][nu]  = P((1-a2) U[mu] + (a2/4)   sum_{a,b comp} SS_a(L1[a][b], L1[mu][b]))
    V[mu]       = P((1-a3) U[mu] + (a3/6)   sum_{nu!=mu} SS_nu(L2[nu][mu], L2[mu][nu]))

where SS_nu(A, B) is the symmetric (forward+backward) staple of middle
link B (direction mu) with side links A (direction nu), and P is the
polar projection X (X^dag X)^{-1/2} onto U(3).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import group, linalg
from ..ops.shifts import shift


def sym_staple_half(side: jax.Array, mid: jax.Array, nu: int, mu: int,
                    nd: int, half: int) -> jax.Array:
    """One orientation of :func:`sym_staple` (half=0 fwd, half=1 bwd);
    sym_staple == sum of the two.  Exists so huge-volume pullbacks can
    VJP one half-staple per jit program (mcmc/md split pullback)."""
    s1 = shift(side, mu, +1, nd)
    if half == 0:
        s2 = shift(mid, nu, +1, nd)
        return linalg.mul_na(linalg.mul(side, s2), s1)
    t = linalg.mul(linalg.mul_an(side, mid), s1)
    return shift(t, nu, -1, nd)


def sym_staple(side: jax.Array, mid: jax.Array, nu: int, mu: int,
               nd: int) -> jax.Array:
    """Symmetric staple of ``mid`` (a direction-mu link field) with side
    links ``side`` (a direction-nu link field):

        S(x) = side(x) mid(x+nu) side(x+mu)^dag
             + side(x-nu)^dag mid(x-nu) side(x-nu+mu)

    QEX parity: ``symStaple`` (src/gauge/smearutil.nim:3-21).
    """
    s1 = shift(side, mu, +1, nd)          # side(x+mu)
    s2 = shift(mid, nu, +1, nd)           # mid(x+nu)
    fwd = linalg.mul_na(linalg.mul(side, s2), s1)
    t = linalg.mul(linalg.mul_an(side, mid), s1)
    bwd = shift(t, nu, -1, nd)
    return fwd + bwd


@dataclasses.dataclass(frozen=True)
class HypCoefs:
    """nHYP coefficients; QEX ``HypCoefs`` (hypsmear.nim:16-19).
    alpha1 is the innermost level, matching QEX's convention
    (the 'standard BSM' choice is (0.4, 0.5, 0.5))."""

    alpha1: float = 0.4
    alpha2: float = 0.5
    alpha3: float = 0.5


_HYP_PAIRS = [(mu, nu) for mu in range(4) for nu in range(4) if nu != mu]
_HYP_IDX = {p: i for i, p in enumerate(_HYP_PAIRS)}


def nhyp_stages(c: HypCoefs, lat: Lattice, proj_iters: int = 14):
    """The 3 nHYP levels as separately-callable stages:
    ``v = s3(u, s2(u, s1(u)))`` with stacked-array intermediates
    (12 link fields per level, _HYP_PAIRS order).

    Exists so huge-volume runs can jit (and VJP) one level at a time --
    the whole-smear pullback program exceeds the XLA compiler's memory
    envelope at 24^4 (see mcmc/md.run_trajectory_split)."""
    nd = lat.nd
    if nd != 4:
        raise ValueError("nHYP smearing requires nd=4")
    # checkpoint: the projection's Newton-Schulz iterates are the
    # dominant VJP residuals (14 iterations x 12 fields/level); storing
    # only the projection INPUT and recomputing in the backward pass
    # keeps the per-level pullback inside one chip's HBM at 24^4
    proj = jax.checkpoint(partial(linalg.project_u, iters=proj_iters))

    def s1(u):
        # level 1: L1[mu][nu] -- staple only in direction nu
        out = []
        for mu, nu in _HYP_PAIRS:
            x = ((1.0 - c.alpha1) * u[mu]
                 + 0.5 * c.alpha1 * sym_staple(u[nu], u[mu], nu, mu, nd))
            out.append(proj(x))
        return jnp.stack(out)

    def s2(u, l1):
        # level 2: staples in the two directions {a, b} complementing
        # {mu, nu}; side links are level-1 fields decorated with the
        # other complement direction.
        out = []
        for mu, nu in _HYP_PAIRS:
            comp = [d for d in range(nd) if d not in (mu, nu)]
            acc = (1.0 - c.alpha2) * u[mu]
            for a in comp:
                b = comp[0] if comp[1] == a else comp[1]
                acc = acc + 0.25 * c.alpha2 * sym_staple(
                    l1[_HYP_IDX[(a, b)]], l1[_HYP_IDX[(mu, b)]], a, mu,
                    nd)
            out.append(proj(acc))
        return jnp.stack(out)

    def s3(u, l2):
        # level 3: staples in all nu != mu with level-2 side links
        out = []
        for mu in range(nd):
            acc = (1.0 - c.alpha3) * u[mu]
            for nu in range(nd):
                if nu == mu:
                    continue
                acc = acc + (c.alpha3 / 6.0) * sym_staple(
                    l2[_HYP_IDX[(nu, mu)]], l2[_HYP_IDX[(mu, nu)]], nu,
                    mu, nd)
            out.append(proj(acc))
        return jnp.stack(out)

    return s1, s2, s3


def _bar(x: jax.Array) -> jax.Array:
    """Scheduling barrier: forces XLA to finish computing ``x`` before
    any later addend's temporaries are allocated.  Without it the
    compiler materializes ALL staple addends of a level concurrently
    (one direction's staples alone peak 2.5 GB temp at 24^4 c64 on
    v5e, exp_nhyp_mem.py); value- and gradient-neutral."""
    return jax.lax.optimization_barrier(x)


def nhyp_stages_preproj(c: HypCoefs, lat: Lattice,
                        proj_iters: int = 14):
    """The 3 nHYP levels with the U-projection factored OUT:
    returns ((p1, p2, p3), proj) with

        v = proj*(p3(u, proj*(p2(u, proj*(p1(u))))))

    where ``pk`` produce the stacked PRE-projection matrices and
    ``proj`` is the (uncheckpointed) differentiable polar projection
    applied per stacked slice.  Exists so the huge-volume split
    pullback can put the staple VJP and the Newton-Schulz projection
    VJP of each chunk in SEPARATE jit programs -- the fused
    per-direction level-3 pullback piece peaks ~15.9 GB HBM at 24^4,
    right at the v5e capacity (mcmc/md._smeared_split_jits).
    Addends and outputs are sequenced with optimization barriers
    (:func:`_bar`) to bound the transient working set."""
    nd = lat.nd
    if nd != 4:
        raise ValueError("nHYP smearing requires nd=4")
    proj = partial(linalg.project_u, iters=proj_iters)

    def p1(u):
        out = []
        for mu, nu in _HYP_PAIRS:
            out.append(_bar((1.0 - c.alpha1) * u[mu]
                            + 0.5 * c.alpha1
                            * sym_staple(u[nu], u[mu], nu, mu, nd)))
        return jnp.stack(out)

    def p2(u, l1):
        out = []
        for mu, nu in _HYP_PAIRS:
            comp = [d for d in range(nd) if d not in (mu, nu)]
            acc = (1.0 - c.alpha2) * u[mu]
            for a in comp:
                b = comp[0] if comp[1] == a else comp[1]
                acc = _bar(acc + 0.25 * c.alpha2 * sym_staple(
                    l1[_HYP_IDX[(a, b)]], l1[_HYP_IDX[(mu, b)]], a, mu,
                    nd))
            out.append(acc)
        return jnp.stack(out)

    def p3(u, l2):
        out = []
        for mu in range(nd):
            acc = (1.0 - c.alpha3) * u[mu]
            for nu in range(nd):
                if nu == mu:
                    continue
                acc = _bar(acc + (c.alpha3 / 6.0) * sym_staple(
                    l2[_HYP_IDX[(nu, mu)]], l2[_HYP_IDX[(mu, nu)]], nu,
                    mu, nd))
            out.append(acc)
        return jnp.stack(out)

    return (p1, p2, p3), proj


@dataclasses.dataclass(frozen=True)
class StageTerm:
    """One addend of a pre-projection stage output, declared with the
    EXACT input slabs it reads (``u_idx`` into the gauge stack,
    ``a_idx`` into the level's 12-field input stack) so huge-volume
    pullbacks can slice out only those slabs and get back only their
    gradients -- a dense per-addend (gu, ga) pair alone is 1.9 GB at
    24^4 c64 (exp_nhyp_mem.py), and the north-star volume is 6.3x
    that.  ``fn(us, als)`` takes tuples of (3, 3, *dims) slabs."""

    fn: object
    u_idx: tuple = ()
    a_idx: tuple = ()


def nhyp_stage_terms(c: HypCoefs, lat: Lattice):
    """Per-(output, addend) :class:`StageTerm` lists of the
    pre-projection stages:
    ``sum(t.fn(u-slabs, a-slabs) for t in termsK[out]) == pK(u[, a])[out]``.
    Granularity: base link + each half-staple separately, so the
    huge-volume split pullback can VJP one addend per jit program
    (a whole level-2 output's staple VJP peaked 17 GB HBM at 24^4 in
    loop-linalg mode; einsum mode is 5x worse)."""
    nd = lat.nd

    def t1(out):
        mu, nu = _HYP_PAIRS[out]
        terms = [StageTerm(lambda us, als: (1.0 - c.alpha1) * us[0],
                           (mu,), ())]
        for h in (0, 1):
            terms.append(StageTerm(
                lambda us, als, h=h: 0.5 * c.alpha1
                * sym_staple_half(us[0], us[1], nu, mu, nd, h),
                (nu, mu), ()))
        return terms

    def t2(out):
        mu, nu = _HYP_PAIRS[out]
        comp = [d for d in range(nd) if d not in (mu, nu)]
        terms = [StageTerm(lambda us, als: (1.0 - c.alpha2) * us[0],
                           (mu,), ())]
        for a in comp:
            b = comp[0] if comp[1] == a else comp[1]
            for h in (0, 1):
                terms.append(StageTerm(
                    lambda us, als, a=a, h=h: 0.25 * c.alpha2
                    * sym_staple_half(als[0], als[1], a, mu, nd, h),
                    (), (_HYP_IDX[(a, b)], _HYP_IDX[(mu, b)])))
        return terms

    def t3(out):
        mu = out
        terms = [StageTerm(lambda us, als: (1.0 - c.alpha3) * us[0],
                           (mu,), ())]
        for nu in range(nd):
            if nu == mu:
                continue
            for h in (0, 1):
                terms.append(StageTerm(
                    lambda us, als, nu=nu, h=h: (c.alpha3 / 6.0)
                    * sym_staple_half(als[0], als[1], nu, mu, nd, h),
                    (), (_HYP_IDX[(nu, mu)], _HYP_IDX[(mu, nu)])))
        return terms

    return ([t1(o) for o in range(12)],
            [t2(o) for o in range(12)],
            [t3(o) for o in range(4)])


def nhyp_smear(c: HypCoefs, lat: Lattice, u: jax.Array,
               proj_iters: int = 14) -> jax.Array:
    """3-level nHYP smearing (hypsmear.nim:44-46, smear :260-274).

    Fully differentiable; returns the smeared links V with the same
    shape as ``u``.
    """
    s1, s2, s3 = nhyp_stages(c, lat, proj_iters)
    return s3(u, s2(u, s1(u)))


def smeared_force(c: HypCoefs, lat: Lattice, u: jax.Array, chain: jax.Array
                  ) -> jax.Array:
    """Backpropagate a chain dS/dV (complex gradient in JAX's
    ``dS = Re tr(G^T dV)`` convention) through the smearing to dS/dU.

    QEX parity: the ``smearedForce`` closure returned by
    ``smearGetForce`` (hypsmear.nim:49-251) -- here one ``jax.vjp``.
    """
    _, vjp = jax.vjp(lambda uu: nhyp_smear(c, lat, uu), u)
    (g,) = vjp(chain)
    return g


# --- stout ------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class StoutCoefs:
    """Isotropic stout parameter rho (stoutsmear.nim)."""

    rho: float = 0.1


def stout_smear(c: StoutCoefs, lat: Lattice, u: jax.Array) -> jax.Array:
    """One stout step: U' = exp(projTAH(C U^dag)) U with
    C_mu = rho * sum_{nu != mu} SS_nu(U, U_mu)  (Morningstar & Peardon,
    hep-lat/0311018; QEX stoutsmear.nim smear).
    """
    nd = lat.nd
    out = []
    for mu in range(nd):
        cmu = 0.0
        for nu in range(nd):
            if nu == mu:
                continue
            cmu = cmu + sym_staple(u[nu], u[mu], nu, mu, nd)
        omega = linalg.mul_na(c.rho * cmu, u[mu])
        z = group.tah(omega)
        out.append(linalg.mul(linalg.expm(z), u[mu]))
    return jnp.stack(out)


def stout_smear_inv(c: StoutCoefs, lat: Lattice, v: jax.Array,
                    iters: int = 40) -> jax.Array:
    """Exact inverse of one stout step by fixed-point iteration:
    U_{k+1} = exp(-Z(U_k)) V, U_0 = V.

    QEX parity: stoutsmear.nim:36 (basis of field-transformation HMC,
    src/nhmc/).  Converges geometrically for rho within the smoothing
    regime.
    """
    nd = lat.nd

    def z_of(u):
        zs = []
        for mu in range(nd):
            cmu = 0.0
            for nu in range(nd):
                if nu == mu:
                    continue
                cmu = cmu + sym_staple(u[nu], u[mu], nu, mu, nd)
            omega = linalg.mul_na(c.rho * cmu, u[mu])
            zs.append(group.tah(omega))
        return jnp.stack(zs)

    def body(i, u):
        z = z_of(u)
        ez = jax.vmap(linalg.expm)(-z)
        return jnp.einsum("dab...,dbc...->dac...", ez, v)

    return jax.lax.fori_loop(0, iters, body, v)
