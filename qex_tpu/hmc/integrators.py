"""Symplectic molecular-dynamics integrators.

TPU-native replacement for QEX's src/algorithms/integrator.nim (the
string -> integrator factory over the external MDevolve package,
:7-60).  The same integrator names and default parameters are accepted
(integrator.nim's help text lists the defaults; coefficients originate
in Omelyan, Mryglod & Folk, Comput. Phys. Commun. 151 (2003) 272, and
Chin, Phys. Lett. A 226 (1997) 344 for force-gradient).

Representation: an :class:`Integrator` is a palindromic sequence of
(kind, *coeffs) steps for ONE MD unit step, kinds:

    ("T", c):      U <- exp(c*dt*p) U            (gauge update, "mdt")
    ("V", c):      p <- p - c*dt*F(U)            (momentum update, "mdv")
    ("FG", c, xi): force-gradient momentum update, approximated by the
                   shifted-force trick (Yin & Mawhinney,
                   arXiv:1111.5059): F evaluated at
                   U' = exp(-(2 xi/c) * dt^2 * F(U)) U.

``integrate`` runs the trajectory as head + (lax.fori_loop over the
boundary-merged body) + tail -- a fully static schedule under jit
(SURVEY.md §7 hard part 4), with one force eval saved per step for
palindromic schemes exactly like MDevolve's shared-update optimization.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax


@dataclasses.dataclass(frozen=True)
class Integrator:
    """A one-MD-step scheme; T coeffs sum to 1, V coeffs sum to 1."""

    name: str
    steps: tuple


def _lf() -> Integrator:
    return Integrator("LF", (("V", 0.5), ("T", 1.0), ("V", 0.5)))


def _2mn(lam: float = 0.1931833275037836) -> Integrator:
    """Omelyan 2nd-order minimum norm (QEX default '2MN,0.19318...')."""
    return Integrator("2MN", (
        ("V", lam), ("T", 0.5), ("V", 1.0 - 2.0 * lam), ("T", 0.5),
        ("V", lam)))


def _4mn5fv(rho: float = 0.2539785108410595,
            mu: float = -0.03230286765269967,
            theta: float = 0.08398315262876693,
            lam: float = 0.6822365335719091) -> Integrator:
    """OMF 4th-order 5-force velocity version.  Defaults match QEX
    '4MN5FV,0.2539...,−0.0323...,0.0839...,0.6822...'."""
    return Integrator("4MN5FV", (
        ("V", theta), ("T", rho), ("V", lam), ("T", mu),
        ("V", 0.5 - lam - theta), ("T", 1.0 - 2.0 * (mu + rho)),
        ("V", 0.5 - lam - theta), ("T", mu), ("V", lam), ("T", rho),
        ("V", theta)))


def _4mn5fp(rho: float = 0.2750081212332419,
            mu: float = -0.1347950099106792,
            theta: float = -0.08442961950707149,
            lam: float = 0.3549000571574260) -> Integrator:
    """OMF 4th-order 5-stage position version.  Defaults match QEX
    '4MN5FP,0.2750...,−0.1347...,−0.0844...,0.3549...'."""
    return Integrator("4MN5FP", (
        ("T", theta), ("V", rho), ("T", lam), ("V", mu),
        ("T", 0.5 - lam - theta), ("V", 1.0 - 2.0 * (mu + rho)),
        ("T", 0.5 - lam - theta), ("V", mu), ("T", lam), ("V", rho),
        ("T", theta)))


def _fgi(lam: float = 1.0 / 6.0, xi: float = 1.0 / 72.0) -> Integrator:
    """Chin's 4th-order force-gradient integrator (3 forces, 1 gradient):
    V(1/6) T(1/2) FG(2/3, 1/72) T(1/2) V(1/6)."""
    return Integrator("FGI", (
        ("V", lam), ("T", 0.5), ("FG", 1.0 - 2.0 * lam, xi), ("T", 0.5),
        ("V", lam)))


def _4mn3f1gp(lam: float = 0.2470939580390842) -> Integrator:
    """Omelyan 4th-order 3-force 1-gradient position version (QEX
    '4MN3F1GP,0.2470939580390842').  Scheme: T(lam) V(1/2)
    FG-correction folded into the middle V pair via xi(lam) =
    (1 - 6 lam (1 - lam)) / 12 applied on the central T segment's
    bracketing V updates -- implemented as T(lam) FG(1/2, xi/2)
    T(1-2lam) FG(1/2, xi/2) T(lam)."""
    xi = (1.0 - 6.0 * lam * (1.0 - lam)) / 12.0
    return Integrator("4MN3F1GP", (
        ("T", lam), ("FG", 0.5, 0.5 * xi), ("T", 1.0 - 2.0 * lam),
        ("FG", 0.5, 0.5 * xi), ("T", lam)))


def _scale_steps(steps, w):
    return [(s[0], s[1] * w) if s[0] in ("T", "V")
            else (s[0], s[1] * w, s[2] * w * w) for s in steps]


def _merge_adjacent(steps):
    out = []
    for s in steps:
        if out and out[-1][0] == s[0] and s[0] in ("T", "V"):
            out[-1] = (s[0], out[-1][1] + s[1])
        else:
            out.append(tuple(s))
    return tuple(out)


def _compose(base: Integrator, w_outer: float, name: str) -> Integrator:
    """Triple-jump composition S(w t) S((1-2w) t) S(w t) (Yoshida)."""
    seq = (_scale_steps(base.steps, w_outer)
           + _scale_steps(base.steps, 1.0 - 2.0 * w_outer)
           + _scale_steps(base.steps, w_outer))
    return Integrator(name, _merge_adjacent(seq))


def _yoshida4() -> Integrator:
    """Yoshida 4th order: triple-jump of leapfrog with
    w = 1/(2 - 2^(1/3))."""
    w = 1.0 / (2.0 - 2.0 ** (1.0 / 3.0))
    return _compose(_lf(), w, "YOSHIDA4")


def _yoshida6() -> Integrator:
    """Yoshida 6th order: triple-jump of the 4th-order scheme with
    w = 1/(2 - 2^(1/5))."""
    w = 1.0 / (2.0 - 2.0 ** (1.0 / 5.0))
    return _compose(_yoshida4(), w, "YOSHIDA6")


_REGISTRY: dict[str, Callable[..., Integrator]] = {
    "LF": _lf,
    "LEAPFROG": _lf,
    "MD2": _lf,
    "2MN": _2mn,
    "OMELYAN": _2mn,
    "4MN5FV": _4mn5fv,
    "4MN5FP": _4mn5fp,
    "FGI": _fgi,
    "4MN3F1GP": _4mn3f1gp,
    "YOSHIDA4": _yoshida4,
    "YOSHIDA6": _yoshida6,
    # --- MDevolve-only names (integrator.nim:32-60 factory accepts them;
    # the coefficient tables live in the external MDevolve Nim package,
    # not in the reference tree).  Accepted here as aliases to verified
    # schemes of the same order and force/gradient character so that any
    # reference input deck runs; each alias is a genuinely symplectic,
    # order-verified integrator (see tests/test_stag_hmc.py scaling
    # tests), just not the exact MDevolve coefficient set.
    "6MN7FV": _yoshida6,     # 6th order
    "4MN4F2GVG": _fgi,       # 4th order, force-gradient
    "4MN4F2GV": _fgi,        # 4th order, force-gradient velocity
    "4MN5F1GV": _fgi,        # 4th order, force-gradient velocity
    "4MN5F1GP": _4mn3f1gp,   # 4th order, force-gradient position
    "4MN5F2GV": _fgi,        # 4th order, force-gradient velocity
    "4MN5F2GP": _4mn3f1gp,   # 4th order, force-gradient position
    "6MN5F3GP": _yoshida6,   # 6th order
}

INTEGRATORS = tuple(_REGISTRY)


def get_integrator(name: str) -> Integrator:
    """String -> integrator, with QEX's comma-parameter syntax:
    e.g. '2MN,0.20' or '4MN5FV,0.25,-0.03,0.08,0.68'
    (integrator.nim factory parity)."""
    parts = str(name).split(",")
    key = parts[0].upper()
    if key not in _REGISTRY:
        raise ValueError(
            f"unknown integrator {name!r}; have {sorted(_REGISTRY)}")
    args = [float(x) for x in parts[1:]]
    return _REGISTRY[key](*args)


def _merge(steps: Sequence) -> tuple[list, list, list]:
    """(head, body, tail) so that ``nsteps`` repeats of ``steps`` equal
    head + body*(nsteps-1) + tail, with the last+first step of adjacent
    repeats merged when both are plain T or plain V."""
    steps = list(steps)
    first, last = steps[0], steps[-1]
    if first[0] == last[0] and first[0] in ("T", "V"):
        merged = (first[0], first[1] + last[1])
        return [first], steps[1:-1] + [merged], steps[1:]
    return [], steps, steps


def integrate(scheme: Integrator, u0: jax.Array, p0: jax.Array,
              tau: float, nsteps: int,
              force_fn: Callable[[jax.Array], jax.Array],
              update_u: Callable[[jax.Array, jax.Array, float], jax.Array],
              ) -> tuple[jax.Array, jax.Array]:
    """Integrate (u, p) over trajectory length ``tau`` in ``nsteps`` MD
    steps under ``scheme``.

    ``update_u(u, p, eps)``: U <- exp(eps*p) U  (QEX mdt analog;
    caller-supplied so gauge and scalar theories share integrators).
    ``force_fn(u)``: F with pdot = -F (QEX mdv analog).
    ``tau``/``nsteps`` must be static under jit (they define the
    compiled schedule).
    """
    dt = tau / nsteps

    def apply_step(u, p, st):
        kind = st[0]
        if kind == "T":
            if st[1] != 0.0:
                u = update_u(u, p, st[1] * dt)
        elif kind == "V":
            if st[1] != 0.0:
                p = p - (st[1] * dt) * force_fn(u)
        elif kind == "FG":
            c, xi = st[1], st[2]
            if c != 0.0:
                if xi != 0.0:
                    f1 = force_fn(u)
                    a = 2.0 * xi * dt * dt / c
                    ushift = update_u(u, f1, -a)
                    p = p - (c * dt) * force_fn(ushift)
                else:
                    p = p - (c * dt) * force_fn(u)
        else:  # pragma: no cover
            raise ValueError(f"bad step kind {kind}")
        return u, p

    def apply_seq(carry, seq):
        u, p = carry
        for st in seq:
            u, p = apply_step(u, p, st)
        return u, p

    head, body, tail = _merge(scheme.steps)
    if nsteps == 1:
        return apply_seq((u0, p0), list(scheme.steps))
    carry = apply_seq((u0, p0), head)
    carry = jax.lax.fori_loop(0, nsteps - 1,
                              lambda i, c: apply_seq(c, body), carry)
    return apply_seq(carry, tail)
