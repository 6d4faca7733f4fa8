"""Multishift (multi-mass) conjugate gradient.

TPU-native replacement for QEX's src/solvers/cgm.nim (472 LoC), which
cites B. Jegerlehner, arXiv:hep-lat/9612014: solve

    (A + sigma_i) x_i = b     for all shifts sigma_i at once

from a single Krylov space built on the base operator ``A`` (here
``A = -D_eo D_oe``, positive semi-definite; shifts sigma_i = m_i^2 > 0).

Implementation: one ``lax.while_loop``; the per-shift iterates are
stacked along a leading axis so the axpy updates vectorize over shifts
(TPU analog of QEX's unrolled per-shift loops).  The shifted residual is
``zeta_i * r``, so convergence of every shift is monitored from the base
residual norm for free.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..ops import linalg
from .base import SolverStats


def cg_multishift(base_op: Callable[[jax.Array], jax.Array], b: jax.Array,
                  shifts: Sequence[float], *, r2req: float = 1e-12,
                  maxits: int = 2000
                  ) -> tuple[list[jax.Array], SolverStats]:
    """Shifted CG: returns [x_i] with (A + sigma_i) x_i = b.

    Convergence: iterate until max_i |r_i|^2 <= r2req * |b|^2 where
    r_i = zeta_i r is the shifted-system residual.  All shifts must be
    >= 0 and ``A`` positive semi-definite (the staggered normal-op case,
    QEX cgm.nim usage from stagSolve.nim:296-460).
    """
    ns = len(shifts)
    rtype = jnp.zeros((), b.dtype).real.dtype
    sig = jnp.asarray(list(shifts), dtype=rtype)
    # Use the smallest shift as the base system: its Krylov space converges
    # slowest, so every other (larger-shift) system is converged by the
    # time it is -- the standard trick (also QEX's: cgm solves smallest
    # mass as base).  Remaining shifts are relative.
    i0 = int(min(range(ns), key=lambda i: shifts[i]))
    sig0 = sig[i0]
    dsig = sig - sig0  # >= 0, zero for base

    def op(v):
        return base_op(v) + sig0.astype(v.dtype) * v

    b2 = linalg.norm2(b)
    stop = (r2req * b2).astype(rtype)
    one = jnp.ones((ns,), rtype)

    # state: x (ns, *b), p (ns, *b), base p, r, rho, zeta, zeta_old,
    #        alpha_old, beta_old, k
    x = jnp.zeros((ns,) + b.shape, b.dtype)
    ps = jnp.broadcast_to(b, (ns,) + b.shape).astype(b.dtype)
    p = b
    r = b
    rho = linalg.norm2(r).astype(rtype)

    def cond(st):
        x, ps, p, r, rho, zeta, zeta_old, a_old, b_old, k = st
        # worst (largest) shifted residual: max_i zeta_i^2 * rho
        worst = jnp.max(zeta * zeta) * rho
        return jnp.logical_and(worst > stop, k < maxits)

    def body(st):
        x, ps, p, r, rho, zeta, zeta_old, a_old, b_old, k = st
        ap = op(p)
        pap = linalg.redot(p, ap).astype(rtype)
        alpha = rho / pap
        # shifted coefficient recurrences (Jegerlehner eqs. 2.42-2.44)
        denom = (alpha * b_old * (zeta_old - zeta)
                 + zeta_old * a_old * (one + dsig * alpha))
        zeta_new = jnp.where(denom != 0.0,
                             zeta * zeta_old * a_old / denom, 0.0)
        ratio = jnp.where(zeta != 0.0, zeta_new / zeta, 0.0)
        alpha_s = alpha * ratio
        bshape = (ns,) + (1,) * b.ndim
        x = x + alpha_s.reshape(bshape).astype(b.dtype) * ps
        r = r - alpha.astype(b.dtype) * ap
        rho_new = linalg.norm2(r).astype(rtype)
        beta = rho_new / rho
        beta_s = beta * ratio * ratio
        p = r + beta.astype(b.dtype) * p
        ps = (zeta_new.reshape(bshape).astype(b.dtype) * r
              + beta_s.reshape(bshape).astype(b.dtype) * ps)
        return (x, ps, p, r, rho_new, zeta_new, zeta, alpha, beta, k + 1)

    init = (x, ps, p, r, rho, one, one, jnp.ones((), rtype),
            jnp.zeros((), rtype), jnp.zeros((), jnp.int32))
    x, ps, p, r, rho, zeta, zeta_old, a_old, b_old, k = jax.lax.while_loop(
        cond, body, init)
    stats = SolverStats(iterations=k, r2=jnp.max(zeta * zeta) * rho / b2)
    return [x[i] for i in range(ns)], stats


def cg_multishift_refined(base_sloppy: Callable[[jax.Array], jax.Array],
                          base_true: Callable[[jax.Array], jax.Array],
                          b: jax.Array, shifts: Sequence[float], *,
                          r2req: float = 1e-12, maxits: int = 2000,
                          sloppy_r2req: float = 1e-8,
                          refine_restarts: int = 2
                          ) -> tuple[list[jax.Array], SolverStats]:
    """Mixed-precision multishift: sloppy single-Krylov pass + per-shift
    defect-correction refinement against the true operator.

    The multishift recurrence cannot restart (the shifted iterates share
    one Krylov space), so the QEX sloppySolve trick (bf16-link inner CG
    + f32 true-residual restarts, solverBase.nim sloppySolve) is applied
    per shift AFTER the joint pass: x_i += solve((A_true + sigma_i) e =
    b - (A_true + sigma_i) x_i), with the refinement CG itself running
    the sloppy operator inside true-residual restarts.  The sloppy pass
    does the bulk of the iterations at reduced memory traffic; each
    refinement only closes the gap sloppy_r2req -> r2req.

    jit-safe (fixed shift count, while_loop inner solves).
    """
    from . import cg as cgmod

    xs, st0 = cg_multishift(base_sloppy, b, shifts,
                            r2req=max(r2req, sloppy_r2req), maxits=maxits)
    # relative defect tolerance closing sloppy -> true (static floats;
    # the defect norm is ~sloppy_r2req * |b|^2, so this lands the final
    # true residual at ~r2req * |b|^2 with margin from the extra decade)
    r2_ref = min(1.0, 0.1 * r2req / max(r2req, sloppy_r2req))
    total = st0.iterations
    out = []
    worst = None
    b2 = linalg.norm2(b)
    for i, s in enumerate(shifts):
        op_t = (lambda v, s=s: base_true(v) + s * v)
        op_s = (lambda v, s=s: base_sloppy(v) + s * v)
        d = b - op_t(xs[i])
        # guard: if the sloppy joint pass left this shift WORSE than
        # x = 0 (possible deep in the stall regime), restart from zero
        w0 = (linalg.norm2(d) <= linalg.norm2(b)).astype(b.dtype)
        xs[i] = w0 * xs[i]
        d = w0 * d + (1.0 - w0) * b
        # inner floor = the SLOPPY operator's achievable residual
        # (sloppy_r2req), NOT a fraction of the final target: asking a
        # bf16 inner pass for 1e-7 stalls it at its ~1e-5 noise floor
        # and burns the whole iteration budget before the op_true
        # restarts can correct (measured exp_msloppy.py: lightest
        # shift stuck at 1.1e-5 true r2 with the old 0.1*r2_ref floor)
        e, sti = cgmod.cg_solve_restarted(
            op_s, d, r2req=r2_ref, maxits=maxits,
            restarts=refine_restarts, op_true=op_t,
            inner_r2req_floor=max(r2_ref * 0.1, sloppy_r2req))
        xi = xs[i] + e
        total = total + sti.iterations
        if base_sloppy is not base_true:
            # Sloppy-inner iterative refinement converges only while
            # eps_sloppy * kappa(A + sigma_i) < 1: with bf16 links
            # (eps ~ 4e-3) the lightest staggered shift at 32^4
            # (kappa ~ 4e3) STALLS at ~1e-5 true r2 no matter how many
            # restarts (measured exp_msloppy.py).  Close the remaining
            # gap with true-operator inner solves aimed at the ORIGINAL
            # system's absolute target (stop2): the driver
            # short-circuits to zero iterations for shifts the sloppy
            # refinement already closed, so heavy shifts pay nothing.
            # Monotone guard first: deep in the stall regime the sloppy
            # stage can AMPLIFY the defect — never let it poison the
            # closure.
            d2 = b - op_t(xi)
            w = (linalg.norm2(d2) <= linalg.norm2(d)).astype(b.dtype)
            xi = xs[i] + w * e
            d2 = w * d2 + (1.0 - w) * d
            e2, st2 = cgmod.cg_solve_restarted(
                op_t, d2, r2req=r2_ref, maxits=maxits,
                restarts=refine_restarts, stop2=r2req * b2)
            xi = xi + e2
            total = total + st2.iterations
        out.append(xi)
        ri = linalg.norm2(b - op_t(out[i])) / b2
        worst = ri if worst is None else jnp.maximum(worst, ri)
    return out, SolverStats(iterations=total, r2=worst)
