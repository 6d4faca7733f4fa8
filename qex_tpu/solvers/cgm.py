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
