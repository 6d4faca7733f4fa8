"""BiCGStab solver for non-hermitian systems.

TPU-native replacement for QEX's src/solvers/bicgstab.nim (186 LoC):
solve D x = b directly (e.g. the full staggered operator m + Dslash)
without forming the normal equations.  Single ``lax.while_loop`` under
jit, fixed reduction order.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import linalg
from .base import SolverStats


def bicgstab_solve(op: Callable[[jax.Array], jax.Array], b: jax.Array,
                   x0: jax.Array | None = None, *, r2req: float = 1e-12,
                   maxits: int = 2000) -> tuple[jax.Array, SolverStats]:
    """BiCGStab (van der Vorst).  Stops at |r|^2/|b|^2 <= r2req."""
    x = jnp.zeros_like(b) if x0 is None else x0
    r = b - op(x)
    r0 = r
    b2 = linalg.norm2(b)
    stop = r2req * b2
    one = jnp.ones((), b.dtype)
    zero_v = jnp.zeros_like(b)

    def cond(st):
        x, r, p, v, rho, alpha, omega, r2, k = st
        ok = jnp.isfinite(r2)   # exit on breakdown (rho/omega ~ 0)
        return jnp.logical_and(jnp.logical_and(r2 > stop, ok),
                               k < maxits)

    def body(st):
        x, r, p, v, rho, alpha, omega, r2, k = st
        rho_new = linalg.dot(r0, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        v = op(p)
        alpha = rho_new / linalg.dot(r0, v)
        s = r - alpha * v
        t = op(s)
        omega = linalg.dot(t, s) / jnp.maximum(
            linalg.norm2(t), 1e-30).astype(b.dtype)
        x = x + alpha * p + omega * s
        r = s - omega * t
        return (x, r, p, v, rho_new, alpha, omega, linalg.norm2(r),
                k + 1)

    init = (x, r, zero_v, zero_v, one, one, one, linalg.norm2(r),
            jnp.zeros((), jnp.int32))
    x, r, p, v, rho, alpha, omega, r2, k = jax.lax.while_loop(
        cond, body, init)
    return x, SolverStats(iterations=k, r2=r2 / b2)
