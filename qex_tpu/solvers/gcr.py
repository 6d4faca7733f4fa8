"""GCR (generalized conjugate residual) with optional right
preconditioning.

TPU-native replacement for QEX's src/solvers/gcr.nim (329 LoC; the
outer solver of the Wilson multigrid).  Restarted GCR(m): a fixed
m-vector Krylov window kept as stacked device arrays; jit-safe
(``lax.fori_loop`` over the window, ``lax.scan`` over restarts).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import linalg
from .base import SolverStats


def gcr_solve(op: Callable[[jax.Array], jax.Array], b: jax.Array,
              *, precon: Callable[[jax.Array], jax.Array] | None = None,
              r2req: float = 1e-12, m: int = 16, max_restarts: int = 50
              ) -> tuple[jax.Array, SolverStats]:
    """Right-preconditioned restarted GCR(m): solve D x = b.

    ``precon``: approximate inverse applied to residuals (identity when
    None) -- the hook the multigrid smoother plugs into (QEX gcr usage
    in src/mg/wilsonmg.nim:58-104).
    """
    if precon is None:
        precon = lambda v: v
    b2 = linalg.norm2(b)
    stop = r2req * b2

    # nested while_loops with TRUE early exit: a converged solve stops
    # computing (the previous fixed-trip scan/fori with masked updates
    # still ran max_restarts*m preconditioner applications -- measured
    # 9.1 s for a 7-iteration MG solve at 4^4x8, exp_mg_ab.py)
    def inner_cond(st):
        i, x, r, r2, ps, aps, its = st
        return jnp.logical_and(i < m, r2 > stop)

    def inner(st):
        i, x, r, r2, ps, aps, its = st
        z = precon(r)
        az = op(z)

        # orthogonalize az against previous aps
        def ortho(j, zz):
            z_, az_ = zz
            c = linalg.dot(aps[j], az_)
            return (z_ - c * ps[j], az_ - c * aps[j])

        z, az = jax.lax.fori_loop(0, i, ortho, (z, az))
        nrm = jnp.sqrt(linalg.norm2(az)).astype(b.dtype)
        inv = 1.0 / jnp.maximum(jnp.abs(nrm), 1e-30)
        z = z * inv
        az = az * inv
        ps = ps.at[i].set(z)
        aps = aps.at[i].set(az)
        c = linalg.dot(az, r)
        x = x + c * z
        r = r - c * az
        return (i + 1, x, r, linalg.norm2(r), ps, aps, its + 1)

    def restart_cond(st):
        x, r, r2, its, k = st
        return jnp.logical_and(k < max_restarts, r2 > stop)

    def restart(st):
        x, r, r2, its, k = st
        ps = jnp.zeros((m,) + b.shape, b.dtype)
        aps = jnp.zeros((m,) + b.shape, b.dtype)
        _i, x, r, r2, ps, aps, its = jax.lax.while_loop(
            inner_cond, inner,
            (jnp.zeros((), jnp.int32), x, r, r2, ps, aps, its))
        return (x, r, r2, its, k + 1)

    x0 = jnp.zeros_like(b)
    x, r, r2, its, _k = jax.lax.while_loop(
        restart_cond, restart,
        (x0, b, b2, jnp.zeros((), jnp.int32),
         jnp.zeros((), jnp.int32)))
    return x, SolverStats(iterations=its, r2=r2 / b2)
