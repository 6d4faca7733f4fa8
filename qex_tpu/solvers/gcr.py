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
    n = b.size

    def restart(carry, _):
        x, r, r2, done, its = carry
        ps = jnp.zeros((m,) + b.shape, b.dtype)
        aps = jnp.zeros((m,) + b.shape, b.dtype)

        def inner(i, st):
            x, r, r2, ps, aps, done, its = st
            z = precon(r)
            az = op(z)

            # orthogonalize az against previous aps
            def ortho(j, zz):
                z_, az_ = zz
                c = linalg.dot(aps[j], az_)
                return (z_ - c * ps[j], az_ - c * aps[j])

            z, az = jax.lax.fori_loop(0, i, ortho, (z, az))
            nrm = jnp.sqrt(linalg.norm2(az)).astype(b.dtype)
            z = z / jnp.maximum(jnp.abs(nrm), 1e-30) * jnp.sign(
                jnp.where(jnp.abs(nrm) > 0, 1.0, 1.0)).astype(b.dtype)
            az = az / jnp.maximum(jnp.abs(nrm), 1e-30)
            ps = ps.at[i].set(z)
            aps = aps.at[i].set(az)
            c = linalg.dot(az, r)
            active = jnp.logical_and(r2 > stop, jnp.logical_not(done))
            x = jnp.where(active, x + c * z, x)
            r = jnp.where(active, r - c * az, r)
            r2n = linalg.norm2(r)
            its = its + jnp.where(active, 1, 0)
            return (x, r, jnp.where(active, r2n, r2), ps, aps, done,
                    its)

        x, r, r2, ps, aps, done, its = jax.lax.fori_loop(
            0, m, inner, (x, r, r2, ps, aps, done, its))
        done = r2 <= stop
        return (x, r, r2, done, its), r2

    x0 = jnp.zeros_like(b)
    r0 = b
    (x, r, r2, done, its), _ = jax.lax.scan(
        restart, (x0, r0, linalg.norm2(r0), jnp.array(False),
                  jnp.zeros((), jnp.int32)), None, length=max_restarts)
    return x, SolverStats(iterations=its, r2=r2 / b2)
