"""Conjugate gradient solver.

TPU-native replacement for QEX's src/solvers/cg.nim (``cgSolve`` :281,
``solve(CgState)`` :55) and the defect-correction restart driver of
src/physics/stagSolve.nim:224-296.

Design: a single ``lax.while_loop`` under jit -- no host round-trips per
iteration.  Reductions use f32 arithmetic with XLA's deterministic tree
reduction; the *restart driver* recomputes the true residual from the
original operator/rhs between inner solves, which recovers 1e-8-level
accuracy in complex64 (SURVEY.md §7 "CG in f32 matching QEX-to-1e-8").
All vector iterates stay on device in the working dtype.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import linalg
from .base import SolverStats


def cg_solve(op: Callable[[jax.Array], jax.Array], b: jax.Array,
             x0: jax.Array | None = None, *, r2req: float = 1e-12,
             maxits: int = 1000) -> tuple[jax.Array, SolverStats]:
    """Plain CG on a hermitian positive definite operator.

    Stops when |r|^2 / |b|^2 <= r2req or maxits reached; jit-safe
    (``lax.while_loop``).  QEX parity: solvers/cg.nim:55-270 (without
    preconditioner hooks; see :func:`cg_solve_precon`).

    Returns (x, stats).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
    b2 = linalg.norm2(b)
    # if x0 != 0: solve for the correction implicitly via the initial residual
    r = b - op(x0)
    p = r
    r2 = linalg.norm2(r)
    stop = r2req * b2

    def cond(state):
        x, r, p, r2, k = state
        return jnp.logical_and(r2 > stop, k < maxits)

    def body(state):
        x, r, p, r2, k = state
        ap = op(p)
        pap = linalg.redot(p, ap)
        alpha = r2 / pap
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * ap
        r2new = linalg.norm2(r)
        beta = r2new / r2
        p = r + beta.astype(p.dtype) * p
        return x, r, p, r2new, k + 1

    x, r, p, r2, k = jax.lax.while_loop(
        cond, body, (x0, r, p, r2, jnp.zeros((), jnp.int32)))
    return x, SolverStats(iterations=k, r2=r2 / b2)


def cg_solve_restarted(op: Callable[[jax.Array], jax.Array], b: jax.Array,
                       *, r2req: float = 1e-12, maxits: int = 1000,
                       restarts: int = 5,
                       inner_r2req_floor: float = 1e-12,
                       op_true: Callable[[jax.Array], jax.Array] | None
                       = None,
                       stop2: jax.Array | None = None,
                       ) -> tuple[jax.Array, SolverStats]:
    """Defect-correction restarted CG.

    Mirrors QEX's stagSolve outer loop (stagSolve.nim:224-296): run inner
    CG, recompute the TRUE residual r = b - A x from scratch, and restart
    on the defect until the true relative residual meets r2req.  This is
    what lets complex64 arithmetic reach 1e-8-level residuals: each
    restart re-anchors against accumulated rounding drift.

    ``op_true`` (default: ``op``) evaluates the true residuals between
    restarts; passing a full-precision operator here while ``op`` uses
    sloppy (e.g. bf16-link) arithmetic is the QEX ``sloppySolve``
    mixed-precision scheme.

    ``stop2`` (optional, traced): absolute squared-residual stop that
    OVERRIDES ``r2req * |b|^2`` — lets a defect-correction caller aim
    at the ORIGINAL system's target (so the call short-circuits to zero
    iterations when the incoming defect already meets it).

    jit-safe: fixed ``restarts`` trip count with a converged short-circuit
    inside the scan body.
    """
    if op_true is None:
        op_true = op
    b2 = linalg.norm2(b)
    stop = r2req * b2 if stop2 is None else stop2

    def inner(rhs):
        x, st = cg_solve(op, rhs, r2req=max(r2req * 0.1, inner_r2req_floor),
                         maxits=maxits)
        return x, st.iterations

    def body(carry, _):
        x, total_its, done = carry
        r = b - op_true(x)
        r2 = linalg.norm2(r)
        need = jnp.logical_and(r2 > stop, jnp.logical_not(done))

        def do(args):
            x, r = args
            dx, its = inner(r)
            return x + dx, its

        def skip(args):
            x, _ = args
            return x, jnp.zeros((), jnp.int32)

        x, its = jax.lax.cond(need, do, skip, (x, r))
        return (x, total_its + its, jnp.logical_not(need)), r2

    init = (jnp.zeros_like(b), jnp.zeros((), jnp.int32), jnp.array(False))
    (x, its, _), r2s = jax.lax.scan(body, init, None, length=restarts)
    r_final = b - op_true(x)
    r2_final = linalg.norm2(r_final) / b2
    return x, SolverStats(iterations=its, r2=r2_final)


def cg_solve_precon(op, b, precon, *, r2req: float = 1e-12,
                    maxits: int = 1000) -> tuple[jax.Array, SolverStats]:
    """Preconditioned CG (hermitian preconditioner M ~ A^-1).

    QEX parity: CgPrecon hooks (solvers/cg.nim:8-13).
    """
    x = jnp.zeros_like(b)
    b2 = linalg.norm2(b)
    r = b
    z = precon(r)
    p = z
    rz = linalg.redot(r, z)
    r2 = linalg.norm2(r)
    stop = r2req * b2

    def cond(state):
        x, r, p, z, rz, r2, k = state
        return jnp.logical_and(r2 > stop, k < maxits)

    def body(state):
        x, r, p, z, rz, r2, k = state
        ap = op(p)
        alpha = rz / linalg.redot(p, ap)
        x = x + alpha.astype(x.dtype) * p
        r = r - alpha.astype(r.dtype) * ap
        z = precon(r)
        rznew = linalg.redot(r, z)
        beta = rznew / rz
        p = z + beta.astype(p.dtype) * p
        return x, r, p, z, rznew, linalg.norm2(r), k + 1

    x, r, p, z, rz, r2, k = jax.lax.while_loop(
        cond, body, (x, r, p, z, rz, r2, jnp.zeros((), jnp.int32)))
    return x, SolverStats(iterations=k, r2=r2 / b2)
