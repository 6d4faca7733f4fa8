"""Subspace-deflated CG.

TPU-native counterpart of the reference's eigensolver-assisted solves
(the PRIMME/hisqev eigenpairs feeding deflated staggered inversions;
reference src/eigens/hisqev.nim usage).  Given n approximate low
eigenvectors V of the hermitian positive-definite operator A, the
solve is split Galerkin-style (init-CG):

    x0 = V (V^H A V)^{-1} V^H b,      r0 = b - A x0  (V^H r0 = 0
                                       EXACTLY, by construction),

then CG runs on the residual system A z = r0, and the low-mode
correction is re-applied once on the final iterate to absorb rounding
drift.  Using the full Galerkin matrix V^H A V -- not the Ritz values
-- keeps the scheme robust to INEXACT eigenvectors: with c64-accuracy
eigenpairs the diag(1/lambda) oblique projection mis-amplifies the
near-null modes and CG diverges (measured), while the Galerkin solve
is the optimal subspace solution for whatever V actually spans.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import cg
from .base import SolverStats


def deflated_cg(op: Callable[[jax.Array], jax.Array], b: jax.Array,
                evals: jax.Array, vecs: jax.Array, *,
                r2req: float = 1e-12, maxits: int = 1000,
                restarts: int = 2
                ) -> tuple[jax.Array, SolverStats]:
    """Solve A x = b with the span of ``vecs`` handled directly.

    ``vecs``: (n, *b.shape) approximate low eigenvectors (orthonormal
    or not -- the Galerkin matrix absorbs scaling).  ``evals`` is
    accepted for API symmetry with eigens.deflation_basis but the
    Galerkin matrix V^H A V is used instead (robust to eigenvector
    error).  jit-safe; costs n operator applications at setup.
    """
    del evals
    w = jax.vmap(op)(vecs)                       # A V, (n, ...)
    gram = jnp.einsum("n...,k...->nk", jnp.conj(vecs), w)

    def galerkin(r):
        c = jnp.einsum("n...,...->n", jnp.conj(vecs), r)
        return jnp.einsum("n...,n->...", vecs,
                          jnp.linalg.solve(gram, c))

    x0 = galerkin(b)
    r0 = b - op(x0)
    z, stats = cg.cg_solve_restarted(op, r0, r2req=r2req,
                                     maxits=maxits, restarts=restarts)
    x = x0 + z
    # one final low-mode correction for rounding drift of the CG part
    return x + galerkin(b - op(x)), stats


def deflation_pays(evals, m: float, margin: float = 1.0) -> bool:
    """Automatic use/don't-use criterion for deflating the shifted
    solve A + m^2 (the staggered/HISQ mass term).

    Deflation helps only when the deflated modes actually dominate the
    low end of the SHIFTED spectrum, i.e. lambda_low + m^2 is
    meaningfully smaller than the undeflated condition floor:
    measured on-chip at 24^3x48 (ROUND3.md), deflating at
    lambda_low ~ 1.6e-7 << m^2 = 2.5e-3 made the solve ~2x SLOWER
    (Galerkin projections with f32-grade vectors actively hurt).
    Criterion: pay only when the mass term does NOT already dominate
    the deflated band, i.e. max(deflated evals) >= margin * m^2.

    Host-side (called with the numpy evals the eigensolver returns) --
    keep it out of jit."""
    import numpy as np
    ev = np.asarray(evals, dtype=np.float64)
    if ev.size == 0:
        return False
    return bool(np.max(ev) >= margin * float(m) * float(m))


def auto_deflated_cg(op: Callable[[jax.Array], jax.Array],
                     b: jax.Array, evals, vecs, m: float, *,
                     r2req: float = 1e-12, maxits: int = 1000,
                     restarts: int = 2):
    """``deflated_cg`` gated by :func:`deflation_pays`: falls back to
    plain restarted CG when the mass term dominates the deflated band
    (the measured-loss regime).  Returns (x, stats, used_deflation)."""
    if deflation_pays(evals, m):
        x, stats = deflated_cg(op, b, evals, vecs, r2req=r2req,
                               maxits=maxits, restarts=restarts)
        return x, stats, True
    x, stats = cg.cg_solve_restarted(op, b, r2req=r2req, maxits=maxits,
                                     restarts=restarts)
    return x, stats, False
