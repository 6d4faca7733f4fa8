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
