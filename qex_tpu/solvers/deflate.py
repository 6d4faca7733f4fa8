"""Eigenvector-deflated CG.

TPU-native counterpart of the reference's eigensolver-assisted solves
(the PRIMME/hisqev eigenpairs feeding deflated staggered inversions;
reference src/eigens/hisqev.nim usage).  Given n approximate low
eigenpairs (lambda_i, v_i) of the hermitian positive-definite operator
A, the solve is split:

    x = V diag(1/lambda) V^H b  +  CG on the deflated residual,

with the CG search kept V-orthogonal by projecting the operator
(Galerkin deflation).  Low modes -- which dominate CG iteration counts
at light mass -- are handled exactly, so iterations scale with the
DEFLATED condition number lambda_max / lambda_{n+1}.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from . import cg
from .base import SolverStats


def _project_out(vecs: jax.Array, x: jax.Array) -> jax.Array:
    """x - V V^H x for stacked orthonormal eigenvectors (n, ...)."""
    coeff = jnp.einsum("n...,...->n", jnp.conj(vecs), x)
    return x - jnp.einsum("n...,n->...", vecs, coeff)


def deflated_cg(op: Callable[[jax.Array], jax.Array], b: jax.Array,
                evals: jax.Array, vecs: jax.Array, *,
                r2req: float = 1e-12, maxits: int = 1000,
                restarts: int = 2
                ) -> tuple[jax.Array, SolverStats]:
    """Solve A x = b with the low-mode subspace handled directly.

    ``evals``/``vecs``: eigenpairs of A, vecs shape (n, *b.shape),
    assumed orthonormal.  jit-safe.
    """
    coeff = jnp.einsum("n...,...->n", jnp.conj(vecs), b)
    x_low = jnp.einsum("n...,n->...", vecs,
                       coeff / evals.astype(coeff.dtype))
    b_def = _project_out(vecs, b)

    def op_def(v):
        return _project_out(vecs, op(_project_out(vecs, v)))

    x_hi, stats = cg.cg_solve_restarted(op_def, b_def, r2req=r2req,
                                        maxits=maxits,
                                        restarts=restarts)
    return x_low + _project_out(vecs, x_hi), stats
