"""Solver parameter/result types.

TPU-native replacement for QEX's src/solvers/solverBase.nim:10-28
(``SolverParams{r2req, maxits, subset, ...}`` + stats plumbing).

Stats are returned functionally (a ``SolverStats`` pytree) instead of
mutated in place; callers accumulate them (see qex_tpu.utils.profile).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MGParams:
    """Multigrid-preconditioner configuration (hashable) for the
    ``backend="mg"`` solve route (QEX SolverParams.backend,
    solverBase.nim:14,50-53; MG prototype mg/wilsonmg.nim:58-104).
    Consumed by qex_tpu.mg.kcycle via physics.wilson.solve_mg."""

    nlevels: int = 2
    nvec: int = 8          # near-null vectors per coarsening
    bs: int = 2            # geometric block size
    chiral: bool = True    # gamma5-chirality-split prolongator
    relax_iters: int = 30  # adaptive-setup relaxation sweeps
    m: int = 16            # outer GCR restart length
    smooth_iters: int = 2
    k_m: int = 4           # K-cycle coarse GCR iterations
    bottom_iters: int = 16
    seed: int = 0
    assemble: bool = True  # probe coarse ops into explicit stencils


@dataclasses.dataclass(frozen=True)
class SolverParams:
    """Static solve configuration (hashable: safe as a jit static arg).

    r2req: relative residual^2 target (|r|^2 / |b|^2), QEX convention.
    maxits: iteration cap per inner CG.
    restarts: defect-correction restart cap (QEX stagSolve outer loop).
    verbose: print per-solve summary lines.
    """

    r2req: float = 1e-12
    maxits: int = 2000
    restarts: int = 5
    verbose: bool = False
    sloppy: bool = False   # bf16-link inner solves + full-precision
    #                        true-residual restarts (QEX sloppySolve)
    # Optional parallel.mesh.LatticeMesh: route staggered solves
    # through the explicit shard_map kernel path
    # (physics/stag_shard.py) -- the multi-chip Pallas route.  The
    # QEX analog is the per-solve backend switch
    # (solverBase.nim:6,50-52).  Hashable, so still jit-static.
    mesh: object | None = None
    # Solve-backend switch (QEX SolverParams.backend,
    # solverBase.nim:14,50-53): "cg" = CGNE/eo-CG Krylov path;
    # "mg" = K-cycle-multigrid-preconditioned GCR on D itself
    # (Wilson only; physics.wilson.solve/solve_eo dispatch on this).
    backend: str = "cg"
    mg: MGParams | None = None


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SolverStats:
    """Per-solve statistics (QEX SolverParams.{iterations,seconds,flops,r2})."""

    iterations: jax.Array | int = 0
    r2: jax.Array | float = 0.0  # final relative residual^2

    def tree_flatten(self):
        return (self.iterations, self.r2), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


LinearOp = Callable[[jax.Array], jax.Array]
