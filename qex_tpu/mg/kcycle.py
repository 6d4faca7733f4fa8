"""Multi-level K-cycle multigrid for the Wilson operator.

Production-style upgrade of the two-grid prototype
(:mod:`qex_tpu.mg.twogrid`; reference prototype src/mg/wilsonmg.nim):

* **Chirality-split prolongator** (``chiral=True``): each near-null
  vector is split into its two gamma5 chiralities (chiral basis,
  g5 = diag(1,1,-1,-1), physics/wilson.py:44-57) before block
  orthonormalization, so the coarse space commutes with gamma5 and
  inherits gamma5-hermiticity -- the standard production Wilson-MG
  construction (QUDA/DD-alphaAMG style; doubles the coarse dof per
  near-null vector).
* **Recursive levels**: the Galerkin coarse operator (matrix-free
  R D P) is itself coarsened; level l+1 data is built from level l's
  coarse operator with the same adaptive setup.
* **K-cycle**: at each level the coarse equation is solved by a few
  iterations of GCR *preconditioned by the next-coarser cycle*
  (Krylov-accelerated cycle), not a single V-cycle correction.

All levels are static-shape lattice arithmetic (reshapes + einsums +
fori loops) -- jit-safe on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from . import twogrid as tg


@dataclasses.dataclass(frozen=True)
class MGHierarchy:
    """Per-level transfer setups and operators.

    setups[l] transfers level-l fields (shape ``shapes[l]``) to level
    l+1; ops[l] applies the level-l operator (ops[0] = the fine Dirac
    operator, ops[l>0] = Galerkin).
    """

    setups: list[tg.MGSetup]
    ops: list[Callable]
    lats: list[Lattice]


def _coarse_lat(lat: Lattice, bs: int, nvec_eff: int) -> Lattice:
    """Coarse geometry; the coarse 'color' dimension is the number of
    (chirality-split) near-null vectors."""
    return Lattice(tuple(d // bs for d in lat.dims), nc=nvec_eff)


def _wrap_coarse_op(dc: Callable) -> Callable:
    """Coarse fields are (nvec, *dims); present them to the setup
    machinery as (ns=1, nc=nvec, *dims)."""
    return lambda v: dc(v[0])[None]


def mg_hierarchy(lat: Lattice, op: Callable, *, nlevels: int = 2,
                 nvec: int = 8, bs: int = 2, chiral: bool = True,
                 ns: int = 4, seed: int = 0, dtype=jnp.complex64,
                 relax_iters: int = 30) -> MGHierarchy:
    """Adaptive setup of ``nlevels`` coarsening steps."""
    setups: list[tg.MGSetup] = []
    ops = [op]
    lats = [lat]
    cur_lat, cur_op, cur_ns = lat, op, ns
    for lvl in range(nlevels):
        s = tg.mg_setup(cur_lat, cur_op, nvec=nvec, bs=bs,
                        seed=seed + lvl, dtype=dtype, ns=cur_ns,
                        chiral=(chiral and lvl == 0 and cur_ns == 4),
                        relax_iters=relax_iters)
        setups.append(s)
        dc = tg.coarse_op(s, cur_op if lvl == 0
                          else (lambda v, o=cur_op: o(v)))
        cur_lat = _coarse_lat(cur_lat, bs, s.nvec)
        if min(cur_lat.dims) < bs and lvl + 1 < nlevels:
            # cannot coarsen further; stop early
            ops.append(dc)
            lats.append(cur_lat)
            break
        ops.append(dc)
        lats.append(cur_lat)
        cur_op = _wrap_coarse_op(dc)
        cur_ns = 1
        # next-level fields are (1, nvec_eff, dims); update nothing else
    return MGHierarchy(setups, ops, lats)


def _restrict_l(h: MGHierarchy, lvl: int, v: jax.Array) -> jax.Array:
    s = h.setups[lvl]
    return tg.restrict(s, v if lvl == 0 else v[None])


def _prolong_l(h: MGHierarchy, lvl: int, c: jax.Array) -> jax.Array:
    s = h.setups[lvl]
    p = tg.prolong(s, c)
    return p if lvl == 0 else p[0]


def k_cycle(h: MGHierarchy, lvl: int = 0, *, smooth_iters: int = 2,
            smooth_step: float = 0.2, k_m: int = 4,
            bottom_iters: int = 16, bottom_r2: float = 1e-4
            ) -> Callable:
    """The level-``lvl`` K-cycle preconditioner r -> approximate
    D_lvl^{-1} r."""
    from ..solvers.gcr import gcr_solve
    op = h.ops[lvl]
    nlev = len(h.setups)

    def smooth(x, r):
        for _ in range(smooth_iters):
            x = x + smooth_step * (r - op(x))
        return x

    if lvl >= nlev:       # deepest level: plain GCR bottom solve
        def bottom(r):
            x, _ = gcr_solve(op, r, r2req=bottom_r2, m=bottom_iters,
                             max_restarts=1)
            return x
        return bottom

    inner = k_cycle(h, lvl + 1, smooth_iters=smooth_iters,
                    smooth_step=smooth_step, k_m=k_m,
                    bottom_iters=bottom_iters, bottom_r2=bottom_r2)
    op_next = h.ops[lvl + 1]

    def cycle(r):
        x = smooth(jnp.zeros_like(r), r)
        rc = _restrict_l(h, lvl, r - op(x))
        # K-cycle: a few GCR iterations at the coarse level,
        # preconditioned by the next-coarser cycle
        ec, _ = gcr_solve(op_next, rc, precon=inner, r2req=bottom_r2,
                          m=k_m, max_restarts=1)
        x = x + _prolong_l(h, lvl, ec)
        return smooth(x, r)

    return cycle


def mg_solve_kcycle(lat: Lattice, op: Callable, b: jax.Array, *,
                    nlevels: int = 2, nvec: int = 8, bs: int = 2,
                    chiral: bool = True, r2req: float = 1e-10,
                    m: int = 16, max_restarts: int = 50, seed: int = 0,
                    hierarchy: MGHierarchy | None = None,
                    relax_iters: int = 30, smooth_iters: int = 2,
                    k_m: int = 4, bottom_iters: int = 16):
    """K-cycle preconditioned GCR solve of op x = b (multi-level
    production path; the two-grid mg_solve remains the reference
    prototype parity)."""
    from ..solvers.gcr import gcr_solve
    if hierarchy is None:
        hierarchy = mg_hierarchy(lat, op, nlevels=nlevels, nvec=nvec,
                                 bs=bs, chiral=chiral, ns=b.shape[0],
                                 seed=seed, dtype=b.dtype,
                                 relax_iters=relax_iters)
    precon = k_cycle(hierarchy, smooth_iters=smooth_iters, k_m=k_m,
                     bottom_iters=bottom_iters)
    x, stats = gcr_solve(op, b, precon=precon, r2req=r2req, m=m,
                         max_restarts=max_restarts)
    return x, stats, hierarchy
