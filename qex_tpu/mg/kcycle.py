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
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from . import twogrid as tg


@dataclasses.dataclass(frozen=True)
class MGHierarchy:
    """Per-level transfer data.

    setups[l] transfers level-l fields to level l+1; stencils[l] is
    the ASSEMBLED level-(l+1) Galerkin operator
    (:class:`.coarse.CoarseStencil`) or None for matrix-free.  Level
    operators are DERIVED from this data plus the fine operator by
    :func:`level_ops` -- nothing here closes over arrays, so a
    hierarchy is a registered pytree and passes through jit as an
    ARGUMENT (op_args discipline on the TPU tunnel).
    """

    setups: tuple
    stencils: tuple
    lats: tuple


jax.tree_util.register_pytree_node(
    MGHierarchy,
    lambda h: ((h.setups, h.stencils), (h.lats,)),
    lambda aux, leaves: MGHierarchy(leaves[0], leaves[1], aux[0]))


def level_ops(h: MGHierarchy, fine_op: Callable) -> tuple:
    """ops[l] applies the level-l operator, derived from the CURRENT
    hierarchy leaves: assembled stencil applies where available,
    recursive matrix-free Galerkin otherwise."""
    from .coarse import apply_stencil
    ops = [fine_op]
    for l, s in enumerate(h.setups):
        if h.stencils[l] is not None:
            ops.append(partial(apply_stencil, h.stencils[l]))
        else:
            prev = ops[l] if l == 0 else _wrap_coarse_op(ops[l])
            ops.append(tg.coarse_op(s, prev))
    return tuple(ops)


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
                 relax_iters: int = 30,
                 assemble: bool = True) -> MGHierarchy:
    """Adaptive setup of ``nlevels`` coarsening steps.

    ``assemble=True`` (production default) probes each Galerkin coarse
    operator into an explicit 9-point stencil (:mod:`.coarse`) so
    coarse matvecs never touch the fine grid -- the matrix-free
    R D P coarse operator measured 3 orders of magnitude off CGNE in
    wall-clock (exp_mg_ab.py).  The probing itself is
    ``nvec_eff * (2 + sum_mu k_mu)`` fine operator applications, paid
    once per hierarchy (reuse the hierarchy across solves on one gauge
    field)."""
    from .coarse import apply_stencil, assemble_stencil

    setups = []
    stencils = []
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
        if assemble:
            cst = jax.jit(lambda: assemble_stencil(
                dc, s.nvec, cur_lat.dims, dtype))()
            stencils.append(cst)
            dc = partial(apply_stencil, cst)
        else:
            stencils.append(None)
        lats.append(cur_lat)
        if min(cur_lat.dims) < bs and lvl + 1 < nlevels:
            break     # cannot coarsen further
        cur_op = _wrap_coarse_op(dc)
        cur_ns = 1
        # next-level fields are (1, nvec_eff, dims); update nothing else
    return MGHierarchy(tuple(setups), tuple(stencils), tuple(lats))


def _restrict_l(h: MGHierarchy, lvl: int, v: jax.Array) -> jax.Array:
    s = h.setups[lvl]
    return tg.restrict(s, v if lvl == 0 else v[None])


def _prolong_l(h: MGHierarchy, lvl: int, c: jax.Array) -> jax.Array:
    s = h.setups[lvl]
    p = tg.prolong(s, c)
    return p if lvl == 0 else p[0]


def k_cycle(h: MGHierarchy, fine_op: Callable, lvl: int = 0, *,
            smooth_iters: int = 2, smooth_step: float = 0.2,
            k_m: int = 4, bottom_iters: int = 16,
            bottom_r2: float = 1e-4, _ops=None) -> Callable:
    """The level-``lvl`` K-cycle preconditioner r -> approximate
    D_lvl^{-1} r."""
    from ..solvers.gcr import gcr_solve
    ops = level_ops(h, fine_op) if _ops is None else _ops
    op = ops[lvl]
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

    inner = k_cycle(h, fine_op, lvl + 1, smooth_iters=smooth_iters,
                    smooth_step=smooth_step, k_m=k_m,
                    bottom_iters=bottom_iters, bottom_r2=bottom_r2,
                    _ops=ops)
    op_next = ops[lvl + 1]

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
                    k_m: int = 4, bottom_iters: int = 16,
                    assemble: bool = True):
    """K-cycle preconditioned GCR solve of op x = b (multi-level
    production path; the two-grid mg_solve remains the reference
    prototype parity)."""
    from ..solvers.gcr import gcr_solve
    if hierarchy is None:
        hierarchy = mg_hierarchy(lat, op, nlevels=nlevels, nvec=nvec,
                                 bs=bs, chiral=chiral, ns=b.shape[0],
                                 seed=seed, dtype=b.dtype,
                                 relax_iters=relax_iters,
                                 assemble=assemble)
    precon = k_cycle(hierarchy, op, smooth_iters=smooth_iters, k_m=k_m,
                     bottom_iters=bottom_iters)
    x, stats = gcr_solve(op, b, precon=precon, r2req=r2req, m=m,
                         max_restarts=max_restarts)
    return x, stats, hierarchy
