"""Two-grid (adaptive aggregation) multigrid for the Wilson operator.

TPU-native replacement for QEX's Wilson multigrid prototype
(src/mg/mgblocks.nim blocking, wmgsetup.nim near-null setup,
wilsonmg.nim GCR-preconditioned outer solve):

* Setup: near-null vectors from relaxing random fields with the
  homogeneous operator (Jacobi/Richardson on D v ~ 0), then
  block-orthonormalized over hypercubic aggregates -> prolongator P.
* Coarse operator: Galerkin D_c = R D P applied MATRIX-FREE (one fine
  Dslash per coarse matvec) -- the TPU-friendly choice: every step is
  dense lattice arithmetic, no sparse indexing.
* Solve: outer GCR right-preconditioned by one V(1,1)-ish cycle:
  pre-smooth, coarse GCR solve, post-smooth.

The aggregation is spin-blind (no chiral splitting) -- prototype parity
with the reference's mg/ status.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg


def _block_reshape(v: jax.Array, lat: Lattice, bs: int):
    """(lead..., X, Y, Z, T) -> (lead..., Xc, bx, Yc, by, Zc, bz, Tc, bt)."""
    lead = v.shape[:-lat.nd]
    shape = lead + sum((((d // bs), bs) for d in lat.dims), ())
    return v.reshape(shape)


@dataclasses.dataclass(frozen=True)
class MGSetup:
    """Two-grid data: orthonormal block prolongator.

    w: (nvec, ns, nc, Xc, bs, Yc, bs, Zc, bs, Tc, bs) block-supported
    orthonormal near-null vectors."""

    lat: Lattice
    bs: int
    w: jax.Array

    @property
    def nvec(self) -> int:
        return self.w.shape[0]


# pytree: the prolongator array is a leaf so setups (and hierarchies
# of them) pass through jit as ARGUMENTS -- on the TPU tunnel a
# closed-over volume-sized array serializes into the remote-compile
# request (op_args discipline, CLAUDE.md)
jax.tree_util.register_pytree_node(
    MGSetup,
    lambda s: ((s.w,), (s.lat, s.bs)),
    lambda aux, leaves: MGSetup(aux[0], aux[1], leaves[0]))


def restrict(setup: MGSetup, v: jax.Array) -> jax.Array:
    """Fine field (ns, nc, *dims) -> coarse (nvec, Xc, Yc, Zc, Tc)."""
    vb = _block_reshape(v, setup.lat, setup.bs)
    return jnp.einsum("kscXxYyZzTt,scXxYyZzTt->kXYZT",
                      jnp.conj(setup.w), vb)


def prolong(setup: MGSetup, c: jax.Array) -> jax.Array:
    """Coarse (nvec, Xc, Yc, Zc, Tc) -> fine (ns, nc, *dims)."""
    vb = jnp.einsum("kscXxYyZzTt,kXYZT->scXxYyZzTt", setup.w, c)
    lead = vb.shape[:2]
    return vb.reshape(lead + setup.lat.dims)


def _block_orthonormalize(w: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Gram-Schmidt the nvec vectors within every block."""
    nvec = w.shape[0]
    ws = []
    for k in range(nvec):
        v = w[k]
        for j in range(len(ws)):
            c = jnp.einsum("scXxYyZzTt,scXxYyZzTt->XYZT",
                           jnp.conj(ws[j]), v)
            v = v - jnp.einsum("scXxYyZzTt,XYZT->scXxYyZzTt", ws[j], c)
        n2 = jnp.einsum("scXxYyZzTt,scXxYyZzTt->XYZT", jnp.conj(v), v)
        inv = jax.lax.rsqrt(jnp.real(n2) + eps).astype(v.dtype)
        v = jnp.einsum("scXxYyZzTt,XYZT->scXxYyZzTt", v, inv)
        ws.append(v)
    return jnp.stack(ws)


def mg_setup(lat: Lattice, op: Callable, nvec: int = 8, bs: int = 2,
             relax_iters: int = 30, relax_step: float = 0.2,
             seed: int = 0, dtype=jnp.complex64,
             ns: int = 4, chiral: bool = False) -> MGSetup:
    """Adaptive setup: relax random vectors toward the near-null space
    of ``op`` (QEX wmgsetup analog), then block-orthonormalize.

    ``chiral=True`` (requires ns=4, chiral gamma basis): split each
    near-null vector into its two gamma5 chiralities before the block
    orthonormalization, so span(P) is gamma5-invariant and the coarse
    operator inherits gamma5-hermiticity (the production Wilson-MG
    construction; doubles the coarse dof per near-null vector)."""
    key = jax.random.PRNGKey(seed)
    shape = (nvec, ns, lat.nc) + lat.dims
    rdtype = jnp.finfo(dtype).dtype
    v = (jax.random.normal(key, shape, rdtype)
         + 1j * jax.random.normal(jax.random.fold_in(key, 1), shape,
                                  rdtype)).astype(dtype)

    def relax_one(vk):
        def body(i, x):
            x = x - relax_step * op(x)
            return x / jnp.sqrt(linalg.norm2(x)).astype(x.dtype)
        return jax.lax.fori_loop(0, relax_iters, body, vk)

    v = jax.vmap(relax_one)(v)
    if chiral:
        if ns != 4:
            raise ValueError("chiral splitting requires ns=4")
        # g5 = diag(1,1,-1,-1) (physics/wilson.py:55): upper/lower
        # spin doublets are the two chiralities
        v = jnp.concatenate([v.at[:, 2:].set(0), v.at[:, :2].set(0)])
    vb = jax.vmap(lambda x: _block_reshape(x, lat, bs))(v)
    w = _block_orthonormalize(vb)
    return MGSetup(lat, bs, w)


def coarse_op(setup: MGSetup, op: Callable) -> Callable:
    """Galerkin coarse operator D_c = R D P (matrix-free)."""
    def dc(c):
        return restrict(setup, op(prolong(setup, c)))
    return dc


def mg_preconditioner(setup: MGSetup, op: Callable, *,
                      smooth_iters: int = 2, smooth_step: float = 0.2,
                      coarse_iters: int = 8) -> Callable:
    """One two-grid cycle as a right preconditioner for GCR.

    pre-smooth (Richardson on the normal-ish direction), coarse GCR
    solve of D_c e = R r, prolong correction, post-smooth.
    """
    from ..solvers.gcr import gcr_solve
    dc = coarse_op(setup, op)

    def cycle(r):
        # pre-smooth: x ~ s*r steps of Richardson
        x = smooth_step * r
        for _ in range(smooth_iters - 1):
            x = x + smooth_step * (r - op(x))
        # coarse correction
        rc = restrict(setup, r - op(x))
        ec, _ = gcr_solve(dc, rc, r2req=1e-4, m=coarse_iters,
                          max_restarts=1)
        x = x + prolong(setup, ec)
        # post-smooth
        for _ in range(smooth_iters):
            x = x + smooth_step * (r - op(x))
        return x

    return cycle


def mg_solve(lat: Lattice, op: Callable, b: jax.Array, *,
             nvec: int = 8, bs: int = 2, r2req: float = 1e-10,
             m: int = 16, max_restarts: int = 50, seed: int = 0,
             setup: MGSetup | None = None):
    """Two-grid preconditioned GCR solve of op x = b
    (QEX wilsonmg.nim:58-104 pipeline)."""
    from ..solvers.gcr import gcr_solve
    if setup is None:
        setup = mg_setup(lat, op, nvec=nvec, bs=bs, seed=seed,
                         dtype=b.dtype, ns=b.shape[0])
    precon = mg_preconditioner(setup, op)
    x, stats = gcr_solve(op, b, precon=precon, r2req=r2req, m=m,
                         max_restarts=max_restarts)
    return x, stats, setup
