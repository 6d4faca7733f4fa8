"""Assembled coarse operator for the multigrid hierarchy.

The Galerkin coarse operator D_c = R D P applied matrix-free costs one
FINE Dslash per coarse matvec, so every K-cycle iteration at every
level re-touches the fine grid -- measured 3 orders of magnitude off
CGNE in wall-clock (exp_mg_ab.py round 5).  Production Wilson-MG
(the role of the reference's mg/ prototype,
/root/reference/src/mg/wilsonmg.nim:58-104) assembles the coarse
operator once at setup: aggregation over hypercubic blocks of a
nearest-neighbor fine operator yields a 9-point coarse stencil
("coarse links": one (nc_c, nc_c) matrix per site per offset), after
which coarse matvecs are 9 batched small matmuls on the tiny coarse
grid -- MXU-friendly and independent of the fine volume.

Assembly is by PROBING, so it is generic over any nearest-neighbor
operator (including an already-assembled coarse operator, which makes
deeper levels recursively cheap):

  * diagonal: 2 checkerboard probes per color -- the stencil reaches
    only distance-1 neighbors, which always sit on the opposite
    checkerboard, so outputs on the probe's own parity isolate the
    diagonal block exactly.
  * hops: per direction mu, probe colors supported on lattice lines
    x_mu == r (mod k) with k >= 3 a divisor of L_mu (k = 4 for the
    usual power-of-two extents): outputs at x_mu == r+1 receive ONLY
    the +mu hop from x_mu == r, outputs at r-1 only the -mu hop.
  * extent L_mu == 2: the +mu and -mu neighbors are the SAME site, so
    the probe yields (and the apply consumes) the merged hop matrix
    A+ + A- with a single shift.

All probes for one pattern run as one vmapped operator application
(chunked to bound memory).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CoarseStencil:
    """9-point stencil: diag (nc, nc, *dims); hops[i] = (plus, minus)
    each (nc, nc, *dims) for lattice axis axes[i]; minus is None for
    merged extent-2 axes; extent-1 axes are absent (folded into
    diag)."""

    diag: jax.Array
    hops: tuple     # ((plus, minus | None), ...) per listed axis
    axes: tuple     # lattice axis index of each hops entry

    def tree_flatten(self):
        leaves = [self.diag]
        spec = []
        for p, m in self.hops:
            leaves.append(p)
            spec.append(m is not None)
            if m is not None:
                leaves.append(m)
        return leaves, (tuple(spec), self.axes)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        spec, axes = aux
        it = iter(leaves)
        diag = next(it)
        hops = []
        for has_minus in spec:
            p = next(it)
            m = next(it) if has_minus else None
            hops.append((p, m))
        return cls(diag, tuple(hops), axes)


jax.tree_util.register_pytree_node(
    CoarseStencil,
    lambda s: s.tree_flatten(),
    CoarseStencil.tree_unflatten)


def _line_spacing(L: int) -> int:
    """Smallest divisor of L that is >= 3 (probe spacing along one
    axis); 0 signals the merged extent-2 case; -1 an extent-1 axis
    (x+mu == x == x-mu: the hops fold into the diagonal probe and the
    apply skips the axis)."""
    if L == 1:
        return -1
    if L == 2:
        return 0
    for k in range(3, L + 1):
        if L % k == 0:
            return k
    raise ValueError(f"cannot probe axis of extent {L}")


def apply_stencil(st: CoarseStencil, c: jax.Array) -> jax.Array:
    """y(x) = diag(x) c(x) + sum_mu A+_mu(x) c(x-mu) + A-_mu(x) c(x+mu)."""
    y = jnp.einsum("kl...,l...->k...", st.diag, c)
    for mu, (plus, minus) in zip(st.axes, st.hops):
        ax = 1 + mu
        y = y + jnp.einsum("kl...,l...->k...", plus,
                           jnp.roll(c, 1, axis=ax))
        if minus is not None:
            y = y + jnp.einsum("kl...,l...->k...", minus,
                               jnp.roll(c, -1, axis=ax))
    return y


def assemble_stencil(op: Callable, nc: int, dims, dtype,
                     batch: int = 16) -> CoarseStencil:
    """Probe the nearest-neighbor operator ``op`` acting on
    (nc, *dims) fields into an explicit :class:`CoarseStencil`.

    ``op`` is applied to ``nc * (2 + sum_mu k_mu)`` probe vectors in
    vmapped chunks of ``batch``."""
    nd = len(dims)
    dims = tuple(int(d) for d in dims)
    coords = jnp.meshgrid(*[jnp.arange(d) for d in dims],
                          indexing="ij")

    probes = []   # (mask, kind, mu, r) -- mask is a site mask
    cb = sum(coords) % 2
    for s in (0, 1):
        probes.append(((cb == s).astype(dtype), "diag", -1, s))
    spacings = []
    for mu in range(nd):
        k = _line_spacing(dims[mu])
        spacings.append(k)
        if k < 0:
            continue          # extent-1 axis: folded into the diagonal
        kk = k if k else 2
        for r in range(kk):
            probes.append(((coords[mu] % kk == r).astype(dtype),
                           "hop", mu, r))

    eye = jnp.eye(nc, dtype=dtype)
    vecs = jnp.stack([eye[l][(...,) + (None,) * nd] * mask
                      for (mask, *_r) in probes
                      for l in range(nc)])          # (npat*nc, nc, dims)
    vop = jax.vmap(op)
    outs = []
    for i in range(0, vecs.shape[0], batch):
        outs.append(vop(vecs[i:i + batch]))
    ys = jnp.concatenate(outs)                       # (npat*nc, nc, dims)

    zeros = jnp.zeros((nc, nc) + dims, dtype)
    diag = zeros
    plus = [zeros] * nd
    minus = [zeros] * nd
    for pi, (mask, kind, mu, r) in enumerate(probes):
        y = ys[pi * nc:(pi + 1) * nc]                # (l, k, dims)
        blk = jnp.transpose(y, (1, 0) + tuple(range(2, 2 + nd)))
        if kind == "diag":
            sel = (cb == r).astype(dtype)
            diag = diag + blk * sel
        else:
            kk = spacings[mu] if spacings[mu] else 2
            xmu = coords[mu]
            sel_p = (xmu % kk == (r + 1) % kk).astype(dtype)
            plus[mu] = plus[mu] + blk * sel_p
            if spacings[mu]:
                sel_m = (xmu % kk == (r - 1) % kk).astype(dtype)
                minus[mu] = minus[mu] + blk * sel_m
    hops = tuple((plus[mu], minus[mu] if spacings[mu] > 0 else None)
                 for mu in range(nd) if spacings[mu] >= 0)
    axes = tuple(mu for mu in range(nd) if spacings[mu] >= 0)
    return CoarseStencil(diag, hops, axes)
