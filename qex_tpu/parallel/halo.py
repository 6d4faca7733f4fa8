"""Explicit shard_map + ppermute halo exchange.

TPU-native replacement for QEX's ShiftB halo pipeline
(src/layout/shifts.nim:67-286 startSB/localSB/boundarySB over QMP
persistent channels): under ``shard_map`` each device computes on its
local block and exchanges single-site faces with ``lax.ppermute`` over
the ICI mesh.

Two multi-chip paths coexist (SURVEY.md §5.8):
  * GSPMD (default): jit + NamedSharding; XLA inserts the
    collective-permutes automatically (qex_tpu.parallel.mesh).
  * This module: manual shard_map kernels for when explicit
    scheduling / per-shard Pallas composition is wanted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..lattice import Lattice
from ..ops import linalg
from .mesh import LatticeMesh, field_spec


def shift_halo(f: jax.Array, mu: int, sign: int, nd: int,
               axis_name: str, nmesh: int, dist: int = 1) -> jax.Array:
    """Local-block shift with ppermute face exchange.

    result[x] = f[x + sign*dist*mu_hat] globally; ``f`` is the local
    block inside shard_map; ``nmesh`` = devices along this direction.
    """
    axis = f.ndim - nd + mu
    if nmesh == 1 or dist == 0:
        return jnp.roll(f, -sign * dist, axis)
    n_local = f.shape[axis]
    if dist >= n_local:
        raise ValueError("halo depth >= local extent")
    rolled = jnp.roll(f, -sign * dist, axis)
    # the wrapped ``dist`` planes must come from the neighbor
    if sign > 0:
        face = jax.lax.slice_in_dim(f, 0, dist, axis=axis)
        perm = [(i, (i - 1) % nmesh) for i in range(nmesh)]
        start = n_local - dist
    else:
        face = jax.lax.slice_in_dim(f, n_local - dist, n_local,
                                    axis=axis)
        perm = [(i, (i + 1) % nmesh) for i in range(nmesh)]
        start = 0
    recv = jax.lax.ppermute(face, axis_name, perm)
    return jax.lax.dynamic_update_slice_in_dim(rolled, recv, start,
                                               axis=axis)


def dslash_full_sharded(lm: LatticeMesh, g: jax.Array, x: jax.Array
                        ) -> jax.Array:
    """Full-lattice staggered hopping term with explicit halos.

    ``g`` are phased links (nd, nc, nc, *dims); arrays may carry any
    sharding -- shard_map re-partitions per ``field_spec``.
    """
    lat = lm.lat
    nd = lat.nd
    mesh = lm.mesh
    names = mesh.axis_names
    sizes = [mesh.shape[a] for a in names]

    def kernel(g_loc, x_loc):
        out = None
        for mu in range(nd):
            xs = shift_halo(x_loc, mu, +1, nd, names[mu], sizes[mu])
            fwd = linalg.mv(g_loc[mu], xs)
            t = linalg.mv_an(g_loc[mu], x_loc)
            bwd = shift_halo(t, mu, -1, nd, names[mu], sizes[mu])
            term = fwd - bwd
            out = term if out is None else out + term
        return 0.5 * out

    spec_g = field_spec(lm, 3)
    spec_x = field_spec(lm, 1)
    fn = shard_map(kernel, mesh=mesh, in_specs=(spec_g, spec_x),
                   out_specs=spec_x)
    return fn(g, x)


def norm2_sharded(lm: LatticeMesh, x: jax.Array) -> jax.Array:
    """Global |x|^2 via per-shard sum + psum (the qmpSum analog)."""
    spec = field_spec(lm, x.ndim - lm.lat.nd)

    def kernel(x_loc):
        local = jnp.sum(jnp.abs(x_loc) ** 2)
        for name in lm.mesh.axis_names:
            local = jax.lax.psum(local, name)
        return local

    return shard_map(kernel, mesh=lm.mesh, in_specs=(spec,),
                     out_specs=P())(x)
