"""Lattice device mesh and field shardings.

TPU-native replacement for QEX's rank-grid domain decomposition:
``partitionGeomF`` rank split (reference: src/layout/layoutX.nim:46-68),
QMP persistent halo channels (src/comms/qmp.nim:73-105), and ``qmpSum``
reductions (src/comms/commsQmp.nim:30-80).

Design (idiomatic TPU, not a port):

* The lattice's trailing ``nd`` axes are sharded over a
  ``jax.sharding.Mesh`` whose axes are named after lattice directions
  (``"x" "y" "z" "t"``).  The greedy prime-factor rank split of QEX
  becomes :func:`partition_geom` here, overridable exactly like QEX's
  ``-rankgeom:`` flag.
* Halo exchange is NOT hand-written for the jnp path: ``jnp.roll`` /
  slicing on sharded arrays lowers to XLA ``collective-permute`` over
  ICI automatically under ``jit`` (GSPMD propagation) -- the compiled
  collective schedule is the analog of QEX's persistent QMP channels.
  The explicit ``shard_map`` + ``ppermute`` path lives in
  :mod:`qex_tpu.parallel.halo` for kernels that want manual
  interior/boundary overlap.
* Global reductions (``norm2``/``dot`` inside CG) become XLA
  all-reduces with a deterministic tree order -- the ``qmpSum`` analog.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lattice import Lattice

AXIS_NAMES = ("ax0", "ax1", "ax2", "ax3", "ax4", "ax5", "ax6", "ax7")


def partition_geom(ndev: int, dims: Sequence[int]) -> tuple[int, ...]:
    """Greedy prime-factor split of ``ndev`` devices over lattice dims.

    QEX parity: ``partitionGeomF`` (layoutX.nim:46-68) -- repeatedly give
    the largest prime factor to the direction with the largest
    per-device extent that it divides.  Every local extent must stay
    even (even-odd packing needs it); prefers splitting later (t/z)
    axes on ties like QEX.
    """
    geom = [1] * len(dims)
    factors = []
    n = ndev
    p = 2
    while p * p <= n:
        while n % p == 0:
            factors.append(p)
            n //= p
        p += 1
    if n > 1:
        factors.append(n)
    for f in sorted(factors, reverse=True):
        # candidate axes: local extent divisible by f and result even
        best, best_local = -1, -1
        for i in reversed(range(len(dims))):
            local = dims[i] // geom[i]
            if local % f == 0 and (local // f) % 2 == 0:
                if local > best_local:
                    best, best_local = i, local
        if best < 0:
            raise ValueError(
                f"cannot partition lattice {tuple(dims)} over {ndev} devices")
        geom[best] *= f
    return tuple(geom)


@dataclasses.dataclass(frozen=True)
class LatticeMesh:
    """A lattice + its device mesh.

    ``mesh`` axes are named ``ax0..ax{nd-1}`` matching lattice
    directions 0..nd-1 (x..t); direction mu's lattice axis is sharded
    over mesh axis ``ax{mu}``.
    """

    lat: Lattice
    mesh: Mesh

    @property
    def rank_geom(self) -> tuple[int, ...]:
        return tuple(self.mesh.shape[a] for a in self.mesh.axis_names)


def make_lattice_mesh(lat: Lattice, devices=None,
                      rank_geom: Sequence[int] | None = None) -> LatticeMesh:
    """Build a LatticeMesh over ``devices`` (default: all local devices).

    ``rank_geom`` overrides the automatic split (QEX ``-rankgeom:``).
    """
    if devices is None:
        devices = jax.devices()
    ndev = len(devices)
    if rank_geom is None:
        rank_geom = partition_geom(ndev, lat.dims)
    rank_geom = tuple(int(g) for g in rank_geom)
    if math.prod(rank_geom) != ndev:
        raise ValueError(f"rank_geom {rank_geom} != ndev {ndev}")
    dev_array = np.array(devices).reshape(rank_geom)
    mesh = Mesh(dev_array, AXIS_NAMES[: lat.nd])
    return LatticeMesh(lat, mesh)


def field_spec(lm: LatticeMesh, n_site_axes: int) -> P:
    """PartitionSpec for a field with ``n_site_axes`` leading tensor axes.

    Site-tensor (color/spin/direction) axes are replicated; lattice axes
    are sharded along the matching mesh axis.
    """
    nd = lm.lat.nd
    return P(*([None] * n_site_axes + list(lm.mesh.axis_names[:nd])))


def replicated_spec() -> P:
    return P()


def shard_field(lm: LatticeMesh, f: jax.Array,
                n_site_axes: int | None = None) -> jax.Array:
    """Place a field on the mesh with the canonical lattice sharding."""
    if n_site_axes is None:
        n_site_axes = f.ndim - lm.lat.nd
    sh = NamedSharding(lm.mesh, field_spec(lm, n_site_axes))
    return jax.device_put(f, sh)
