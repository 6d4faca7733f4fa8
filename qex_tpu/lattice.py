"""Lattice geometry descriptor.

TPU-native replacement for QEX's ``Layout[V]`` (reference:
src/layout/layoutTypes.nim:89-111, src/layout/layoutX.nim:171-190).

Design notes (why this is NOT a port):

* QEX splits the lattice three ways: MPI rank grid x outer sites x SIMD
  inner sub-lattice, with per-site index maps cached in a Layout object.
  On TPU, XLA owns vectorization and ``jax.sharding`` owns the device
  split, so ``Lattice`` is a tiny frozen dataclass holding only the global
  geometry.  Fields are plain ``jnp.ndarray``s whose *trailing* ``nd``
  axes are the lattice axes, ordered ``(x, y, z, t)`` -- the last axis (t)
  lands on TPU lanes and the second-to-last on sublanes, so all site-local
  color algebra compiles to fused full-plane VPU ops.
* Site tensor indices (color/spin) are *leading* axes: a gauge field is
  ``(nd, nc, nc, *dims)``, a color vector ``(nc, *dims)``.  This
  structure-of-arrays layout is the TPU analog of QEX's SIMD inner
  lattice (src/layout/layoutX.nim:19-44): each color component is a
  contiguous lattice volume, so stencil shifts are pure ``jnp.roll`` and
  arithmetic vectorizes over the whole volume.
* Even-odd checkerboarding (fundamental in QEX,
  src/layout/layoutTypes.nim:98-104) is kept *explicitly* via
  :mod:`qex_tpu.ops.eo`, packing parity along the t axis.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class Lattice:
    """Global lattice geometry.

    Args:
      dims: lattice extents ordered ``(x, y, z, t)`` (any nd >= 1).
      nc: number of colors (default 3).
    """

    dims: tuple[int, ...]
    nc: int = 3

    def __init__(self, dims: Sequence[int], nc: int = 3):
        object.__setattr__(self, "dims", tuple(int(d) for d in dims))
        object.__setattr__(self, "nc", int(nc))

    @property
    def nd(self) -> int:
        return len(self.dims)

    @property
    def volume(self) -> int:
        return math.prod(self.dims)

    def axis(self, mu: int) -> int:
        """Array axis (negative) of lattice direction ``mu`` in any field.

        Lattice axes are always the trailing ``nd`` axes, in order:
        direction 0 (x) -> axis ``-nd``, direction nd-1 (t) -> axis ``-1``.
        """
        if not 0 <= mu < self.nd:
            raise ValueError(f"direction {mu} out of range for nd={self.nd}")
        return mu - self.nd

    # --- shapes -----------------------------------------------------------
    def gauge_shape(self) -> tuple[int, ...]:
        """(nd, nc, nc, *dims): one SU(nc) link matrix per site per direction."""
        return (self.nd, self.nc, self.nc) + self.dims

    def vector_shape(self) -> tuple[int, ...]:
        """(nc, *dims): staggered fermion / color vector field."""
        return (self.nc,) + self.dims

    def matrix_shape(self) -> tuple[int, ...]:
        return (self.nc, self.nc) + self.dims

    def real_shape(self) -> tuple[int, ...]:
        return self.dims

    def dirac_shape(self, ns: int = 4) -> tuple[int, ...]:
        """(ns, nc, *dims): Wilson fermion (spin x color)."""
        return (ns, self.nc) + self.dims

    def __repr__(self) -> str:  # pragma: no cover
        return f"Lattice(dims={list(self.dims)}, nc={self.nc})"
