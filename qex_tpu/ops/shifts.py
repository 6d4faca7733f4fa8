"""Lattice shifts and parallel transport (full-lattice layout).

TPU-native replacement for QEX's shift machinery
(src/layout/shifts.nim:67-286 ``startSB/localSB/boundarySB``,
``Shifter``/``Transporter`` :440-533).

On a single device a shift is a pure ``jnp.roll`` over one of the
trailing lattice axes -- XLA compiles it to two contiguous slice copies.
Under ``shard_map`` (see :mod:`qex_tpu.parallel.halo`) the same call
sites use a ppermute-based halo exchange; the API here is the
single-device / globally-sharded reference semantics.

Sign convention (matches QEX ``Shifter(f, mu, +1)``):
``shift(f, mu, +1)[x] = f[x + mu]`` -- i.e. pull the value from the
forward neighbor, which is ``jnp.roll(f, -1, axis)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import linalg


def shift(f: jax.Array, mu: int, sign: int, nd: int | None = None,
          dist: int = 1) -> jax.Array:
    """Shifted field: result[x] = f[x + sign*dist*mu_hat] (periodic).

    Args:
      f: field whose trailing ``nd`` axes are the lattice.
      mu: lattice direction (0-based, x..t).
      sign: +1 pulls from forward neighbor, -1 from backward.
      nd: number of lattice dims; defaults to 4.
      dist: shift distance (Naik terms use 3, rectangles 2).
    """
    if nd is None:
        nd = 4
    axis = f.ndim - nd + mu
    return jnp.roll(f, -sign * dist, axis)


def transport(u_mu: jax.Array, f: jax.Array, mu: int, sign: int,
              nd: int | None = None) -> jax.Array:
    """Parallel transport of ``f`` through link field ``u_mu``.

    sign=+1: U_mu(x) f(x+mu)      (forward transport)
    sign=-1: U_mu(x-mu)^dag f(x-mu) (backward transport)

    QEX parity: ``Transporter`` usage ``t[mu] ^* g[nu]``
    (src/examples/ex1.nim:8-14).
    Works for both matrix-valued and vector-valued ``f``.
    """
    matf = f.ndim == u_mu.ndim
    if sign > 0:
        fs = shift(f, mu, +1, nd)
        return linalg.mul(u_mu, fs) if matf else linalg.mv(u_mu, fs)
    y = linalg.mul_an(u_mu, f) if matf else linalg.mv_an(u_mu, f)
    return shift(y, mu, -1, nd)
