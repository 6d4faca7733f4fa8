"""TPU-optimized even-odd staggered operator (lane-packed layout).

Performance-tuned variant of qex_tpu.physics.staggered for the solver
hot path (the role of QEX's SIMD-specialized stagD kernels,
src/physics/stagD.nim:200-396, re-thought for TPU vector layout):

* Canonical eo layout (nc, X, Y, Z, Th) leaves the minor axis at
  Th = T/2 (e.g. 16), filling only 16 of 128 vector lanes.  Here the
  array is stored as (nc, Th, Z, Y*X): the minor axis is Y*X (e.g.
  1024 = 8 full lane tiles), giving full lane utilization -- measured
  2.9x faster at 32^4 on TPU v5e (benchx.py).
* x-shifts become a lane roll plus a boundary-column select;
  y-shifts a lane roll by X; z/t-shifts stay major-axis rolls
  (t with the eo parity select).

``FastStagEO`` converts from the canonical operator once; ``to_fast``/
``from_fast`` convert vectors.  Semantics are bit-identical to
qex_tpu.physics.staggered (tested in tests/test_stag_fast.py).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..lattice import Lattice
from . import staggered as st


def to_fast(v: jax.Array, lat: Lattice) -> jax.Array:
    """(…, X, Y, Z, Th) -> (…, Th, Z, Y*X)."""
    X, Y, Z = lat.dims[0], lat.dims[1], lat.dims[2]
    nlead = v.ndim - 4
    perm = tuple(range(nlead)) + (nlead + 3, nlead + 2, nlead + 1, nlead)
    vt = jnp.transpose(v, perm)
    return vt.reshape(vt.shape[:nlead] + (vt.shape[nlead],
                                          Z, Y * X))


def from_fast(v: jax.Array, lat: Lattice) -> jax.Array:
    """(…, Th, Z, Y*X) -> (…, X, Y, Z, Th)."""
    X, Y = lat.dims[0], lat.dims[1]
    nlead = v.ndim - 3
    vt = v.reshape(v.shape[:nlead] + (v.shape[nlead], v.shape[nlead + 1],
                                      Y, X))
    perm = tuple(range(nlead)) + (nlead + 3, nlead + 2, nlead + 1, nlead)
    return jnp.transpose(vt, perm)


@dataclasses.dataclass(frozen=True)
class FastStagEO:
    """Lane-packed eo staggered operator data."""

    lat: Lattice
    g_e: jax.Array   # (nd, nc, nc, Th, Z, Y*X)
    g_o: jax.Array


def new_fast(s: st.StaggeredEO) -> FastStagEO:
    lat = s.lat
    if lat.nd != 4:
        raise ValueError("fast path requires nd=4")
    return FastStagEO(lat, to_fast(s.g_e, lat), to_fast(s.g_o, lat))


def _coords(lat: Lattice):
    X, Y, Z = lat.dims[0], lat.dims[1], lat.dims[2]
    yx = jax.lax.broadcasted_iota(jnp.int32, (Z, Y * X), 1)
    zg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y * X), 0)
    return yx % X, yx // X, zg


def shift_fast(f: jax.Array, mu: int, sign: int, parity_out: int,
               lat: Lattice) -> jax.Array:
    """Nearest-neighbor eo shift in the fast layout (dist=1)."""
    X = lat.dims[0]
    if mu == 0:       # x: lane roll + boundary-column wrap fix
        xg, _, _ = _coords(lat)
        if sign > 0:
            a = jnp.roll(f, -1, -1)
            b = jnp.roll(f, X - 1, -1)
            return jnp.where(xg == X - 1, b, a)
        a = jnp.roll(f, 1, -1)
        b = jnp.roll(f, -(X - 1), -1)
        return jnp.where(xg == 0, b, a)
    if mu == 1:       # y: lane roll by X (periodic in y exactly, since
        return jnp.roll(f, -sign * X, -1)  # the minor axis is (y,x))
    if mu == 2:       # z
        return jnp.roll(f, -sign, -2)
    # t: parity-dependent select between th and th+-1
    xg, yg, zg = _coords(lat)
    s = ((parity_out + xg + yg + zg) % 2).astype(bool)
    if sign > 0:
        base, extra = f, jnp.roll(f, -1, -3)
    else:
        base, extra = jnp.roll(f, 1, -3), f
    return jnp.where(s, extra, base)


def dslash_fast(s: FastStagEO, x_src: jax.Array, parity_out: int
                ) -> jax.Array:
    """Hopping term in the fast layout (same math as
    staggered.dslash_eo)."""
    g_out = s.g_e if parity_out == 0 else s.g_o
    g_src = s.g_o if parity_out == 0 else s.g_e
    out = None
    for mu in range(4):
        fwd = jnp.einsum("ab...,b...->a...", g_out[mu],
                         shift_fast(x_src, mu, +1, parity_out, s.lat))
        tmp = jnp.einsum("ba...,b...->a...", jnp.conj(g_src[mu]), x_src)
        bwd = shift_fast(tmp, mu, -1, parity_out, s.lat)
        term = fwd - bwd
        out = term if out is None else out + term
    return 0.5 * out


def d2ee_fast(s: FastStagEO, x_e: jax.Array, m: float) -> jax.Array:
    t = dslash_fast(s, x_e, parity_out=1)
    y = dslash_fast(s, t, parity_out=0)
    return (m * m) * x_e - y
