"""Even-odd (checkerboard) packing of lattice fields.

TPU-native replacement for QEX's even-odd layout machinery
(src/layout/layoutTypes.nim:98-118 ``nEven/nOdd/Subset``,
src/layout/qlayout.nim:26-63 inner checkerboard).

QEX orders sites even-then-odd inside one allocation; here a packed field
is an explicit pair of arrays ``(even, odd)``, each with the t extent
halved:  ``packed_P[..., x, y, z, th] = full[..., x, y, z, 2*th + s]``
with ``s = (P + x + y + z) mod 2`` and site parity
``P = (x + y + z + t) mod 2``.

Packing along **t** (the lane axis) keeps every x/y/z shift a plain
``jnp.roll`` of the opposite-parity array; only t shifts need a
parity-dependent select between two rolls.  This is the TPU analog of
QEX choosing the inner checkerboard direction so SIMD lanes stay
parity-coherent (qlayout.nim:26-63).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _s_mask(dims: tuple[int, ...], parity: int) -> jax.Array:
    """s = (parity + x + y + z + ...) mod 2, shape dims[:-1] + (1,).

    The t-sublattice offset of each packed site: full-lattice
    ``t = 2*th + s``.
    """
    nd = len(dims)
    s = jnp.zeros((), jnp.int32) + parity
    for i, d in enumerate(dims[:-1]):
        shape = [1] * nd
        shape[i] = d
        coord = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), i)
        s = s + coord
    s = s % 2
    # broadcast over the packed-t axis
    return jnp.broadcast_to(s, dims[:-1] + (1,))


def pack(f: jax.Array, nd: int) -> tuple[jax.Array, jax.Array]:
    """Split a full-lattice field into (even, odd) packed halves."""
    dims = f.shape[-nd:]
    if dims[-1] % 2 != 0:
        raise ValueError("t extent must be even for eo packing")
    th = dims[-1] // 2
    r = f.reshape(f.shape[:-1] + (th, 2))  # [..., th, c] = full t = 2*th + c
    out = []
    for parity in (0, 1):
        s = _s_mask(dims, parity)  # dims[:-1] + (1,)
        sel = jnp.where(s.astype(bool), r[..., 1], r[..., 0])
        out.append(sel)
    return out[0], out[1]


def unpack(even: jax.Array, odd: jax.Array, nd: int) -> jax.Array:
    """Inverse of :func:`pack`."""
    dims_h = even.shape[-nd:]
    dims = dims_h[:-1] + (2 * dims_h[-1],)
    s0 = _s_mask(dims, 0).astype(bool)  # where even sites sit at t%2==1
    # r[..., th, c]: c == s(parity) selects that parity's value
    c1 = jnp.where(s0, even, odd)   # sites with t%2 == 1: even if s0 else odd
    c0 = jnp.where(s0, odd, even)
    r = jnp.stack([c0, c1], axis=-1)
    return r.reshape(r.shape[:-2] + (dims[-1],))


def shift_eo(f_src: jax.Array, mu: int, sign: int, parity_out: int,
             nd: int, dist: int = 1) -> jax.Array:
    """Shifted packed field: result on ``parity_out`` sites.

    ``result[x] = f_src[x + sign*dist*mu_hat]`` where ``f_src`` is the
    packed field on the source parity ``parity_out ^ (dist & 1)``.

    QEX parity: per-(direction, distance, subset) gather metadata
    ``ShiftIndicesQ`` (src/layout/layoutTypes.nim:43-72) -- here the
    gather collapses to rolls plus (for t shifts with odd distance) one
    parity-mask select.
    """
    if dist < 0:
        raise ValueError("dist must be positive; flip sign instead")
    axis = f_src.ndim - nd + mu
    if mu != nd - 1:
        # non-t direction: packed t-coordinate is unchanged
        return jnp.roll(f_src, -sign * dist, axis)
    dims_h = f_src.shape[-nd:]
    if dist % 2 == 0:
        # same-parity shift: t +/- dist  ->  th +/- dist/2
        return jnp.roll(f_src, -sign * (dist // 2), axis)
    # odd-distance t shift: th' = th + (dist-1)/2 + s   (forward)
    #                       th' = th - (dist+1)/2 + s   (backward)
    # with s = (parity_out + x + y + z) mod 2 of the *output* site.
    s = _s_mask(dims_h, parity_out).astype(bool)
    if sign > 0:
        base = jnp.roll(f_src, -((dist - 1) // 2), axis)
        extra = jnp.roll(base, -1, axis)
        return jnp.where(s, extra, base)
    base = jnp.roll(f_src, (dist + 1) // 2, axis)
    extra = jnp.roll(base, -1, axis)
    return jnp.where(s, extra, base)
