"""Pallas eo staggered Dslash, v2: grid-major contiguous-block layout.

Variant of qex_tpu.physics.stag_pallas with arrays reordered so the
(th, z) grid axes LEAD: every block the pipeline streams is one fully
CONTIGUOUS region of HBM (v1's site-tensor-leading layout splits each
link block into 72 strided chunks).

Layouts (f32, leading re/im folded inside):
    links:   (Th, Z, 2, 4, 3, 3, YX)
    spinors: (Th, Z, 2, 3, YX)
Converters from the v1 split layout are provided; semantics identical
(tested against stag_fast).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lattice import Lattice
from . import stag_fast as sf
from .stag_pallas import _join, _split


def to_gridmajor_links(g_split: jax.Array) -> jax.Array:
    """(2, 4, 3, 3, Th, Z, YX) -> (Th, Z, 2, 4, 3, 3, YX)."""
    return jnp.transpose(g_split, (4, 5, 0, 1, 2, 3, 6))


def to_gridmajor_spinor(x_split: jax.Array) -> jax.Array:
    """(2, 3, Th, Z, YX) -> (Th, Z, 2, 3, YX)."""
    return jnp.transpose(x_split, (2, 3, 0, 1, 4))


def from_gridmajor_spinor(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (2, 3, 0, 1, 4))


@dataclasses.dataclass(frozen=True)
class PallasStagEO2:
    lat: Lattice
    g_e: jax.Array   # (Th, Z, 2, 4, 3, 3, YX) f32
    g_o: jax.Array


def new_pallas2(s) -> PallasStagEO2:
    if not isinstance(s, sf.FastStagEO):
        s = sf.new_fast(s)
    return PallasStagEO2(s.lat,
                         to_gridmajor_links(_split(s.g_e)),
                         to_gridmajor_links(_split(s.g_o)))


def _kernel(X: int, parity_out: int, nzb: int,
            psi_c, psi_zm, psi_zp, psi_tm, psi_tp,
            a_c, b_c, bz_zm, bt_tm, out):
    """Blocks: psi (1, nzb, 2, 3, YX); links (1, nzb, 2, 4, 3, 3, YX);
    bz/bt (1, nzb, 2, 1, 3, 3, YX); out (1, nzb, 2, 3, YX)."""
    yx = out.shape[-1]

    xg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) % X
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) // X

    def cvec(ref, zz):
        return [(ref[0, zz, 0, c:c + 1, :], ref[0, zz, 1, c:c + 1, :])
                for c in range(3)]

    def roll_pair(v, sh):
        sh = sh % yx
        return tuple(pltpu.roll(x, sh, 1) for x in v)

    def sel_pair(mask, a, b):
        return tuple(jnp.where(mask, xa, xb) for xa, xb in zip(a, b))

    def shift_x(vec, sign):
        if sign > 0:
            a = [roll_pair(v, -1) for v in vec]
            b = [roll_pair(v, X - 1) for v in vec]
            m = xg == X - 1
        else:
            a = [roll_pair(v, 1) for v in vec]
            b = [roll_pair(v, -(X - 1)) for v in vec]
            m = xg == 0
        return [sel_pair(m, bb, aa) for aa, bb in zip(a, b)]

    def shift_y(vec, sign):
        return [roll_pair(v, -sign * X) for v in vec]

    def matvec(lref, mu, vec, zz, adjoint=False):
        res = []
        for a in range(3):
            rr = ri = None
            for b in range(3):
                i, j = (b, a) if adjoint else (a, b)
                ar = lref[0, zz, 0, mu, i, j:j + 1, :]
                ai = lref[0, zz, 1, mu, i, j:j + 1, :]
                if adjoint:
                    ai = -ai
                vr, vi = vec[b]
                tr = ar * vr - ai * vi
                ti = ar * vi + ai * vr
                rr = tr if rr is None else rr + tr
                ri = ti if ri is None else ri + ti
            res.append((rr, ri))
        return res

    def axpy(acc, vec, sign=1.0):
        if acc is None:
            return [(sign * r, sign * i) for r, i in vec]
        return [(ar + sign * r, ai + sign * i)
                for (ar, ai), (r, i) in zip(acc, vec)]

    for zz in range(nzb):
        z_glob = pl.program_id(1) * nzb + zz
        s_par = ((parity_out + xg + yg + z_glob) % 2) == 1

        psi = cvec(psi_c, zz)
        acc = None
        acc = axpy(acc, matvec(a_c, 0, shift_x(psi, +1), zz))
        t = matvec(b_c, 0, psi, zz, adjoint=True)
        acc = axpy(acc, shift_x(t, -1), -1.0)

        acc = axpy(acc, matvec(a_c, 1, shift_y(psi, +1), zz))
        t = matvec(b_c, 1, psi, zz, adjoint=True)
        acc = axpy(acc, shift_y(t, -1), -1.0)

        psi_zp_v = (cvec(psi_c, zz + 1) if zz + 1 < nzb
                    else cvec(psi_zp, 0))
        psi_zm_v = (cvec(psi_c, zz - 1) if zz - 1 >= 0
                    else cvec(psi_zm, nzb - 1))
        if zz - 1 >= 0:
            bz_ref, bz_mu, bz_zz = b_c, 2, zz - 1
        else:
            bz_ref, bz_mu, bz_zz = bz_zm, 0, nzb - 1
        acc = axpy(acc, matvec(a_c, 2, psi_zp_v, zz))
        t = matvec(bz_ref, bz_mu, psi_zm_v, bz_zz, adjoint=True)
        acc = axpy(acc, t, -1.0)

        psi_tp_v = cvec(psi_tp, zz)
        psi_tm_v = cvec(psi_tm, zz)
        fwd_t = [sel_pair(s_par, p, c) for p, c in zip(psi_tp_v, psi)]
        acc = axpy(acc, matvec(a_c, 3, fwd_t, zz))
        t_cur = matvec(b_c, 3, psi, zz, adjoint=True)
        t_tm = matvec(bt_tm, 0, psi_tm_v, zz, adjoint=True)
        bwd_t = [sel_pair(s_par, c, m) for c, m in zip(t_cur, t_tm)]
        acc = axpy(acc, bwd_t, -1.0)

        for c in range(3):
            out[0, zz, 0, c:c + 1, :] = 0.5 * acc[c][0]
            out[0, zz, 1, c:c + 1, :] = 0.5 * acc[c][1]


def dslash_pallas2(s: PallasStagEO2, x_gm: jax.Array, parity_out: int,
                   nzb: int = 8, interpret: bool = False) -> jax.Array:
    """x_gm: (Th, Z, 2, 3, YX) f32 grid-major spinor on the source
    parity; returns same-shape output on ``parity_out``."""
    lat = s.lat
    X, Y, Z, T = lat.dims
    Th = T // 2
    YX = Y * X
    if Z % nzb != 0:
        nzb = 1
    a = s.g_e if parity_out == 0 else s.g_o
    b = s.g_o if parity_out == 0 else s.g_e
    nz = Z // nzb

    spin = lambda im: pl.BlockSpec((1, nzb, 2, 3, YX), im,
                                   memory_space=pltpu.VMEM)
    link = lambda im: pl.BlockSpec((1, nzb, 2, 4, 3, 3, YX), im,
                                   memory_space=pltpu.VMEM)
    link1 = lambda im: pl.BlockSpec((1, nzb, 2, 1, 3, 3, YX), im,
                                    memory_space=pltpu.VMEM)

    grid = (Th, nz)
    in_specs = [
        spin(lambda th, z: (th, z, 0, 0, 0)),
        spin(lambda th, z: (th, (z - 1) % nz, 0, 0, 0)),
        spin(lambda th, z: (th, (z + 1) % nz, 0, 0, 0)),
        spin(lambda th, z: ((th - 1) % Th, z, 0, 0, 0)),
        spin(lambda th, z: ((th + 1) % Th, z, 0, 0, 0)),
        link(lambda th, z: (th, z, 0, 0, 0, 0, 0)),
        link(lambda th, z: (th, z, 0, 0, 0, 0, 0)),
        link1(lambda th, z: (th, (z - 1) % nz, 0, 0, 0, 0, 0)),
        link1(lambda th, z: ((th - 1) % Th, z, 0, 0, 0, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, nzb, 2, 3, YX),
                            lambda th, z: (th, z, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    flops = 594 * (lat.volume // 2)
    bytes_acc = (8 * 72 + 8 * 24 + 24) * (lat.volume // 2)
    return pl.pallas_call(
        partial(_kernel, X, parity_out, nzb),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Th, Z, 2, 3, YX), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
    )(x_gm, x_gm, x_gm, x_gm, x_gm, a, b,
      b[:, :, :, 2:3], b[:, :, :, 3:4])


def d2ee_pallas2(s: PallasStagEO2, x_gm: jax.Array, m: float,
                 interpret: bool = False) -> jax.Array:
    t = dslash_pallas2(s, x_gm, parity_out=1, interpret=interpret)
    y = dslash_pallas2(s, t, parity_out=0, interpret=interpret)
    return (m * m) * x_gm - y
