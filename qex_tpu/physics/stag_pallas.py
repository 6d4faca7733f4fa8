"""Pallas TPU kernel for the even-odd staggered Dslash.

The performance north star (BASELINE.md): a fused stencil kernel in the
lane-packed layout of qex_tpu.physics.stag_fast, replacing QEX's
SIMD+OpenMP interior loop (src/physics/stagD.nim:200-396).  One kernel
invocation computes, per (th, z) plane of 3 x Y*X complex sites,

    out(x) = 1/2 sum_mu [ A_mu(x) psi(x+mu) - B_mu(x-mu)^dag psi(x-mu) ]

with all 8 gathers fused:
  * x/y shifts: in-register lane rolls (plus the x boundary-column fix)
  * z shifts:   neighbor planes streamed in via BlockSpec index maps
  * t shifts:   the eo parity select between th and th+-1 planes

Complex storage: a leading re/im axis of 2 on every array (float32
planes) -- TPU-native layout with full (8, 128) tiling on the trailing
(Z-block, Y*X) dims.

VMEM per program ~ 1 MB (5 spinor planes + 4+4 link planes + halos).
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


def _split(v: jax.Array, dtype=jnp.float32) -> jax.Array:
    """complex (…,) -> real (2, …) planes (f32 or bf16 for links)."""
    return jnp.stack([jnp.real(v), jnp.imag(v)]).astype(dtype)


def _join(v: jax.Array) -> jax.Array:
    return (v[0] + 1j * v[1]).astype(jnp.complex64)


@dataclasses.dataclass(frozen=True)
class PallasStagEO:
    """Kernel-ready eo operator: split-complex lane-packed links."""

    lat: Lattice
    g_e: jax.Array   # (2, 4, 3, 3, Th, Z, YX) f32
    g_o: jax.Array


def new_pallas(s, links_dtype=jnp.float32) -> PallasStagEO:
    """From a StaggeredEO or FastStagEO.

    ``links_dtype=jnp.bfloat16`` halves the dominant link traffic
    (576 -> 288 B/site) for sloppy inner solves; pair with f32
    true-residual restarts (cg_solve_restarted op_true) for full
    accuracy -- the reference's sloppySolve/mixed-precision knob
    (solverBase.nim sloppySolve; BASELINE.md bf16 experiments).
    """
    if not isinstance(s, sf.FastStagEO):
        s = sf.new_fast(s)
    return PallasStagEO(s.lat, _split(s.g_e, links_dtype),
                        _split(s.g_o, links_dtype))


def _dslash_kernel(X: int, parity_out: int, nzb: int,
                   psi_c, psi_zm, psi_zp, psi_tm, psi_tp,
                   a_c, b_c, bz_zm, bt_tm, out):
    """One (th, z-block) plane of the eo Dslash.

    Block shapes (leading re/im axis RI=2):
      psi_*: (2, 3, 1, nzb(+?), YX) -> indexed [ri, c, 0, zz, :]
      a_c/b_*: (2, 4, 3, 3, 1, nzb, YX)
      out: (2, 3, 1, nzb, YX)
    """
    th = pl.program_id(0)
    yx = a_c.shape[-1]

    xg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) % X
    yxg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1)
    yg = yxg // X

    def cvec(ref, zz):
        """Load color vector from a spinor ref plane zz -> list of
        (re, im) pairs of shape (1, yx)."""
        return [(ref[0, c, :, zz], ref[1, c, :, zz]) for c in range(3)]

    def roll_pair(v, sh):
        sh = sh % yx   # pltpu.roll requires non-negative shifts
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
        """(A v) or (A^dag v) with A = lref[:, mu, :, :, 0, zz]."""
        res = []
        for a in range(3):
            rr = None
            ri = None
            for b in range(3):
                if adjoint:
                    ar = lref[0, mu, b, a, :, zz].astype(jnp.float32)
                    ai = -lref[1, mu, b, a, :, zz].astype(jnp.float32)
                else:
                    ar = lref[0, mu, a, b, :, zz].astype(jnp.float32)
                    ai = lref[1, mu, a, b, :, zz].astype(jnp.float32)
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

        # mu = 0 (x)
        acc = axpy(acc, matvec(a_c, 0, shift_x(psi, +1), zz))
        t = matvec(b_c, 0, psi, zz, adjoint=True)
        acc = axpy(acc, shift_x(t, -1), -1.0)

        # mu = 1 (y)
        acc = axpy(acc, matvec(a_c, 1, shift_y(psi, +1), zz))
        t = matvec(b_c, 1, psi, zz, adjoint=True)
        acc = axpy(acc, shift_y(t, -1), -1.0)

        # mu = 2 (z): fwd needs psi(z+1); bwd needs (B^dag psi)(z-1)
        # neighbor planes: within the z-block when possible, else the
        # LAST plane of the z-1 block / FIRST plane of the z+1 block
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

        # mu = 3 (t): fwd = select(s, psi_tp, psi_c);
        #             bwd = select(s, B_t[th]^dag psi_c,
        #                             B_t[th-1]^dag psi_tm)
        psi_tp_v = cvec(psi_tp, zz)
        psi_tm_v = cvec(psi_tm, zz)
        fwd_t = [sel_pair(s_par, p, c)
                 for p, c in zip(psi_tp_v, psi)]
        acc = axpy(acc, matvec(a_c, 3, fwd_t, zz))
        t_cur = matvec(b_c, 3, psi, zz, adjoint=True)
        t_tm = matvec(bt_tm, 0, psi_tm_v, zz, adjoint=True)
        bwd_t = [sel_pair(s_par, c, m) for c, m in zip(t_cur, t_tm)]
        acc = axpy(acc, bwd_t, -1.0)

        for c in range(3):
            out[0, c, :, zz] = 0.5 * acc[c][0]
            out[1, c, :, zz] = 0.5 * acc[c][1]


def dslash_pallas(s: PallasStagEO, x_split: jax.Array, parity_out: int,
                  nzb: int = 8, interpret: bool = False) -> jax.Array:
    """Apply the hopping term; x_split is (2, 3, Th, Z, YX) f32 on the
    source parity; returns same-shape output on ``parity_out``."""
    lat = s.lat
    X, Y, Z, T = lat.dims
    Th = T // 2
    YX = Y * X
    if Z % nzb != 0:
        nzb = 1
    a = s.g_e if parity_out == 0 else s.g_o
    b = s.g_o if parity_out == 0 else s.g_e

    nz = Z // nzb
    spin = lambda im: pl.BlockSpec((2, 3, 1, nzb, YX), im,
                                   memory_space=pltpu.VMEM)
    link = lambda im: pl.BlockSpec((2, 4, 3, 3, 1, nzb, YX), im,
                                   memory_space=pltpu.VMEM)
    link1 = lambda im: pl.BlockSpec((2, 1, 3, 3, 1, nzb, YX), im,
                                    memory_space=pltpu.VMEM)

    grid = (Th, nz)
    in_specs = [
        spin(lambda th, z: (0, 0, th, z, 0)),                  # psi_c
        spin(lambda th, z: (0, 0, th, (z - 1) % nz, 0)),       # psi_zm
        spin(lambda th, z: (0, 0, th, (z + 1) % nz, 0)),       # psi_zp
        spin(lambda th, z: (0, 0, (th - 1) % Th, z, 0)),       # psi_tm
        spin(lambda th, z: (0, 0, (th + 1) % Th, z, 0)),       # psi_tp
        link(lambda th, z: (0, 0, 0, 0, th, z, 0)),            # a_c
        link(lambda th, z: (0, 0, 0, 0, th, z, 0)),            # b_c
        link1(lambda th, z: (0, 0, 0, 0, th, (z - 1) % nz, 0)),  # bz_zm
        link1(lambda th, z: (0, 0, 0, 0, (th - 1) % Th, z, 0)),  # bt_tm
    ]
    out_spec = pl.BlockSpec((2, 3, 1, nzb, YX),
                            lambda th, z: (0, 0, th, z, 0),
                            memory_space=pltpu.VMEM)

    flops = 594 * (lat.volume // 2)
    bytes_acc = (8 * 72 + 8 * 24 + 24) * (lat.volume // 2)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"))
    return pl.pallas_call(
        partial(_dslash_kernel, X, parity_out, nzb),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 3, Th, Z, YX), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(x_split, x_split, x_split, x_split, x_split, a, b,
      b[:, 2:3], b[:, 3:4])


def d2ee_pallas(s: PallasStagEO, x_e_split: jax.Array, m: float,
                interpret: bool = False) -> jax.Array:
    t = dslash_pallas(s, x_e_split, parity_out=1, interpret=interpret)
    y = dslash_pallas(s, t, parity_out=0, interpret=interpret)
    return (m * m) * x_e_split - y


def dslash_pallas_c(s: PallasStagEO, x: jax.Array, parity_out: int,
                    interpret: bool = False) -> jax.Array:
    """complex64 fast-layout wrapper."""
    return _join(dslash_pallas(s, _split(x), parity_out,
                               interpret=interpret))
