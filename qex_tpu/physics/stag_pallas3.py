"""Pallas eo staggered Dslash, v3: pre-shifted links + manual DMA pipeline.

Third-generation kernel (after stag_pallas v1 BlockSpec-streamed and the
slower grid-major v2).  Two structural changes over v1, both aimed at
the measured DMA-overlap limit (ROUND1.md):

1. **All links live at the output site.**  The backward hop
   ``B_mu(x-mu)^dag psi(x-mu)`` is rewritten with the pre-shifted,
   pre-adjointed link field ``C_mu(x) = B_mu(x-mu)^dag`` built once at
   setup, so

       out(x) = 1/2 sum_mu [ A_mu(x) psi(x+mu) - C_mu(x) psi(x-mu) ]

   needs exactly 8 current-site matrices per output site (the QEX flop
   model's 576 B/site, src/physics/stagD.nim:393) -- v1 streamed 10
   link planes (A, B and two B halo planes) and did 9 matvecs (two for
   the t-direction parity select).  Link HBM footprint doubles; traffic
   per application drops ~17%.

2. **Full-Z blocks + manual double-buffered link DMA.**  The grid is
   (Th,) with Z whole in-block, so z+-1 spinor neighbors are in-VMEM
   sublane rolls (v1 re-fetched two z-halo spinor blocks per step).
   Links are stored term-major ``(8, Th, 2, 3, 3, Z, YX)`` -- one
   CONTIGUOUS 2*9*Z*YX block per (term, th) -- kept in HBM
   (memory_space ANY) and streamed through a 2-slot VMEM scratch with
   explicit ``pltpu.make_async_copy`` double buffering, term k+1's copy
   in flight while term k computes.  v1 relied on Mosaic's automatic
   pipelining whose VMEM-pressured schedule left ~35% of the bandwidth
   idle.

Per-site traffic (f32): 8*72 links + 3*24 spinors (c, t-+1) + 24 out
= 672 B vs the 792 B flop-model -- the model roofline is beatable.
VMEM: 4 spinor/out blocks double-buffered + 2 link slots ~ 11 MB at
32^4 (YX=1024, Z=32).

Measured (v5e, 32^4, chain harness): f32 1.035 ms/app vs v1's 1.129;
the chip's PRACTICAL stream bandwidth measured only ~330-400 GB/s (not
the 819 GB/s spec), so the f32 kernel is bandwidth-bound at ~97% of
the measured-stream roofline; bf16 links 0.84 ms (VPU-bound: compute
alone is ~0.70 ms).  Extra DMA concurrency (nslots>2 OOMs VMEM,
nsplit sub-copies) does NOT help -- the hardware rate is the wall.

Semantics identical to stag_fast.dslash_fast / stag_pallas.dslash_pallas
(tested in tests/test_stag_fast.py on an interpreted CPU mesh).
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


def _term_major(g_split: jax.Array) -> jax.Array:
    """(2, 8, 3, 3, Th, Z, YX) -> (8, Th, 2, 3, 3, Z, YX) contiguous."""
    return jnp.transpose(g_split, (1, 4, 0, 2, 3, 5, 6))


def _adj(g: jax.Array) -> jax.Array:
    """Adjoint on the leading (nc, nc) axes of (nc, nc, Th, Z, YX)."""
    return jnp.conj(jnp.swapaxes(g, 0, 1))


@dataclasses.dataclass(frozen=True)
class PallasStagEO3:
    """v3 kernel operator: term-major pre-shifted split-complex links.

    l_e / l_o: (8, Th, 2, 3, 3, Z, YX) -- slots 0-3 = A_mu (forward,
    current-site links of the OUTPUT parity), slots 4-7 = C_mu
    (backward, source-parity links shifted -mu and adjointed).
    """

    lat: Lattice
    l_e: jax.Array
    l_o: jax.Array


def _build_links(lat: Lattice, g_out: jax.Array, g_src: jax.Array,
                 parity_out: int, dtype) -> jax.Array:
    """A_mu = +0.5 g_out[mu]; C_mu = -0.5 shift_-mu(adj(g_src[mu])).

    The 1/2 hopping normalization and the backward minus sign are
    folded into the stored links so the kernel is a pure sum of 8
    matvecs (saves ~60 VPU ops/site)."""
    cs = [sf.shift_fast(_adj(g_src[mu]), mu, -1, parity_out, lat)
          for mu in range(4)]
    l = jnp.concatenate([0.5 * g_out, -0.5 * jnp.stack(cs)])
    return _term_major(_split(l, dtype))


def fits(lat: Lattice, links_dtype=jnp.float32) -> bool:
    """True when the v3 kernel's constraints hold: full-Z blocks fit
    the 16 MB VMEM envelope (measured edge: 32^4 f32 = 15.7 MB incl.
    double buffering) AND the lane axis Y*X is 128-aligned (the manual
    HBM link-slice DMA requires lane-tile alignment; verified failure
    at YX=64/576).  Other volumes use stag_pallas (z-blocked v1)."""
    Z, YX = lat.dims[2], lat.dims[1] * lat.dims[0]
    lb = 2 if links_dtype == jnp.bfloat16 else 4
    # 2 link slots + 4 spinor/out blocks double-buffered
    need = 2 * (2 * 9 * Z * YX * lb) + 8 * (2 * 3 * Z * YX * 4)
    return (need <= 15_800_000 and lat.dims[3] % 2 == 0
            and YX % 128 == 0)


def new_pallas3(s, links_dtype=jnp.float32) -> PallasStagEO3:
    """From a StaggeredEO or FastStagEO (bf16 links = sloppy mode)."""
    if not isinstance(s, sf.FastStagEO):
        s = sf.new_fast(s)
    return PallasStagEO3(
        s.lat,
        _build_links(s.lat, s.g_e, s.g_o, 0, links_dtype),
        _build_links(s.lat, s.g_o, s.g_e, 1, links_dtype))


def _dslash3_kernel(X: int, parity_out: int, nslots: int, nsplit: int,
                    l_hbm, psi_c, psi_tm, psi_tp, out, lbuf, sem):
    """One th-slice of the eo Dslash; links hand-DMA'd term by term.

    Shapes: l_hbm (8, Th, 2, 3, 3, Z, YX) in HBM/ANY;
    psi_* / out (2, 3, 1, Z, YX) VMEM blocks;
    lbuf (nslots, 2, 3, 3, Z, YX) VMEM scratch;
    sem DMA((nslots, nsplit)).
    ``nslots``-deep link pipeline with each term's block copied as
    ``nsplit`` parallel sub-copies: a single v5e DMA stream tops out
    well below HBM bandwidth (measured ~350 GB/s), so concurrency must
    come from multiple outstanding copies; more full slots OOM the
    16 MB VMEM, sub-splitting adds streams for free.
    """
    th = pl.program_id(0)
    Z, YX = out.shape[-2], out.shape[-1]

    xg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) % X
    yg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) // X
    zg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 0)
    s_par = ((parity_out + xg + yg + zg) % 2) == 1

    def dmas(term, buf):
        """nsplit parallel sub-copies of one (term, th) link block,
        split along the 3x3 row axis (contiguous src runs)."""
        if nsplit == 1:
            return [pltpu.make_async_copy(l_hbm.at[term, th],
                                          lbuf.at[buf], sem.at[buf, 0])]
        assert 3 % nsplit == 0 or nsplit == 3, "nsplit must divide 3"
        k = 3 // nsplit
        return [
            pltpu.make_async_copy(
                l_hbm.at[term, th, :, pl.ds(s * k, k)],
                lbuf.at[buf, :, pl.ds(s * k, k)],
                sem.at[buf, s])
            for s in range(nsplit)]

    def cvec(ref):
        """(re, im) color planes of shape (Z, YX)."""
        return [(ref[0, c, 0], ref[1, c, 0]) for c in range(3)]

    def roll_pair(v, sh, axis=1):
        sh = sh % (YX if axis == 1 else Z)
        return tuple(pltpu.roll(x, sh, axis) for x in v)

    def sel_pair(mask, a, b):
        return tuple(jnp.where(mask, xa, xb) for xa, xb in zip(a, b))

    def shifted(term):
        """psi(x + mu) for term<4 (mu=term), psi(x - mu) for term>=4."""
        mu, fwd = term % 4, term < 4
        if mu == 0:
            if fwd:
                a = [roll_pair(v, -1) for v in psi]
                b = [roll_pair(v, X - 1) for v in psi]
                m = xg == X - 1
            else:
                a = [roll_pair(v, 1) for v in psi]
                b = [roll_pair(v, -(X - 1)) for v in psi]
                m = xg == 0
            return [sel_pair(m, bb, aa) for aa, bb in zip(a, b)]
        if mu == 1:
            return [roll_pair(v, -X if fwd else X) for v in psi]
        if mu == 2:
            return [roll_pair(v, -1 if fwd else 1, axis=0) for v in psi]
        if fwd:   # psi(x+t) = sel(s, psi[th+1], psi[th])
            return [sel_pair(s_par, p, c) for p, c in zip(psi_tp_v, psi)]
        #         psi(x-t) = sel(s, psi[th], psi[th-1])
        return [sel_pair(s_par, c, m) for c, m in zip(psi, psi_tm_v)]

    def matvec(buf, vec):
        res = []
        for a in range(3):
            rr = ri = None
            for b in range(3):
                ar = lbuf[buf, 0, a, b].astype(jnp.float32)
                ai = lbuf[buf, 1, a, b].astype(jnp.float32)
                vr, vi = vec[b]
                tr = ar * vr - ai * vi
                ti = ar * vi + ai * vr
                rr = tr if rr is None else rr + tr
                ri = ti if ri is None else ri + ti
            res.append((rr, ri))
        return res

    psi = cvec(psi_c)
    psi_tm_v = cvec(psi_tm)
    psi_tp_v = cvec(psi_tp)

    look = nslots - 1
    for k in range(min(look, 8)):
        for d in dmas(k, k % nslots):
            d.start()
    acc = None
    for term in range(8):
        if term + look < 8:
            for d in dmas(term + look, (term + look) % nslots):
                d.start()
        for d in dmas(term, term % nslots):
            d.wait()
        t = matvec(term % nslots, shifted(term))
        if acc is None:
            acc = t
        else:
            acc = [(ar + r, ai + i)
                   for (ar, ai), (r, i) in zip(acc, t)]

    for c in range(3):
        out[0, c, 0] = acc[c][0]
        out[1, c, 0] = acc[c][1]


def dslash_pallas3(s: PallasStagEO3, x_split: jax.Array, parity_out: int,
                   interpret: bool = False, nslots: int = 2,
                   nsplit: int = 1) -> jax.Array:
    """Apply the hopping term; x_split (2, 3, Th, Z, YX) f32 on the
    source parity; returns the same shape on ``parity_out``."""
    lat = s.lat
    X, Y, Z, T = lat.dims
    Th, YX = T // 2, Y * X
    l = s.l_e if parity_out == 0 else s.l_o

    spin = lambda im: pl.BlockSpec((2, 3, 1, Z, YX), im,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),                # links HBM
        spin(lambda th: (0, 0, th, 0, 0)),                   # psi_c
        spin(lambda th: (0, 0, (th - 1) % Th, 0, 0)),        # psi_tm
        spin(lambda th: (0, 0, (th + 1) % Th, 0, 0)),        # psi_tp
    ]
    out_spec = pl.BlockSpec((2, 3, 1, Z, YX),
                            lambda th: (0, 0, th, 0, 0),
                            memory_space=pltpu.VMEM)

    flops = 594 * (lat.volume // 2)
    lbytes = 2 if l.dtype == jnp.bfloat16 else 4
    bytes_acc = ((8 * 18 * lbytes + 4 * 24) * (lat.volume // 2))
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",))
    return pl.pallas_call(
        partial(_dslash3_kernel, X, parity_out, nslots, nsplit),
        grid=(Th,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 3, Th, Z, YX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, 3, 3, Z, YX), l.dtype),
            pltpu.SemaphoreType.DMA((nslots, nsplit)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(l, x_split, x_split, x_split)


def d2ee_pallas3(s: PallasStagEO3, x_e_split: jax.Array, m: float,
                 interpret: bool = False) -> jax.Array:
    t = dslash_pallas3(s, x_e_split, parity_out=1, interpret=interpret)
    y = dslash_pallas3(s, t, parity_out=0, interpret=interpret)
    return (m * m) * x_e_split - y


def d2dd_pallas3(s: PallasStagEO3, x_split: jax.Array, parity: int = 0,
                 interpret: bool = False) -> jax.Array:
    """Mass-free normal operator -D_eo D_oe on split-real vectors."""
    t = dslash_pallas3(s, x_split, parity_out=1 - parity,
                       interpret=interpret)
    return -dslash_pallas3(s, t, parity_out=parity, interpret=interpret)


def dslash_pallas3_c(s: PallasStagEO3, x: jax.Array, parity_out: int,
                     interpret: bool = False) -> jax.Array:
    """complex64 fast-layout wrapper."""
    return _join(dslash_pallas3(s, _split(x), parity_out,
                                interpret=interpret))
