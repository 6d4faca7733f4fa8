"""Pallas eo staggered Dslash, v4: v3's DMA pipeline + fused VPU work.

The v3 kernel (stag_pallas3) is bandwidth-bound in f32 but VPU-bound
with bf16 links (measured: compute alone 0.70 ms vs 0.42 ms DMA at
32^4) -- its VPU stream is dominated by per-plane Mosaic ops: 6
separate rolls/selects per neighbor shift (one per color x re/im) and
54 scalar multiply ops per matvec term.

v4 keeps v3's operator layout (PallasStagEO3: term-major pre-shifted
links, (8, Th, 2, 3, 3, Z, YX)) and its manual double-buffered link DMA
but restructures ALL vector work over fused (2, 3, Z, YX) arrays:

* one ``pltpu.roll`` / ``jnp.where`` per neighbor shift (6x fewer
  Mosaic ops than per-plane),
* the 3x3 complex matvec as 4 fused (3, 3, Z, YX) multiplies with
  broadcast + 2 adds + explicit b-sums, letting Mosaic schedule whole
  tiles instead of 54 scalar planes,
* bf16 links are promoted inside the multiply (no separate astype
  pass).

Reference flop model unchanged (src/physics/stagD.nim:393).
Semantics identical to stag_pallas3.dslash_pallas3 (tested in
tests/test_stag_pallas.py against the fast layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stag_pallas import _join, _split
from .stag_pallas3 import PallasStagEO3, fits, new_pallas3  # noqa: F401


def _dslash4_kernel(X: int, parity_out: int, nslots: int,
                    compute_only: bool,
                    l_hbm, psi_c, psi_tm, psi_tp, out, lbuf, sem):
    """One th-slice; links hand-DMA'd term by term, VPU work fused.

    Shapes: l_hbm (8, Th, 2, 3, 3, Z, YX) HBM; psi_*/out
    (2, 3, 1, Z, YX) VMEM; lbuf (nslots, 2, 3, 3, Z, YX) VMEM scratch.
    ``compute_only`` streams term 0's links for every term (divides link
    DMA by 8) -- diagnostic mode for isolating the VPU cost.
    """
    th = pl.program_id(0)
    Z, YX = out.shape[-2], out.shape[-1]

    xg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) % X
    zero = jnp.zeros((Z, YX), jnp.int32)
    yg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) // X
    zg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 0)
    s_par = (((parity_out + xg + yg + zg) % 2) == 1)[None, None]

    def dma(term, buf):
        src = 0 if compute_only else term
        return pltpu.make_async_copy(l_hbm.at[src, th], lbuf.at[buf],
                                     sem.at[buf])

    P = psi_c[:, :, 0]       # (2, 3, Z, YX) fused planes
    Ptm = psi_tm[:, :, 0]
    Ptp = psi_tp[:, :, 0]
    mask_xhi = (xg == X - 1)[None, None]
    mask_xlo = (xg == 0)[None, None]

    def shifted(term):
        """psi(x + mu) for term<4 (mu=term), psi(x - mu) for term>=4;
        one fused roll (+ one select for x/t) per term."""
        mu, fwd = term % 4, term < 4
        if mu == 0:
            if fwd:
                a = pltpu.roll(P, YX - 1, 3)     # x+1 within lanes
                b = pltpu.roll(P, X - 1, 3)      # wrap column x=X-1
                return jnp.where(mask_xhi, b, a)
            a = pltpu.roll(P, 1, 3)              # x-1
            b = pltpu.roll(P, YX - (X - 1), 3)   # wrap column x=0
            return jnp.where(mask_xlo, b, a)
        if mu == 1:
            return pltpu.roll(P, (YX - X) if fwd else X, 3)
        if mu == 2:
            return pltpu.roll(P, (Z - 1) if fwd else 1, 2)
        if fwd:   # psi(x+t) = sel(s, psi[th+1], psi[th])
            return jnp.where(s_par, Ptp, P)
        return jnp.where(s_par, P, Ptm)          # psi(x-t)

    def matvec(buf, v):
        """(2,3,Z,YX) result of the 3x3 complex matvec, fused per
        output color: (3,Z,YX) temporaries keep the kernel inside the
        16 MB VMEM scoped-stack limit (the fully-fused (3,3,Z,YX)
        version overflowed it by 2 MB at 32^4)."""
        vr, vi = v[0], v[1]                      # (3, Z, YX)
        outs_r, outs_i = [], []
        for a in range(3):
            Lr = lbuf[buf, 0, a]                 # (3, Z, YX)
            Li = lbuf[buf, 1, a]
            tr = Lr * vr - Li * vi
            ti = Lr * vi + Li * vr
            outs_r.append(tr[0] + tr[1] + tr[2])
            outs_i.append(ti[0] + ti[1] + ti[2])
        return jnp.stack([jnp.stack(outs_r), jnp.stack(outs_i)])

    look = nslots - 1
    for k in range(min(look, 8)):
        dma(k, k % nslots).start()
    acc = None
    for term in range(8):
        if term + look < 8:
            dma(term + look, (term + look) % nslots).start()
        dma(term, term % nslots).wait()
        t = matvec(term % nslots, shifted(term))
        acc = t if acc is None else acc + t

    out[:, :, 0] = acc


def dslash_pallas4(s: PallasStagEO3, x_split: jax.Array, parity_out: int,
                   interpret: bool = False, nslots: int = 2,
                   compute_only: bool = False) -> jax.Array:
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
        # fused (2,3,Z,YX) temporaries push the scoped-VMEM stack ~0.4MB
        # past the 16 MB default at 32^4; raise the cap (v5e physical
        # VMEM is larger; Mosaic accepts up to ~2x here)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_dslash4_kernel, X, parity_out, nslots, compute_only),
        grid=(Th,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 3, Th, Z, YX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, 3, 3, Z, YX), l.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(l, x_split, x_split, x_split)


def d2ee_pallas4(s: PallasStagEO3, x_e_split: jax.Array, m: float,
                 interpret: bool = False) -> jax.Array:
    t = dslash_pallas4(s, x_e_split, parity_out=1, interpret=interpret)
    y = dslash_pallas4(s, t, parity_out=0, interpret=interpret)
    return (m * m) * x_e_split - y


def d2dd_pallas4(s: PallasStagEO3, x_split: jax.Array, parity: int = 0,
                 interpret: bool = False) -> jax.Array:
    t = dslash_pallas4(s, x_split, parity_out=1 - parity,
                       interpret=interpret)
    return -dslash_pallas4(s, t, parity_out=parity, interpret=interpret)


def dslash_pallas4_c(s: PallasStagEO3, x: jax.Array, parity_out: int,
                     interpret: bool = False) -> jax.Array:
    """complex64 fast-layout wrapper."""
    return _join(dslash_pallas4(s, _split(x), parity_out,
                                interpret=interpret))
