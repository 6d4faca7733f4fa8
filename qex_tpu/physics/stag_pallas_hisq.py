"""Pallas eo fat+naik (HISQ) Dslash: the 16-term stencil, fused.

TPU kernel for the QEX ``newStag3`` operator (the fat 1-hop + long
3-hop hopping term, /root/reference/src/physics/stagD.nim:543), the hot
operator of HISQ multishift solves (BASELINE.md config 5).

Design: the v3 pre-shifted-link trick (stag_pallas3) carried into the
v1 BlockSpec-streamed structure (stag_pallas):

* **All 16 link matrices live at the output site.**  With
  ``C_mu(x)  = fat_mu(x-mu)^dag`` and ``CL_mu(x) = long_mu(x-3mu)^dag``
  pre-shifted/adjointed at setup (signs and the 1/2 folded in),

      out(x) = sum_t L_t(x) psi(x + d_t)          (16 terms)

  is a pure sum of matvecs -- no in-kernel link shifts, no neighbor
  link blocks, no post-shift of matvec results.
* **BlockSpec streaming, not manual DMA.**  The v3 manual link DMA
  needs YX % 128 == 0 (fails at 24^3x48, YX=576); Mosaic's automatic
  pipeline has no such limit (blocks whose lane dim equals the array
  dim are always legal) and measured within ~10% of the manual
  pipeline at this arithmetic intensity.
* Grid (Th, Z/nzb).  x/y hops (dist 1 and 3) are lane rolls + boundary
  column selects; z hops index planes of the current/neighbor z blocks
  (requires nzb >= 3 when the z grid is split); t hops are the eo
  parity select over the th-1..th+2 streamed neighbor blocks (a
  3-hop in t moves th by 1 or 2 depending on the site's sublattice,
  exactly stag_fast.shift_fast dist=3).

Traffic/site (f32 links): 16*72 link + 7*24 streamed spinor inputs
(c, z+-1, t+-1, t+-2) + 24 out = 1344 B when z-blocked (nz > 1; the
z+-1 streams drop when one block covers all of Z, leaving 1296 B);
flops/site 16*66 + 15*6 + 6 = 1152 -- still bandwidth-bound,
so fusing all 16 terms (one pass over psi, no materialized shift
temporaries) is the whole win over the XLA fast layout, which emits
separate shifted copies per term.

VMEM: (16*18*lb + 8*24) * nzb * YX double-buffered; at 32^4/nzb=8 f32
that is ~22 MB, above the 16 MB *default* scoped-VMEM limit, so the
call sets ``vmem_limit_bytes=100MB`` (measured fine on v5e, CLAUDE.md
round-2 notes).

Semantics identical to stag_fast.dslash3_fast (tests/test_stag_pallas.py
interpret-mode equality).
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


def _adj(g: jax.Array) -> jax.Array:
    """Adjoint on the leading (nc, nc) axes of (nc, nc, Th, Z, YX)."""
    return jnp.conj(jnp.swapaxes(g, 0, 1))


@dataclasses.dataclass(frozen=True)
class PallasStag3EO:
    """Kernel-ready fat+naik operator: term-major pre-shifted links.

    l_e / l_o: (16, 2, 3, 3, Th, Z, YX); term t = kind*4 + mu with
    kind 0 = fat forward (+0.5 fat_mu at x), 1 = fat backward
    (-0.5 fat_mu(x-mu)^dag), 2 = long forward (+0.5 long_mu),
    3 = long backward (-0.5 long_mu(x-3mu)^dag).
    """

    lat: Lattice
    l_e: jax.Array
    l_o: jax.Array


def _build_links3(lat: Lattice, gf_out, gf_src, gl_out, gl_src,
                  parity_out: int, dtype) -> jax.Array:
    c1 = [sf.shift_fast(_adj(gf_src[mu]), mu, -1, parity_out, lat)
          for mu in range(4)]
    c3 = [sf.shift_fast(_adj(gl_src[mu]), mu, -1, parity_out, lat,
                        dist=3) for mu in range(4)]
    l = jnp.concatenate([0.5 * gf_out, -0.5 * jnp.stack(c1),
                         0.5 * gl_out, -0.5 * jnp.stack(c3)])
    # (2, 16, 3, 3, Th, Z, YX) -> (16, 2, 3, 3, Th, Z, YX)
    return jnp.swapaxes(_split(l, dtype), 0, 1)


def new_pallas_hisq(s, links_dtype=jnp.float32) -> PallasStag3EO:
    """From a staggered.Staggered3EO or stag_fast.FastStag3EO."""
    if not isinstance(s, sf.FastStag3EO):
        s = sf.new_fast3(s)
    return PallasStag3EO(
        s.lat,
        _build_links3(s.lat, s.gf_e, s.gf_o, s.gl_e, s.gl_o, 0,
                      links_dtype),
        _build_links3(s.lat, s.gf_o, s.gf_e, s.gl_o, s.gl_e, 1,
                      links_dtype))


def new_pallas_stag8(s, links_dtype=jnp.float32) -> PallasStag3EO:
    """8-term PLAIN staggered operator in the same streamed kernel
    structure (naik terms absent; the kernel infers the term count
    from the link array's leading axis).  Alternative to
    stag_pallas3's manual-DMA v3: no YX % 128 or full-Z VMEM-fit
    constraint, and the z-vectorized term loop converts bf16 links
    cheaply enough that the bf16 variant WINS (v3's is VPU-bound)."""
    if not isinstance(s, sf.FastStagEO):
        s = sf.new_fast(s)

    def build(g_out, g_src, parity_out):
        c1 = [sf.shift_fast(_adj(g_src[mu]), mu, -1, parity_out, s.lat)
              for mu in range(4)]
        l = jnp.concatenate([0.5 * g_out, -0.5 * jnp.stack(c1)])
        return jnp.swapaxes(_split(l, links_dtype), 0, 1)

    return PallasStag3EO(s.lat, build(s.g_e, s.g_o, 0),
                         build(s.g_o, s.g_e, 1))


def fits(lat: Lattice, links_dtype=jnp.float32, nzb: int = 8) -> bool:
    """Geometry constraints of the kernel: 4-d lattice with even T and
    Th >= 2 (the t index maps stream th+-1, th+-2 blocks).  Z-blocking
    constraints (nzb | Z with nzb >= 3, else a single full-Z block)
    are resolved internally by ``_pick_nzb`` and never reject a
    geometry."""
    return (lat.nd == 4 and lat.dims[3] % 2 == 0
            and lat.dims[3] >= 4)


def _pick_nzb(Z: int, nzb: int | None, YX: int = 0,
              blk_bytes_per_site: int = 0) -> int:
    """``nzb=None``: auto — ONE full-Z block when the double-buffered
    working set fits the 100MB scoped-VMEM budget.  At nz == 1 the z
    hops are pure periodic sublane rolls, so the psi_zm/zp neighbor
    streams are dropped entirely (~10%% of the 8-term bf16 traffic)."""
    if nzb is None:
        est = blk_bytes_per_site * Z * YX * 2
        if est <= 80 * 1024 * 1024:
            nzb = Z
        else:
            # largest divisor of Z (>= 3, for the z+-3 planes) whose
            # double-buffered block fits the budget; when NO divisor
            # fits, the smallest legal divisor minimizes the VMEM
            # overflow (full-Z is by construction the already-oversized
            # configuration — picking it back would guarantee the
            # overflow the auto mode is trying to avoid)
            cands = [d for d in range(3, Z) if Z % d == 0
                     and blk_bytes_per_site * d * YX * 2
                     <= 80 * 1024 * 1024]
            if cands:
                nzb = max(cands)
            else:
                small = [d for d in range(3, Z) if Z % d == 0]
                nzb = min(small) if small else Z
    if Z % nzb == 0 and nzb >= 3:
        return nzb
    return Z  # single full-Z block (wrap via the periodic index maps)


def _hisq_kernel(X: int, parity_out: int, nzb: int, nz: int, naik: bool,
                 l, psi_c, *rest):
    """One (th, z-block) tile of the 16-term HISQ hopping term
    (8-term plain staggered when ``naik`` is False: no dist-3 hops,
    no tmm/tpp streams).

    Block shapes: l (16, 2, 3, 3, 1, nzb, YX); psi_* / out
    (2, 3, 1, nzb, YX).

    Every value is a full (nzb, YX) z-block plane set (full sublane
    occupancy; per-z (1, YX) slices measured substantially slower on
    the Wilson kernel, wilson_pallas docstring).  z hops (dist 1 and
    3) are sublane rolls with the boundary rows selected from the
    streamed neighbor block.  When the block is ALL of Z (nz == 1) the
    z hops are pure periodic sublane rolls and the zm/zp neighbor
    streams are not passed at all -- two full psi reads (~10% of the
    8-term bf16 traffic) saved per application.
    """
    if nz > 1:
        psi_zm, psi_zp, *rest = rest
    else:
        psi_zm = psi_zp = None
    psi_tm, psi_tp, *rest = rest
    if naik:
        psi_tmm, psi_tpp, out = rest
    else:
        (out,) = rest
    yx = out.shape[-1]
    xg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) % X
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) // X
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nzb, 1), 0)
    z_glob = pl.program_id(1) * nzb + zrow
    s_par = ((parity_out + xg + yg + z_glob) % 2) == 1

    def cvec(ref):
        return [(ref[0, c, 0], ref[1, c, 0]) for c in range(3)]

    def roll_pair(v, sh, axis=1):
        sh = sh % (yx if axis == 1 else nzb)
        return tuple(pltpu.roll(x, sh, axis) for x in v)

    def sel_pair(mask, a, b):
        return tuple(jnp.where(mask, xa, xb) for xa, xb in zip(a, b))

    def shift_x(vec, sign, d):
        if sign > 0:
            a = [roll_pair(v, -d) for v in vec]
            b = [roll_pair(v, X - d) for v in vec]
            m = xg >= X - d
        else:
            a = [roll_pair(v, d) for v in vec]
            b = [roll_pair(v, -(X - d)) for v in vec]
            m = xg < d
        return [sel_pair(m, bb, aa) for aa, bb in zip(a, b)]

    def shift_z(vec, nbr, sign, d):
        """z-shift by d: sublane roll; boundary rows from the streamed
        neighbor block (pure periodic roll when the block is all of Z)."""
        sh = (nzb - d) if sign > 0 else d
        if nz == 1:
            return [roll_pair(v, sh, 0) for v in vec]
        m = (zrow >= nzb - d) if sign > 0 else (zrow < d)
        return [sel_pair(m, roll_pair(w, sh, 0), roll_pair(v, sh, 0))
                for v, w in zip(vec, nbr)]

    def matvec(term, vec):
        res = []
        for a in range(3):
            rr = ri = None
            for b in range(3):
                ar = l[term, 0, a, b, 0].astype(jnp.float32)
                ai = l[term, 1, a, b, 0].astype(jnp.float32)
                vr, vi = vec[b]
                tr = ar * vr - ai * vi
                ti = ar * vi + ai * vr
                rr = tr if rr is None else rr + tr
                ri = ti if ri is None else ri + ti
            res.append((rr, ri))
        return res

    def axpy(acc, vec):
        if acc is None:
            return list(vec)
        return [(ar + r, ai + i)
                for (ar, ai), (r, i) in zip(acc, vec)]

    psi = cvec(psi_c)
    zm = cvec(psi_zm) if psi_zm is not None else None
    zp = cvec(psi_zp) if psi_zp is not None else None
    tm, tp = cvec(psi_tm), cvec(psi_tp)
    tmm, tpp = (cvec(psi_tmm), cvec(psi_tpp)) if naik else (None, None)

    acc = None
    for term in range(16 if naik else 8):
        kind, mu = divmod(term, 4)
        fwd = kind in (0, 2)
        d = 1 if kind < 2 else 3
        if mu == 0:
            vec = shift_x(psi, +1 if fwd else -1, d)
        elif mu == 1:
            vec = [roll_pair(v, (-d if fwd else d) * X) for v in psi]
        elif mu == 2:
            vec = shift_z(psi, zp if fwd else zm, +1 if fwd else -1, d)
        else:
            # t hop: global t = 2 th + b, b = (parity+x+y+z) % 2
            # (stag_fast.shift_fast dist 1/3 select logic)
            if d == 1:
                vec = ([sel_pair(s_par, p, c)
                        for p, c in zip(tp, psi)] if fwd else
                       [sel_pair(s_par, c, m)
                        for c, m in zip(psi, tm)])
            else:
                vec = ([sel_pair(s_par, pp, p)
                        for pp, p in zip(tpp, tp)] if fwd else
                       [sel_pair(s_par, m, mm)
                        for m, mm in zip(tm, tmm)])
        acc = axpy(acc, matvec(term, vec))

    for c in range(3):
        out[0, c, 0] = acc[c][0]
        out[1, c, 0] = acc[c][1]


def dslash_pallas_hisq(s: PallasStag3EO, x_split: jax.Array,
                       parity_out: int, nzb: int | None = 8,
                       interpret: bool = False) -> jax.Array:
    """Apply the fat+naik hopping term; x_split (2, 3, Th, Z, YX) f32
    on the source parity; returns the same shape on ``parity_out``."""
    lat = s.lat
    X, Y, Z, T = lat.dims
    Th, YX = T // 2, Y * X
    l = s.l_e if parity_out == 0 else s.l_o
    nterms = l.shape[0]
    naik = nterms == 16
    lbytes = 2 if l.dtype == jnp.bfloat16 else 4
    nzb = _pick_nzb(Z, nzb, YX,
                    nterms * 18 * lbytes + ((6 if naik else 4) * 24))
    nz = Z // nzb

    spin = lambda im: pl.BlockSpec((2, 3, 1, nzb, YX), im,
                                   memory_space=pltpu.VMEM)
    grid = (Th, nz)
    in_specs = [
        pl.BlockSpec((nterms, 2, 3, 3, 1, nzb, YX),
                     lambda th, z: (0, 0, 0, 0, th, z, 0),
                     memory_space=pltpu.VMEM),
        spin(lambda th, z: (0, 0, th, z, 0)),                  # psi_c
    ]
    if nz > 1:
        in_specs += [
            spin(lambda th, z: (0, 0, th, (z - 1) % nz, 0)),   # psi_zm
            spin(lambda th, z: (0, 0, th, (z + 1) % nz, 0)),   # psi_zp
        ]
    in_specs += [
        spin(lambda th, z: (0, 0, (th - 1) % Th, z, 0)),       # psi_tm
        spin(lambda th, z: (0, 0, (th + 1) % Th, z, 0)),       # psi_tp
    ]
    ops = [l] + [x_split] * (len(in_specs) - 1)
    if naik:
        in_specs += [
            spin(lambda th, z: (0, 0, (th - 2) % Th, z, 0)),   # psi_tmm
            spin(lambda th, z: (0, 0, (th + 2) % Th, z, 0)),   # psi_tpp
        ]
        ops += [x_split, x_split]
    out_spec = pl.BlockSpec((2, 3, 1, nzb, YX),
                            lambda th, z: (0, 0, th, z, 0),
                            memory_space=pltpu.VMEM)

    flops = (1152 if naik else 594) * (lat.volume // 2)
    # traffic model: spinor input streams (all in_specs minus the link
    # entry) plus the one output stream, each 24 B/site f32
    nstreams = (len(in_specs) - 1) + 1
    bytes_acc = (nterms * 18 * lbytes + nstreams * 24) * (lat.volume // 2)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_hisq_kernel, X, parity_out, nzb, nz, naik),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 3, Th, Z, YX), jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(*ops)


def d2ee_pallas_hisq(s: PallasStag3EO, x_e_split: jax.Array, m: float,
                     nzb: int | None = 8,
                     interpret: bool = False) -> jax.Array:
    t = dslash_pallas_hisq(s, x_e_split, parity_out=1, nzb=nzb,
                           interpret=interpret)
    y = dslash_pallas_hisq(s, t, parity_out=0, nzb=nzb,
                           interpret=interpret)
    return (m * m) * x_e_split - y


def d2dd_pallas_hisq(s: PallasStag3EO, x_split: jax.Array,
                     parity: int = 0, nzb: int | None = 8,
                     interpret: bool = False) -> jax.Array:
    """Mass-free fat+naik normal operator (multishift base)."""
    t = dslash_pallas_hisq(s, x_split, parity_out=1 - parity, nzb=nzb,
                           interpret=interpret)
    return -dslash_pallas_hisq(s, t, parity_out=parity, nzb=nzb,
                               interpret=interpret)


def dslash_pallas_hisq_c(s: PallasStag3EO, x: jax.Array,
                         parity_out: int, nzb: int | None = 8,
                         interpret: bool = False) -> jax.Array:
    """complex64 fast-layout wrapper (nzb forwarded for API symmetry
    with the split-layout entry points)."""
    return _join(dslash_pallas_hisq(s, _split(x), parity_out, nzb=nzb,
                                    interpret=interpret))
