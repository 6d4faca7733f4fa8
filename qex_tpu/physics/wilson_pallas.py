"""Pallas eo Wilson hopping kernel: all 8 spin-projected hops fused.

TPU kernel for the Wilson hopping term (QEX wilsonD.nim:58-143, flop
model 2*nd*(12+2*66+24) = 1344/site), the hot operator of Wilson CGNE
solves and the multigrid smoother.  Same design as the 16-term HISQ
kernel (stag_pallas_hisq): pre-shifted links at the output site +
BlockSpec-streamed psi planes, one VMEM pass over psi for all 8 terms
(the XLA fast layout materializes 8 shifted half-spinor temporaries in
HBM).

Spin structure in-kernel: the chiral-basis gammas are off-diagonal
2x2 blocks with entries in {0, +-1, +-i} (wilson.gamma_matrices), so

    (1 -+ g_mu) psi  ->  h_s = psi_s -+ c_s psi_{2+p(s)}   (s = 0, 1)

is two fused adds per color (the +-i multiply is a free re/im plane
relabel), the two 3x3 color matvecs act on h, and the reconstruction
writes  out_s += r_s,  out_{2+p(s)} -+= conj(c_s) r_s.  The projector
permutation p and coefficients c are extracted numerically at trace
time from gamma_matrices() (asserting the block structure), so the
kernel can never drift from the reference basis.

Traffic/site f32: 8*72 link + 5*96 streamed spinor + 96 out = 1152 B
when z-blocked (nz > 1); one full-Z block (nzb=None) drops the z+-1
streams -> 960 B, and bf16 links drop a further 288 B -> 672 B.
flops/site 1344 -> arithmetic intensity 1.2-2.0 flop/B, higher than
staggered's 0.7 (the spin algebra is nearly free on the VPU but the
matvecs double).  Same-process A/B on v5e at 24^3x32 (exp_wilson2.py):
f32 nzb=8 387.7 -> f32 full-Z 402.8 -> bf16 nzb=8 425.1 -> bf16
full-Z 455.8 GF/s, the last moving ~90% of the measured stream
bandwidth -- the kernel is DMA-bound and bf16+full-Z is the
production configuration where it fits (pick_nzb_auto).

Semantics identical to wilson_fast.hop_fast / m_ee_fast
(tests/test_wilson_pallas.py, interpret-mode equality on CPU).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..lattice import Lattice
from . import stag_fast as sf
from . import wilson as wl
from . import wilson_fast as wf
from .stag_pallas import _join, _split


@lru_cache(maxsize=None)
def _sigma_struct(mu: int) -> tuple[tuple[int, ...], tuple[complex, ...]]:
    """gamma_mu = [[0, s], [s^dag, 0]] with one entry per row of s:
    returns (p, c) with s[r, p(r)] = c_r, entries in {+-1, +-i}."""
    g = np.asarray(wl.gamma_matrices()[mu])
    s = g[:2, 2:]
    assert np.allclose(g[:2, :2], 0) and np.allclose(g[2:, 2:], 0)
    assert np.allclose(g[2:, :2], s.conj().T)
    perm, coef = [], []
    for r in range(2):
        nz = np.flatnonzero(np.abs(s[r]) > 1e-12)
        assert nz.size == 1
        perm.append(int(nz[0]))
        coef.append(complex(s[r, nz[0]]))
    return tuple(perm), tuple(coef)


def _addc(u, c, v):
    """u + c*v on (re, im) plane pairs; c a trace-time constant in
    {+-1, +-i} (free relabel) or general complex.  u=None means 0."""
    vr, vi = v
    if u is None:
        if c == 1:
            return (vr, vi)
        if c == -1:
            return (-vr, -vi)
        if c == 1j:
            return (-vi, vr)
        if c == -1j:
            return (vi, -vr)
        cr, ci = complex(c).real, complex(c).imag
        return (cr * vr - ci * vi, cr * vi + ci * vr)
    ur, ui = u
    if c == 1:
        return (ur + vr, ui + vi)
    if c == -1:
        return (ur - vr, ui - vi)
    if c == 1j:
        return (ur - vi, ui + vr)
    if c == -1j:
        return (ur + vi, ui - vr)
    cr, ci = complex(c).real, complex(c).imag
    return (ur + cr * vr - ci * vi, ui + cr * vi + ci * vr)


@dataclasses.dataclass(frozen=True)
class PallasWilsonEO:
    """Kernel-ready eo Wilson operator: term-major pre-shifted links.

    l_e / l_o: (8, 2, 3, 3, Th, Z, YX); term t = mu (forward,
    0.5 U_mu(x)) or 4 + mu (backward, 0.5 U_mu(x-mu)^dag).
    """

    lat: Lattice
    l_e: jax.Array
    l_o: jax.Array
    m: float

    @property
    def a(self) -> float:
        return self.lat.nd + self.m


def _adj(g: jax.Array) -> jax.Array:
    return jnp.conj(jnp.swapaxes(g, 0, 1))


def _build_links_w(lat: Lattice, g_out, g_src, parity_out: int,
                   dtype) -> jax.Array:
    c1 = [sf.shift_fast(_adj(g_src[mu]), mu, -1, parity_out, lat)
          for mu in range(4)]
    l = jnp.concatenate([0.5 * g_out, 0.5 * jnp.stack(c1)])
    # (2, 8, 3, 3, Th, Z, YX) -> (8, 2, 3, 3, Th, Z, YX)
    return jnp.swapaxes(_split(l, dtype), 0, 1)


def new_pallas_wilson(w, links_dtype=jnp.float32) -> PallasWilsonEO:
    """From a wilson.WilsonEO or wilson_fast.FastWilsonEO."""
    if not isinstance(w, wf.FastWilsonEO):
        w = wf.new_fast_wilson(w)
    return PallasWilsonEO(
        w.lat,
        _build_links_w(w.lat, w.g_e, w.g_o, 0, links_dtype),
        _build_links_w(w.lat, w.g_o, w.g_e, 1, links_dtype),
        w.m)


def fits(lat: Lattice) -> bool:
    """Even (packable) T with at least 2 t-halves."""
    return lat.nd == 4 and lat.dims[3] % 2 == 0 and lat.dims[3] >= 4


def _pick_nzb(Z: int, nzb: int | None) -> int:
    """nzb=None -> one full-Z block (drops the zm/zp streams; the
    block must then fit VMEM -- fine for Z <= ~32 at YX <= ~1k)."""
    if nzb is None:
        return Z
    return nzb if Z % nzb == 0 else Z


def pick_nzb_auto(lat: Lattice, links_dtype=jnp.float32) -> int | None:
    """Production z-block choice: one full-Z block (None) when the
    double-buffered working set fits the VMEM budget -- drops the
    z-neighbor streams, measured fastest at every fitting volume
    (module docstring A/B) -- else the default 8-block."""
    X, Y, Z, T = lat.dims
    lb = 2 if links_dtype == jnp.bfloat16 else 4
    blk = (8 * 18 * lb + 4 * 96) * Z * Y * X * 2
    return None if blk <= 80 * 1024 * 1024 else 8


def _wilson_kernel(X: int, parity_out: int, nzb: int, nz: int,
                   l, psi_c, *rest):
    """One (th, z-block) tile of the 8-term Wilson hopping term.

    Block shapes: l (8, 2, 3, 3, 1, nzb, YX); psi_* / out
    (2, 4, 3, 1, nzb, YX).

    Every value is a full (nzb, YX) z-block plane set: with the z
    extent on the sublane axis the VPU runs at full 8-sublane
    occupancy (per-z (1, YX) slices leave 7/8 of each tile idle —
    measured 150 -> ~400 GF/s at 24^3x32).  z hops are sublane rolls
    with the boundary row replaced from the streamed neighbor block.
    When one block covers all of Z (nz == 1) the z hops are pure
    periodic sublane rolls and the zm/zp streams are not passed at
    all — two of the six spinor streams (~15% of the f32 traffic)
    saved per application (same trick as stag_pallas_hisq).
    """
    if nz > 1:
        psi_zm, psi_zp, psi_tm, psi_tp, out = rest
    else:
        psi_zm = psi_zp = None
        psi_tm, psi_tp, out = rest
    yx = out.shape[-1]
    xg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) % X
    yg = jax.lax.broadcasted_iota(jnp.int32, (1, yx), 1) // X
    zrow = jax.lax.broadcasted_iota(jnp.int32, (nzb, 1), 0)
    z_glob = pl.program_id(1) * nzb + zrow
    s_par = ((parity_out + xg + yg + z_glob) % 2) == 1

    def wvec(ref):
        """Full spinor block: 4 spins x 3 colors of (re, im), each
        (nzb, YX)."""
        return [[(ref[0, s, c, 0], ref[1, s, c, 0])
                 for c in range(3)] for s in range(4)]

    def roll_pair(v, sh, axis=1):
        n = nzb if axis == 0 else yx
        sh = sh % n  # pltpu.roll requires non-negative shifts
        return tuple(pltpu.roll(x, sh, axis) for x in v)

    def sel_pair(mask, a, b):
        return tuple(jnp.where(mask, xa, xb) for xa, xb in zip(a, b))

    def project(vec, mu, e):
        """h_s = vec_s + e*c_s*vec_{2+p(s)}; e = -1 fwd, +1 bwd."""
        p, c = _sigma_struct(mu)
        return [[_addc(vec[s][b], e * c[s], vec[2 + p[s]][b])
                 for b in range(3)] for s in range(2)]

    def shift_x_h(h, sign):
        """x-shift by one on a projected 2x3 pair set."""
        if sign > 0:
            m = xg >= X - 1
            return [[sel_pair(m, roll_pair(v, X - 1), roll_pair(v, -1))
                     for v in row] for row in h]
        m = xg < 1
        return [[sel_pair(m, roll_pair(v, -(X - 1)), roll_pair(v, 1))
                 for v in row] for row in h]

    def shift_z_h(h, nbr, sign):
        """z-shift by one: sublane roll + boundary row from the
        neighbor block (which IS this block when nz == 1: periodic)."""
        if sign > 0:
            m = zrow == nzb - 1
            return [[sel_pair(m, roll_pair(w, nzb - 1, 0),
                              roll_pair(v, nzb - 1, 0))
                     for v, w in zip(rv, rw)]
                    for rv, rw in zip(h, nbr)]
        m = zrow == 0
        return [[sel_pair(m, roll_pair(w, 1, 0), roll_pair(v, 1, 0))
                 for v, w in zip(rv, rw)]
                for rv, rw in zip(h, nbr)]

    def matvec(term, h):
        r = [[None] * 3 for _ in range(2)]
        for a in range(3):
            for b in range(3):
                ar = l[term, 0, a, b, 0].astype(jnp.float32)
                ai = l[term, 1, a, b, 0].astype(jnp.float32)
                for s in range(2):
                    vr, vi = h[s][b]
                    tr = ar * vr - ai * vi
                    ti = ar * vi + ai * vr
                    if r[s][a] is None:
                        r[s][a] = (tr, ti)
                    else:
                        r[s][a] = (r[s][a][0] + tr, r[s][a][1] + ti)
        return r

    def recon(acc, r, mu, e):
        """out_s += r_s, out_{2+p(s)} += e*conj(c_s)*r_s."""
        p, c = _sigma_struct(mu)
        for s in range(2):
            cc = e * complex(c[s]).conjugate()
            for b in range(3):
                acc[s][b] = _addc(acc[s][b], 1, r[s][b])
                acc[2 + p[s]][b] = _addc(acc[2 + p[s]][b], cc, r[s][b])
        return acc

    psi = wvec(psi_c)
    acc = [[None] * 3 for _ in range(4)]
    for term in range(8):
        fwd = term < 4
        mu = term % 4
        e = -1 if fwd else +1
        if mu == 0:
            h = shift_x_h(project(psi, mu, e), +1 if fwd else -1)
        elif mu == 1:
            h = [[roll_pair(v, -X if fwd else X) for v in row]
                 for row in project(psi, mu, e)]
        elif mu == 2:
            nbr = wvec(psi_zp if fwd else psi_zm) if nz > 1 else psi
            h = shift_z_h(project(psi, mu, e),
                          project(nbr, mu, e), +1 if fwd else -1)
        else:
            # packed-t parity select (stag_fast.shift_fast logic)
            if fwd:
                tp = wvec(psi_tp)
                vec = [[sel_pair(s_par, tp[s][b], psi[s][b])
                        for b in range(3)] for s in range(4)]
            else:
                tm = wvec(psi_tm)
                vec = [[sel_pair(s_par, psi[s][b], tm[s][b])
                        for b in range(3)] for s in range(4)]
            h = project(vec, mu, e)
        acc = recon(acc, matvec(term, h), mu, e)

    for s in range(4):
        for b in range(3):
            out[0, s, b, 0] = acc[s][b][0]
            out[1, s, b, 0] = acc[s][b][1]


def hop_pallas_w(p: PallasWilsonEO, x_split: jax.Array, parity_out: int,
                 nzb: int | None = 8,
                 interpret: bool = False) -> jax.Array:
    """Apply the Wilson hopping term; x_split (2, 4, 3, Th, Z, YX) f32
    on the source parity; returns the same shape on ``parity_out``."""
    lat = p.lat
    X, Y, Z, T = lat.dims
    Th, YX = T // 2, Y * X
    nzb = _pick_nzb(Z, nzb)
    nz = Z // nzb
    l = p.l_e if parity_out == 0 else p.l_o

    spin = lambda im: pl.BlockSpec((2, 4, 3, 1, nzb, YX), im,
                                   memory_space=pltpu.VMEM)
    grid = (Th, nz)
    in_specs = [
        pl.BlockSpec((8, 2, 3, 3, 1, nzb, YX),
                     lambda th, z: (0, 0, 0, 0, th, z, 0),
                     memory_space=pltpu.VMEM),
        spin(lambda th, z: (0, 0, 0, th, z, 0)),              # psi_c
    ]
    if nz > 1:
        in_specs += [
            spin(lambda th, z: (0, 0, 0, th, (z - 1) % nz, 0)),  # zm
            spin(lambda th, z: (0, 0, 0, th, (z + 1) % nz, 0)),  # zp
        ]
    in_specs += [
        spin(lambda th, z: (0, 0, 0, (th - 1) % Th, z, 0)),   # psi_tm
        spin(lambda th, z: (0, 0, 0, (th + 1) % Th, z, 0)),   # psi_tp
    ]
    out_spec = pl.BlockSpec((2, 4, 3, 1, nzb, YX),
                            lambda th, z: (0, 0, 0, th, z, 0),
                            memory_space=pltpu.VMEM)

    flops = 1344 * (lat.volume // 2)
    lbytes = 2 if l.dtype == jnp.bfloat16 else 4
    nstreams = (len(in_specs) - 1) + 1  # spinor inputs + out
    bytes_acc = (8 * 18 * lbytes + nstreams * 96) * (lat.volume // 2)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
    return pl.pallas_call(
        partial(_wilson_kernel, X, parity_out, nzb, nz),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 4, 3, Th, Z, YX),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_acc,
                                      transcendentals=0),
        interpret=interpret,
        **kwargs,
    )(l, *([x_split] * (len(in_specs) - 1)))


def _g5(x_split: jax.Array) -> jax.Array:
    """gamma5 = diag(1, 1, -1, -1) on the spin axis of the split layout."""
    return jnp.concatenate([x_split[:, :2], -x_split[:, 2:]], axis=1)


def m_ee_pallas(p: PallasWilsonEO, x_split: jax.Array,
                nzb: int | None = 8,
                interpret: bool = False) -> jax.Array:
    """Schur complement M = a - H_eo H_oe / a (wilson.wilson_m_ee)."""
    t = hop_pallas_w(p, x_split, parity_out=1, nzb=nzb,
                     interpret=interpret)
    y = hop_pallas_w(p, t, parity_out=0, nzb=nzb, interpret=interpret)
    return p.a * x_split - y / p.a


def m_ee_dag_pallas(p: PallasWilsonEO, x_split: jax.Array,
                    nzb: int | None = 8,
                    interpret: bool = False) -> jax.Array:
    return _g5(m_ee_pallas(p, _g5(x_split), nzb=nzb,
                           interpret=interpret))


def hop_pallas_w_c(p: PallasWilsonEO, x: jax.Array, parity_out: int,
                   interpret: bool = False) -> jax.Array:
    """complex64 fast-layout wrapper."""
    return _join(hop_pallas_w(p, _split(x), parity_out,
                              interpret=interpret))
