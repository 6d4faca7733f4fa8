"""Staggered (Kogut-Susskind) Dirac operator.

TPU-native replacement for QEX's src/physics/stagD.nim (hot kernel,
:200-396 ``stagDP/stagDM/stagD2``, :434-468 ``stagD2ee``, :509
``stagPhase``, :589-635 ``stagDeriv``).

Conventions
-----------
* Phased links: staggered phases eta_mu(x) = (-1)^{x_0+...+x_{mu-1}}
  and (optionally) anti-periodic boundary signs are folded INTO the
  gauge field once (:func:`phase_links`, QEX ``stagPhase`` /``setBC``),
  so the stencil itself is phase-free.
* Operator: D(m) chi = m chi + Dslash chi with
      Dslash chi(x) = 1/2 sum_mu [ U_mu(x) chi(x+mu)
                                   - U_mu(x-mu)^dag chi(x-mu) ].
  Dslash is anti-hermitian, so the even-odd normal operator is
      A = (m^2 - D_eo D_oe)  acting on even sites,
  which is QEX's ``stagD2ee = 4 m^2 + D_eo D_oe`` up to QEX's factor-2
  mass convention (QEX's D has no 1/2; solutions map by m_qex = m,
  x_qex = x/2 -- we match the continuum-normalized convention used by
  MILC-style codes and validate against dense-matrix oracles).

Layouts
-------
Two implementations:
* full-lattice (shape ``(nc, *dims)``) -- the correctness oracle.
* even-odd packed (pair of ``(nc, *dims[:-1], T/2)``) -- the solver hot
  path: half the memory traffic, the layout the Pallas kernel consumes.

Flop model (QEX parity, stagD.nim:393): per output site
``nd*(72+66) + 18`` fused-real flops for nc=3, i.e. 570/site interior
+ mass/accumulate terms -> the same 594/site figure for nd=4 used by
``bench.py`` to report GFLOP/s.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import eo, linalg
from ..ops.shifts import shift


def staggered_phases(lat: Lattice, dtype=jnp.float32) -> jax.Array:
    """eta_mu(x) field, shape (nd, *dims), values +-1.

    eta_0 = 1, eta_mu = (-1)^{x_0 + ... + x_{mu-1}} (x fastest ordering,
    QEX stagPhase, stagD.nim:509).
    """
    nd = lat.nd
    phases = []
    csum = jnp.zeros(lat.dims, jnp.int32)
    for mu in range(nd):
        phases.append(1.0 - 2.0 * (csum % 2).astype(dtype))
        shape = [1] * nd
        shape[mu] = lat.dims[mu]
        coord = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), mu)
        csum = csum + coord
    return jnp.stack(phases)


def bc_signs(lat: Lattice, bc: str = "pppa", dtype=jnp.float32) -> jax.Array:
    """Boundary-condition sign field, shape (nd, *dims).

    'p' = periodic, 'a' = anti-periodic: links in direction mu on the
    last slice pick up -1 (QEX ``setBC``, gauge/gaugeUtils.nim:124).
    Default "pppa": anti-periodic in time.
    """
    nd = lat.nd
    if len(bc) != nd:
        raise ValueError(f"bc string length {len(bc)} != nd {nd}")
    out = []
    for mu, c in enumerate(bc):
        f = jnp.ones(lat.dims, dtype)
        if c == "a":
            shape = [1] * nd
            shape[mu] = lat.dims[mu]
            coord = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), mu)
            sign = jnp.where(coord == lat.dims[mu] - 1, -1.0, 1.0).astype(dtype)
            f = f * sign
        elif c != "p":
            raise ValueError(f"bad bc char {c!r}")
        out.append(f)
    return jnp.stack(out)


def phase_links(lat: Lattice, u: jax.Array, bc: str = "pppa") -> jax.Array:
    """Fold staggered phases and BC signs into the links.

    QEX parity: applying ``stagPhase`` + ``setBC`` to the gauge field
    before building the staggered operator (stagg_pv_hmc usage).
    """
    rdtype = jnp.finfo(u.dtype).dtype
    eta = staggered_phases(lat, rdtype) * bc_signs(lat, bc, rdtype)
    return u * eta[:, None, None]


# --- full-lattice operator (correctness oracle) -----------------------------

def dslash_full(lat: Lattice, g: jax.Array, x: jax.Array) -> jax.Array:
    """Phase-free staggered hopping term on the full lattice.

    Dslash x(s) = 1/2 sum_mu [ g_mu(s) x(s+mu) - g_mu(s-mu)^dag x(s-mu) ]
    where ``g`` are phased links from :func:`phase_links`.
    """
    nd = lat.nd
    out = None
    for mu in range(nd):
        fwd = linalg.mv(g[mu], shift(x, mu, +1, nd))
        bwd = shift(linalg.mv_an(g[mu], x), mu, -1, nd)
        term = fwd - bwd
        out = term if out is None else out + term
    return 0.5 * out


def d_full(lat: Lattice, g: jax.Array, x: jax.Array, m: float) -> jax.Array:
    """Full staggered operator D(m) x = m x + Dslash x."""
    return m * x + dslash_full(lat, g, x)


# --- even-odd packed operator (solver hot path) -----------------------------

@dataclasses.dataclass(frozen=True)
class StaggeredEO:
    """Even-odd packed staggered operator data.

    Holds the phased links packed per parity.  QEX parity: ``StaggeredD``
    (stagD.nim:15) whose 8 ShiftB objects become rolls here.

    ``g_e[mu]``: links U_mu(x) for even x; ``g_o[mu]``: for odd x.
    """

    lat: Lattice
    g_e: jax.Array  # (nd, nc, nc, *dims_h)
    g_o: jax.Array


def new_stag_eo(lat: Lattice, u: jax.Array, bc: str = "pppa") -> StaggeredEO:
    """Build the eo-packed operator from an (unphased) gauge field."""
    g = phase_links(lat, u, bc)
    ge, go = eo.pack(g, lat.nd)
    return StaggeredEO(lat, ge, go)


def dslash_eo(s: StaggeredEO, x_src: jax.Array, parity_out: int) -> jax.Array:
    """Apply the hopping term from parity ``1-parity_out`` to ``parity_out``.

    x_src lives on the source parity; the result on ``parity_out``:
    (D_{po,ps} x)(s) = 1/2 sum_mu [ g_mu(s) x(s+mu) - g_mu(s-mu)^dag x(s-mu) ]

    QEX parity: stagDP/stagDM kernels (stagD.nim:200-396); the
    comm/compute overlap (startSB -> interior -> boundary) is handled by
    XLA's scheduler / the shard_map halo path instead of hand-staging.
    """
    lat = s.lat
    nd = lat.nd
    g_out = s.g_e if parity_out == 0 else s.g_o   # links at output sites
    g_src = s.g_o if parity_out == 0 else s.g_e   # links at source sites
    out = None
    for mu in range(nd):
        fwd = linalg.mv(g_out[mu], eo.shift_eo(x_src, mu, +1, parity_out, nd))
        bwd = eo.shift_eo(linalg.mv_an(g_src[mu], x_src), mu, -1, parity_out, nd)
        term = fwd - bwd
        out = term if out is None else out + term
    return 0.5 * out


def d2ee(s: StaggeredEO, x_e: jax.Array, m: float) -> jax.Array:
    """Even-odd normal operator A x = (m^2 - D_eo D_oe) x on even sites.

    Hermitian positive definite (Dslash anti-hermitian), the CG target.
    QEX parity: ``stagD2ee`` (stagD.nim:434-468) up to mass convention.
    """
    t = dslash_eo(s, x_e, parity_out=1)   # D_oe x
    y = dslash_eo(s, t, parity_out=0)     # D_eo D_oe x
    return (m * m) * x_e - y


@dataclasses.dataclass(frozen=True)
class Staggered3EO:
    """Even-odd packed fat+naik staggered operator (QEX ``newStag3``,
    stagD.nim:543): 1-hop fat links + 3-hop long links.

    Build from qex_tpu.gauge.fat7.hisq_links applied to phased links
    (MILC convention: stagPhase/setBC folded in BEFORE fattening, as in
    hisqLinks.nim's main usage).
    """

    lat: Lattice
    gf_e: jax.Array
    gf_o: jax.Array
    gl_e: jax.Array
    gl_o: jax.Array


def new_stag3_eo(lat: Lattice, fat: jax.Array, long: jax.Array
                 ) -> Staggered3EO:
    """Pack pre-phased fat/long links into the eo operator."""
    fe, fo = eo.pack(fat, lat.nd)
    le, lo = eo.pack(long, lat.nd)
    return Staggered3EO(lat, fe, fo, le, lo)


def dslash3_eo(s: Staggered3EO, x_src: jax.Array, parity_out: int
               ) -> jax.Array:
    """Fat (1-hop) + naik (3-hop) hopping term onto ``parity_out``.

    Both hop distances are odd, so both connect the opposite parity.
    The naik coefficient is already inside the long links (fat7
    make_imp_links folds it).
    """
    lat = s.lat
    nd = lat.nd
    gf_out = s.gf_e if parity_out == 0 else s.gf_o
    gf_src = s.gf_o if parity_out == 0 else s.gf_e
    gl_out = s.gl_e if parity_out == 0 else s.gl_o
    gl_src = s.gl_o if parity_out == 0 else s.gl_e
    out = None
    for mu in range(nd):
        fwd = linalg.mv(gf_out[mu], eo.shift_eo(x_src, mu, +1,
                                                parity_out, nd))
        bwd = eo.shift_eo(linalg.mv_an(gf_src[mu], x_src), mu, -1,
                          parity_out, nd)
        term = fwd - bwd
        fwd3 = linalg.mv(gl_out[mu], eo.shift_eo(x_src, mu, +1,
                                                 parity_out, nd, dist=3))
        bwd3 = eo.shift_eo(linalg.mv_an(gl_src[mu], x_src), mu, -1,
                           parity_out, nd, dist=3)
        term = term + fwd3 - bwd3
        out = term if out is None else out + term
    return 0.5 * out


def dslash3_full(lat: Lattice, fat: jax.Array, long: jax.Array,
                 x: jax.Array) -> jax.Array:
    """Full-lattice fat+naik hopping term (correctness oracle)."""
    nd = lat.nd
    out = None
    for mu in range(nd):
        term = (linalg.mv(fat[mu], shift(x, mu, +1, nd))
                - shift(linalg.mv_an(fat[mu], x), mu, -1, nd))
        term = term + (linalg.mv(long[mu], shift(x, mu, +1, nd, dist=3))
                       - shift(linalg.mv_an(long[mu], x), mu, -1, nd,
                               dist=3))
        out = term if out is None else out + term
    return 0.5 * out


def d2ee3(s: Staggered3EO, x_e: jax.Array, m: float) -> jax.Array:
    """Even-odd normal operator for the fat+naik Dslash."""
    t = dslash3_eo(s, x_e, parity_out=1)
    y = dslash3_eo(s, t, parity_out=0)
    return (m * m) * x_e - y


def d2dd3(s: Staggered3EO, x: jax.Array, parity: int = 0) -> jax.Array:
    """Mass-free fat+naik normal operator (multishift base)."""
    other = 1 - parity
    t = dslash3_eo(s, x, parity_out=other)
    return -dslash3_eo(s, t, parity_out=parity)


def d2dd(s: StaggeredEO, x: jax.Array, parity: int = 0) -> jax.Array:
    """Mass-free normal operator A x = -D_po,ps D_ps,po x on ``parity``.

    Positive semi-definite (D_eo^dag = -D_oe); the multishift-CG base
    operator: (A + m^2) x = d2ee(x, m).  QEX parity: stagD2xx without
    the mass term (stagD.nim:434-468).
    """
    other = 1 - parity
    t = dslash_eo(s, x, parity_out=other)
    return -dslash_eo(s, t, parity_out=parity)


def reconstruct_odd(s: StaggeredEO, x_e: jax.Array, b_o: jax.Array,
                    m: float) -> jax.Array:
    """Given the even solution of D x = b, reconstruct the odd part:

    x_o = (b_o - D_oe x_e) / m
    QEX parity: solveEO reconstruction (stagSolve.nim:17-140).
    """
    return (b_o - dslash_eo(s, x_e, parity_out=1)) / m


def dslash_flops_per_site(nd: int = 4, nc: int = 3) -> int:
    """QEX's Dslash flop model (stagD.nim:393): 18 + nd*(72+66+6) = 594
    for nd=4, nc=3.  Generalized: per direction one complex matvec
    (8*nc*nc real flops) plus accumulates; 594/site is what bench.py
    reports GFLOP/s against so numbers are comparable to the reference's
    self-instrumentation."""
    if nc == 3:
        return 18 + nd * (72 + 66 + 6)
    return 6 * nc + nd * (8 * nc * nc + 8 * nc + 2 * nc)
