"""Fat7 + Lepage link fattening and HISQ two-level smearing.

TPU-native replacement for QEX's src/gauge/fat7l.nim (``Fat7lCoefs``,
``makeImpLinks`` with the nested gen-staple recursion and the
``coef1 -= 6*lepage`` backtracking trick) and src/physics/hisqLinks.nim
(``HisqCoefs``: fat7 -> polar projection -> asqtad fat + naik long
links, :16-72).

The generalized symmetric staple of a direction-``dir`` "link-like"
field L in direction nu is

    S_nu(L)(x) = U_nu(x) L(x+nu) U_nu(x+dir)^dag
               + U_nu(x-nu)^dag L(x-nu) U_nu(x-nu+dir)

(qex_tpu.gauge.smear.sym_staple); fat7 stacks it to 3-, 5-, 7-link
paths and the same-direction Lepage term.  Everything is differentiable
-- HISQ forces come from jax.grad through this module plus project_u
(replacing fat7lderiv.nim and the projectUDeriv chain).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from ..ops.shifts import shift
from .smear import sym_staple


@dataclasses.dataclass(frozen=True)
class Fat7lCoefs:
    """QEX ``Fat7lCoefs`` (fat7l.nim:5-10)."""

    one_link: float = 0.0
    three_staple: float = 0.0
    five_staple: float = 0.0
    seven_staple: float = 0.0
    lepage: float = 0.0


def set_hisq_fat7(f7lf: float, naik: float) -> Fat7lCoefs:
    """QEX ``setHisqFat7`` (hisqLinks.nim:9-14)."""
    return Fat7lCoefs(
        one_link=(1.0 + 3.0 * f7lf + naik) / 8.0,
        three_staple=-1.0 / 16.0,
        five_staple=1.0 / 64.0,
        seven_staple=-1.0 / 384.0,
        lepage=-f7lf / 16.0,
    )


@dataclasses.dataclass(frozen=True)
class HisqCoefs:
    """QEX ``HisqCoefs`` defaults (hisqLinks.nim:16-22)."""

    fat7_first: Fat7lCoefs = set_hisq_fat7(0.0, 0.0)
    fat7_second: Fat7lCoefs = set_hisq_fat7(2.0, 1.0)
    naik: float = -1.0 / 24.0


def make_imp_links(lat: Lattice, u: jax.Array, c: Fat7lCoefs,
                   u_long: jax.Array | None = None, naik: float = 0.0
                   ) -> tuple[jax.Array, jax.Array | None]:
    """Fat links (and optional naik long links).

    Follows makeImpLinks (fat7l.nim:73-160) exactly: per direction,
    1-link (with the Lepage backtracking correction
    ``coef1 - 6*lepage``), 3-staples, same-direction Lepage 5-link,
    5-staples, 7-staples; long links ll = naik * U U U (3 hops).
    Returns (fl, ll) with ll None when naik == 0.
    """
    nd = lat.nd
    fl = jnp.stack([fat_link_dir(lat, u, c, d) for d in range(nd)])
    ll = None
    if naik != 0.0:
        gl = u_long if u_long is not None else u
        ll = jnp.stack([naik_link_dir(lat, gl, naik, d)
                        for d in range(nd)])
    return fl, ll


def fat_link_dir(lat: Lattice, u: jax.Array, c: Fat7lCoefs,
                 dir_: int) -> jax.Array:
    """One output direction of the fat7+Lepage links (the per-``dir``
    body of makeImpLinks, fat7l.nim:73-160).  Exposed separately so
    large-volume forward-only fattening can bound its peak memory by
    jitting one direction at a time (see :func:`hisq_links_lowmem`)."""
    nd = lat.nd
    c1 = c.one_link - 6.0 * c.lepage
    have5 = c.five_staple != 0.0 or c.seven_staple != 0.0 \
        or c.lepage != 0.0
    have3 = c.three_staple != 0.0 or have5

    fl = c1 * u[dir_]
    if have3:
        for nu in range(nd):
            if nu == dir_:
                continue
            s3 = sym_staple(u[nu], u[dir_], nu, dir_, nd)
            fl = fl + c.three_staple * s3
            if c.lepage != 0.0:
                fl = fl + c.lepage * sym_staple(u[nu], s3, nu, dir_, nd)
            if have5:
                for rho in range(nd):
                    if rho in (dir_, nu):
                        continue
                    s5 = sym_staple(u[rho], s3, rho, dir_, nd)
                    fl = fl + c.five_staple * s5
                    if c.seven_staple != 0.0:
                        for sig in range(nd):
                            if sig in (dir_, nu, rho):
                                continue
                            fl = fl + c.seven_staple * sym_staple(
                                u[sig], s5, sig, dir_, nd)
    return fl


def naik_link_dir(lat: Lattice, gl: jax.Array, naik: float,
                  dir_: int) -> jax.Array:
    """naik * U(x) U(x+d) U(x+2d) for one direction."""
    nd = lat.nd
    a = shift(gl[dir_], dir_, +1, nd)                 # U(x+d)
    b = shift(linalg.mul(gl[dir_], a), dir_, +1, nd)  # U(x+d)U(x+2d)
    return naik * linalg.mul(gl[dir_], b)


def hisq_links(lat: Lattice, u: jax.Array, c: HisqCoefs = HisqCoefs(),
               proj_iters: int = 14) -> tuple[jax.Array, jax.Array]:
    """HISQ two-level smear: fat7 -> U(3) polar projection -> asqtad
    fat + naik from the projected links (hisqLinks.nim ``smear``).

    Returns (fat_links, long_links); feed to
    qex_tpu.physics.staggered.new_stag3_eo.  Differentiable end-to-end.
    """
    t1, _ = make_imp_links(lat, u, c.fat7_first)
    t2 = jax.vmap(lambda m: linalg.project_u(m, iters=proj_iters))(t1)
    fl, ll = make_imp_links(lat, t2, c.fat7_second, u_long=t2,
                            naik=c.naik)
    return fl, ll


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4))
def _fat_dir_jit(lat, u, c, dir_, proj):
    f = fat_link_dir(lat, u, c, dir_)
    if proj:
        f = linalg.project_u(f)
    return f


@functools.partial(jax.jit, static_argnums=(0, 2, 3))
def _naik_dir_jit(lat, gl, naik, dir_):
    return naik_link_dir(lat, gl, naik, dir_)


def hisq_links_lowmem(lat: Lattice, u: jax.Array,
                      c: HisqCoefs = HisqCoefs()
                      ) -> tuple[jax.Array, jax.Array]:
    """Forward-only :func:`hisq_links` with bounded peak device memory.

    The fused single-jit fattening materializes O(30) field-sized HLO
    temps, each lane-padded up to ~2.7x on TPU for typical lattice
    extents (the 4D trailing dims rarely hit the 8x128 tile) -- at
    24^3x48 that exceeds a v5e chip's 16 GB.  Here each fat7 level runs
    one output direction per jit call (temps are freed between calls),
    with the U(3) projection fused into the first level.  Same result
    as hisq_links to roundoff; NOT differentiable as a whole -- HMC
    keeps the fused path (whose force pass needs the joint graph).
    """
    stack = jax.jit(lambda *xs: jnp.stack(xs))  # jitted: axon has no eager
    t2 = stack(*[_fat_dir_jit(lat, u, c.fat7_first, d, True)
                 for d in range(lat.nd)])
    fl = stack(*[_fat_dir_jit(lat, t2, c.fat7_second, d, False)
                 for d in range(lat.nd)])
    ll = stack(*[_naik_dir_jit(lat, t2, c.naik, d)
                 for d in range(lat.nd)])
    return fl, ll
