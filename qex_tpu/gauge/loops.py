"""Gauge loop observables: plaquette, Polyakov loop, Wilson lines,
field strength, topological charge.

TPU-native replacement for QEX's src/gauge/gaugeUtils.nim observables
(plaq :213, wline :1103, Fmunu builders :1119-1236, densityE :1238,
topoQ :1257) -- built from roll-based transports instead of per-site
loops; XLA fuses the whole contraction per (mu, nu) plane.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from ..ops.shifts import shift, transport


def plaq_field(u: jax.Array, mu: int, nu: int, nd: int) -> jax.Array:
    """Untraced plaquette matrix field in the (mu, nu) plane.

    P_{mu nu}(x) = U_mu(x) U_nu(x+mu) U_mu(x+nu)^dag U_nu(x)^dag
    """
    umu, unu = u[mu], u[nu]
    a = linalg.mul(umu, shift(unu, mu, +1, nd))     # U_mu(x) U_nu(x+mu)
    b = linalg.mul(unu, shift(umu, nu, +1, nd))     # U_nu(x) U_mu(x+nu)
    return linalg.mul_na(a, b)


def plaquette(lat: Lattice, u: jax.Array) -> jax.Array:
    """Average plaquette Re tr P / nc over all planes and sites.

    QEX parity: ``plaq`` (gauge/gaugeUtils.nim:213); 1.0 for unit gauge.
    """
    nd, nc = lat.nd, lat.nc
    total = 0.0
    nplanes = nd * (nd - 1) // 2
    for mu in range(nd):
        for nu in range(mu + 1, nd):
            total = total + jnp.sum(linalg.re_trace(plaq_field(u, mu, nu, nd)))
    return total / (nplanes * nc * lat.volume)


def plaquette_by_plane(lat: Lattice, u: jax.Array) -> jax.Array:
    """Per-plane plaquette averages, shape (nd*(nd-1)/2,), ordered
    (0,1),(0,2),(1,2),(0,3),... matching QEX's plaq output order
    (spatial planes first by increasing nu)."""
    nd, nc = lat.nd, lat.nc
    vals = []
    for nu in range(1, nd):
        for mu in range(nu):
            vals.append(jnp.sum(linalg.re_trace(plaq_field(u, mu, nu, nd)))
                        / (nc * lat.volume))
    return jnp.stack(vals)


def polyakov_loop(lat: Lattice, u: jax.Array, mu: int | None = None) -> jax.Array:
    """Volume-averaged Polyakov loop tr prod_t U_mu / nc (complex scalar).

    Computed by log2(L) doubling: P_k(x) = product of 2^k links starting
    at x, P_{k+1}(x) = P_k(x) P_k(x + 2^k mu) -- O(log L) matmul passes
    instead of QEX's sequential per-site loop (gaugeUtils ploop).
    """
    nd, nc = lat.nd, lat.nc
    if mu is None:
        mu = nd - 1
    L = lat.dims[mu]
    if (L & (L - 1)) == 0:
        # doubling: P spans 2^k links after k rounds
        p = u[mu]
        span = 1
        while span < L:
            p = linalg.mul(p, shift(p, mu, +1, nd, dist=span))
            span *= 2
    else:
        p = u[mu]
        for k in range(1, L):
            p = linalg.mul(p, shift(u[mu], mu, +1, nd, dist=k))
    tr = linalg.trace(p)
    # every site on a mu-line carries the same loop value up to cyclic
    # reordering of the trace, so averaging over the full volume is fine
    return jnp.sum(tr) / (nc * lat.volume)


def wilson_line(lat: Lattice, u: jax.Array, path: list[int],
                engine=None) -> jax.Array:
    """Average retr of the Wilson line along ``path``.

    ``path`` entries are +-(mu+1): +1 means one hop in +x, -3 one hop in
    -z, etc. (QEX ``wline`` convention, gaugeUtils.nim:1103).  Built on
    the memoizing path engine (gauge.wline.PathEngine, the analog of
    QEX's path-tree optimizer gaugeUtils.nim:405-1100); pass a shared
    ``engine`` to reuse sub-segments across many lines.
    """
    from .wline import PathEngine
    eng = engine if engine is not None else PathEngine(lat, u)
    return eng.loop_trace(path)


def clover_fmunu(u: jax.Array, mu: int, nu: int, nd: int,
                 engine=None) -> jax.Array:
    """Clover-improved field strength F_{mu nu} (anti-hermitian traceless).

    Average of the four plaquette leaves around x, anti-hermitized.
    QEX parity: Fmunu builders (gaugeUtils.nim:1119-1236).  The leaves
    come from the shared path engine, so Fmunu for all 6 planes reuses
    every single-link segment (and topo_charge/energy_density share one
    engine across planes).
    """
    from ..lattice import Lattice
    from .wline import PathEngine
    if engine is None:
        engine = PathEngine(Lattice(u.shape[-nd:], nc=u.shape[1]), u)
    c = 0.25 * engine.clover_leaves(mu, nu)
    # anti-hermitian traceless part: F = (c - c^dag)/2 - trace part
    f = 0.5 * (c - linalg.adj(c))
    tr = linalg.trace(f) / f.shape[0]
    return f - tr * linalg.eye_like(f)


def energy_density_clover(lat: Lattice, u: jax.Array) -> jax.Array:
    """Clover discretization of the energy density E = -1/2 sum tr F^2 / V.

    Used for gradient-flow t^2 E (QEX densityE, gaugeUtils.nim:1238).
    """
    from .wline import PathEngine
    nd = lat.nd
    eng = PathEngine(lat, u)
    total = 0.0
    for mu in range(nd):
        for nu in range(mu + 1, nd):
            f = clover_fmunu(u, mu, nu, nd, engine=eng)
            total = total + linalg.norm2(f)  # -tr F^2 = |F|^2 per plane
    return total / lat.volume


def energy_density_plaq(lat: Lattice, u: jax.Array) -> jax.Array:
    """Plaquette discretization: E = 2 sum_planes (nc - retr P) / V."""
    nd, nc = lat.nd, lat.nc
    total = 0.0
    for mu in range(nd):
        for nu in range(mu + 1, nd):
            total = total + jnp.sum(nc - linalg.re_trace(plaq_field(u, mu, nu, nd)))
    return 2.0 * total / lat.volume


def topo_charge_clover(lat: Lattice, u: jax.Array) -> jax.Array:
    """Field-theoretic topological charge with clover F_{mu nu}.

    Q = 1/(32 pi^2) sum_x eps_{mu nu rho sigma} tr F_{mu nu} F_{rho sigma}
    QEX parity: topoQ (gaugeUtils.nim:1257).  4D only.
    """
    from .wline import PathEngine
    nd = lat.nd
    if nd != 4:
        raise ValueError("topological charge requires nd=4")
    eng = PathEngine(lat, u)
    fs = {}
    for mu in range(nd):
        for nu in range(mu + 1, nd):
            fs[(mu, nu)] = clover_fmunu(u, mu, nu, nd, engine=eng)
    # eps pairs: (01)(23), (02)(31)=-(02)(13), (03)(12)
    q = (
        jnp.sum(linalg.re_trace(linalg.mul(fs[(0, 1)], fs[(2, 3)])))
        - jnp.sum(linalg.re_trace(linalg.mul(fs[(0, 2)], fs[(1, 3)])))
        + jnp.sum(linalg.re_trace(linalg.mul(fs[(0, 3)], fs[(1, 2)])))
    )
    return q / (4.0 * math.pi ** 2)
