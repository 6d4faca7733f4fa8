"""Staggered and Wilson meson correlators.

TPU-native replacement for QEX's src/physics/stagMesonLocal.nim
(``stagMesons`` :14 -- taste-singlet local staggered mesons),
src/physics/wilsonMeson.nim, and the correlator programs
src/observables/fpvaMeas.nim:30 and conn4d.nim:128-190.

Staggered local channels: with point-source propagators G_a(x) (one per
source color a), the local correlator in channel with sign phase
eps(x) is

    C(t) = sum_{x spatial} eps(x) sum_a |G_a(x, t)|^2

Goldstone pion: eps = 1.  The local non-Goldstone channels use
(-1)^{x_i} sign flips (taste structure of the one-component field).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from ..physics import stag_solve, staggered as st
from ..solvers.base import SolverParams


def point_source(lat: Lattice, color: int, site=None,
                 dtype=jnp.complex64) -> jax.Array:
    """Color-vector delta source at ``site`` (default origin).
    QEX parity: observables/sources.nim point sources."""
    if site is None:
        site = (0,) * lat.nd
    b = jnp.zeros(lat.vector_shape(), dtype)
    return b.at[(color,) + tuple(site)].set(1.0)


def _sign_field(lat: Lattice, dirs: tuple[int, ...]) -> jax.Array:
    """(-1)^{sum_{mu in dirs} x_mu} over the lattice."""
    s = jnp.zeros(lat.dims, jnp.int32)
    for mu in dirs:
        shape = [1] * lat.nd
        shape[mu] = lat.dims[mu]
        s = s + jax.lax.broadcasted_iota(jnp.int32, tuple(shape), mu)
    return 1.0 - 2.0 * (s % 2).astype(jnp.float32)


# local staggered meson channels: name -> spatial sign directions
STAG_CHANNELS = {
    "pion5": (),             # Goldstone pi (gamma5 x gamma5)
    "pion_i5": (0, 1, 2),    # gamma0gamma5-type (all-spatial sign)
    "rho_x": (0,),
    "rho_y": (1,),
    "rho_z": (2,),
    "a1_xy": (0, 1),
    "a1_yz": (1, 2),
    "a1_zx": (2, 0),
}


def wall_source(lat: Lattice, color: int, t: int = 0,
                dtype=jnp.complex64) -> jax.Array:
    """Color wall source on timeslice ``t`` (sources.nim wall
    sources)."""
    b = jnp.zeros(lat.vector_shape(), dtype)
    return b.at[color, ..., t].set(1.0)


def momentum_phase(lat: Lattice, p: tuple[int, ...],
                   dtype=jnp.complex64) -> jax.Array:
    """exp(-i 2pi p.x/L) over spatial coords (conn4d momentum
    projection, conn4d.nim:128-190)."""
    ph = jnp.zeros(lat.dims, jnp.finfo(dtype).dtype)
    for mu, k in enumerate(p):
        if k == 0:
            continue
        shape = [1] * lat.nd
        shape[mu] = lat.dims[mu]
        coord = jax.lax.broadcasted_iota(jnp.int32, tuple(shape), mu)
        ph = ph + (2.0 * jnp.pi * k / lat.dims[mu]) * coord
    return jnp.exp(-1j * ph).astype(dtype)


def stag_mesons_from_prop(lat: Lattice, props: jax.Array,
                          channels=("pion5",),
                          momenta=((0, 0, 0),)) -> dict:
    """Correlators from stacked color propagators (nc, nc, *dims):
    props[a] solves D G_a = delta e_a.

    Returns {channel: C(n_momenta, t)} with each momentum projected
    over the spatial volume per t-slice (QEX stagMesons :14 +
    conn4d's momentum projection).  Zero momentum -> real C(t).
    """
    dens = jnp.sum(jnp.abs(props) ** 2, axis=(0, 1))  # (*dims,)
    spatial_axes = tuple(range(lat.nd - 1))
    out = {}
    for ch in channels:
        sgn = _sign_field(lat, STAG_CHANNELS[ch])
        zero_only = (len(momenta) == 1
                     and all(k == 0 for k in momenta[0]))
        if zero_only:
            out[ch] = jnp.sum(dens * sgn, axis=spatial_axes)
            continue
        cdtype = (jnp.complex64 if dens.dtype == jnp.float32
                  else jnp.complex128)
        rows = []
        for p in momenta:
            if all(k == 0 for k in p):
                rows.append(jnp.sum(dens * sgn, axis=spatial_axes)
                            .astype(cdtype))
            else:
                ph = momentum_phase(lat, p, cdtype)
                rows.append(jnp.sum(dens * sgn * ph,
                                    axis=spatial_axes))
        out[ch] = jnp.stack(rows)
    return out


def stag_meson_correlators(lat: Lattice, u: jax.Array, m: float,
                           bc: str = "pppa",
                           channels=("pion5", "pion_i5", "rho_x"),
                           params: SolverParams = SolverParams(),
                           site=None) -> dict[str, jax.Array]:
    """Point-source staggered meson correlators: nc solves + contraction
    (QEX fpvaMeas pipeline for the F channel)."""
    s = st.new_stag_eo(lat, u, bc)
    bs = jnp.stack([point_source(lat, a, site, u.dtype)
                    for a in range(lat.nc)])
    # batched multi-RHS solve: link loads shared across the nc sources
    props, _ = stag_solve.solve_batched(s, bs, m, params)
    return stag_mesons_from_prop(lat, props, channels)


WILSON_CHANNELS = ("pion", "scalar", "rho_x", "rho_y", "rho_z", "a0",
                   "a1_x", "a1_y", "a1_z")


def _wilson_gamma(ch: str):
    import numpy as np

    from ..physics.wilson import gamma_matrices
    g = gamma_matrices()
    table = {
        "pion": g[4], "scalar": np.eye(4), "a0": np.eye(4),
        "rho_x": g[0], "rho_y": g[1], "rho_z": g[2],
        "a1_x": g[0] @ g[4], "a1_y": g[1] @ g[4], "a1_z": g[2] @ g[4],
    }
    return table[ch]


def wilson_mesons_from_prop(lat: Lattice, props: jax.Array,
                            channels=("pion",)) -> dict:
    """Wilson meson two-point functions from the full propagator.

    props: (ns_src, nc_src, ns, nc, *dims) -- column (s0, c0) solves
    D S = delta_{s0 c0}.  Using gamma5-hermiticity,

      C_G(t) = sum_x tr[ G S(x) G^dag g5 S(x)^dag g5 ]

    (QEX wilsonMeson parity; the pion reduces to sum |S|^2).
    """
    from ..physics.wilson import gamma_matrices
    g5 = jnp.asarray(gamma_matrices()[4], props.dtype)
    spatial = tuple(range(-lat.nd, -1))
    out = {}
    for ch in channels:
        gm = jnp.asarray(_wilson_gamma(ch), props.dtype)
        # C(x) = Tr[G_snk S G_src S^ddag], S^ddag = g5 S^dag g5,
        # G_src = G^dag.  Collapsing the two g5 factors:
        #   C(x) = sum N[b,s] S[t,u,s,v] M[t,a] conj(S[a,u,b,v])
        # with M = G^dag g5, N = g5 G and S indexed
        # [src_spin t, src_col u, snk_spin s, snk_col v].
        # (For G = g5 this reduces to sum |S|^2, the standard pion.)
        m = jnp.conj(gm).T @ g5
        n = g5 @ gm
        c = jnp.einsum("bs,tusv...,ta,aubv...->...", n, props, m,
                       jnp.conj(props))
        out[ch] = jnp.real(jnp.sum(c, axis=spatial))
    return out


def wilson_pion_from_prop(lat: Lattice, props: jax.Array) -> jax.Array:
    """Wilson pion correlator from stacked (ns*nc) point-source
    propagators props[(s,a)] of shape (ns, nc, *dims):
    C(t) = sum_x tr[S^dag S] (gamma5-gamma5 contraction via
    gamma5-hermiticity).  QEX wilsonMeson parity."""
    dens = jnp.sum(jnp.abs(props) ** 2,
                   axis=tuple(range(props.ndim - lat.nd)))
    return jnp.sum(dens, axis=tuple(range(lat.nd - 1)))
