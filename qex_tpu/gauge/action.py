"""Gauge action family: plaquette + rectangle + parallelogram + adjoint.

TPU-native replacement for QEX's src/gauge/gaugeAction.nim:
``GaugeActionCoeffs`` (:11-15), coefficient presets (:22-50), actions
``gaugeAction1/2`` (:61-143, :352-403), adjoint-plaquette ``actionA``
(:614-682), and the analytic forces ``gaugeForce/gaugeForce2/forceA``
(:334, :473, :684).

Normalization parity with QEX ``gaugeAction2`` (the convention the HMC
apps use):

    S(U) = -(1/nc) * [ c.plaq * sum_planes retr(P)
                     + c.rect * sum retr(R1)+retr(R2)
                     + c.pgm  * sum_{sg<nu<mu} sum_{8 orientations} retr(G) ]

and ``actionA`` parity for plaq+adjoint:

    S_A(U) = c.plaq * (a0 - sum retr(P)/nc)
           + c.adjplaq * (a0 - sum |tr P|^2 / nc^2),
    a0 = nd(nd-1)/2 * volume.

Forces are obtained by **automatic differentiation** + traceless
anti-hermitian projection instead of QEX's hand-built staple sums
(SURVEY.md §7 design stance): for real S and JAX's gradient convention
``dS = Re tr(G^T dU)``, the molecular-dynamics force entering
``pdot = -force`` is  ``force = -projTAH(U_mu(x) G_mu(x)^T)`` per link.
Validated against finite differences and exact Hamiltonian-conservation
scaling in tests/test_gauge_action.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import dsum, group, linalg
from ..ops.shifts import transport


# --- coefficients (QEX gaugeAction.nim:11-50 parity) ------------------------

C1_SYMANZIK = -1.0 / 12.0  # tree-level Luscher-Weisz
C1_IWASAKI = -0.331
C1_DBW2 = -1.4088


@dataclasses.dataclass(frozen=True)
class GaugeActionCoeffs:
    """Action coefficients (QEX ``GaugeActionCoeffs``)."""

    plaq: float = 0.0
    rect: float = 0.0
    pgm: float = 0.0
    adjplaq: float = 0.0

    def __mul__(self, x: float) -> "GaugeActionCoeffs":
        return GaugeActionCoeffs(self.plaq * x, self.rect * x,
                                 self.pgm * x, self.adjplaq * x)

    __rmul__ = __mul__


def wilson(beta: float) -> GaugeActionCoeffs:
    return GaugeActionCoeffs(plaq=beta)


def gauge_act_rect(beta: float, c1: float = C1_SYMANZIK) -> GaugeActionCoeffs:
    """QEX ``gaugeActRect`` (gaugeAction.nim:44-46)."""
    return GaugeActionCoeffs(plaq=(1.0 - 8.0 * c1) * beta, rect=c1 * beta)


def symanzik(beta: float) -> GaugeActionCoeffs:
    return gauge_act_rect(beta, C1_SYMANZIK)


def iwasaki(beta: float) -> GaugeActionCoeffs:
    return gauge_act_rect(beta, C1_IWASAKI)


def dbw2(beta: float) -> GaugeActionCoeffs:
    return gauge_act_rect(beta, C1_DBW2)


def adjoint_action(beta: float, adj_ratio: float) -> GaugeActionCoeffs:
    """Fundamental + adjoint plaquette mix (stagg_pv_hmc XML 'adjFac')."""
    return GaugeActionCoeffs(plaq=beta, adjplaq=beta * adj_ratio)


# --- actions ----------------------------------------------------------------

def _t(u, mu, nd):
    """Forward transporter T_mu f = U_mu(x) f(x+mu)."""
    return lambda f: transport(u[mu], f, mu, +1, nd)


def _td(u, mu, nd):
    """Backward transporter Td_mu f = U_mu(x-mu)^dag f(x-mu)."""
    return lambda f: transport(u[mu], f, mu, -1, nd)


def gauge_action(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                 ) -> jax.Array:
    """Plaq/rect/pgm action, QEX ``gaugeAction2`` parity
    (gaugeAction.nim:352-403: the redot-of-transports formulation).
    """
    nd, nc = lat.nd, lat.nc
    pl = 0.0
    rt = 0.0
    pg = 0.0
    T = [_t(u, mu, nd) for mu in range(nd)]
    Td = [_td(u, mu, nd) for mu in range(nd)]
    for mu in range(1, nd):
        for nu in range(mu):
            pl = pl + linalg.redot(T[mu](u[nu]), T[nu](u[mu]))
            if c.rect != 0.0:
                rt = rt + linalg.redot(T[mu](T[nu](u[nu])),
                                       T[nu](T[nu](u[mu])))
                rt = rt + linalg.redot(T[mu](T[mu](u[nu])),
                                       T[nu](T[mu](u[mu])))
            if c.pgm != 0.0:
                for sg in range(nu):
                    pg = pg + linalg.redot(T[mu](T[nu](u[sg])),
                                           T[sg](T[nu](u[mu])))
                    pg = pg + linalg.redot(T[mu](T[sg](u[nu])),
                                           T[nu](T[sg](u[mu])))
                    pg = pg + linalg.redot(T[nu](T[mu](u[sg])),
                                           T[sg](T[mu](u[nu])))
                    pg = pg + linalg.redot(T[nu](T[sg](u[mu])),
                                           T[mu](T[sg](u[nu])))
                    pg = pg + linalg.redot(T[sg](T[mu](u[nu])),
                                           T[nu](T[mu](u[sg])))
                    pg = pg + linalg.redot(T[sg](T[nu](u[mu])),
                                           T[mu](T[nu](u[sg])))
                    pg = pg + linalg.redot(T[mu](Td[nu](u[sg])),
                                           T[sg](Td[nu](u[mu])))
                    pg = pg + linalg.redot(T[mu](Td[sg](u[nu])),
                                           T[nu](Td[sg](u[mu])))
    return (-1.0 / nc) * (c.plaq * pl + c.rect * rt + c.pgm * pg)


def action_a(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array) -> jax.Array:
    """Plaquette + adjoint-plaquette action, QEX ``actionA`` parity
    (gaugeAction.nim:614-682)."""
    nd, nc = lat.nd, lat.nc
    pl = 0.0
    ad = 0.0
    T = [_t(u, mu, nd) for mu in range(nd)]
    for mu in range(1, nd):
        for nu in range(mu):
            a = T[mu](u[nu])        # U_mu(x) U_nu(x+mu)
            b = T[nu](u[mu])        # U_nu(x) U_mu(x+nu)
            trp = linalg.trace(linalg.mul_an(a, b))  # tr P^dag per site
            pl = pl + jnp.sum(jnp.real(trp))
            ad = ad + jnp.sum(jnp.real(trp) ** 2 + jnp.imag(trp) ** 2)
    a0 = 0.5 * nd * (nd - 1) * lat.volume
    return (c.plaq * (a0 - pl / nc)
            + c.adjplaq * (a0 - ad / (nc * nc)))


def full_action(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                ) -> jax.Array:
    """Dispatch: actionA when adjplaq is used, gauge_action otherwise
    (mirrors QEX's app-level switch, stagg_pv_hmc/staghmc_spv.nim)."""
    if c.adjplaq != 0.0:
        s = action_a(GaugeActionCoeffs(plaq=c.plaq, adjplaq=c.adjplaq),
                     lat, u)
        if c.rect != 0.0 or c.pgm != 0.0:
            s = s + gauge_action(
                GaugeActionCoeffs(rect=c.rect, pgm=c.pgm), lat, u)
        return s
    return gauge_action(c, lat, u)


# --- compensated (two-float) action values -----------------------------------
#
# Measurement-path twins of gauge_action/action_a with every site
# reduction through ops.dsum pairwise two-float trees, so the O(1e7)
# Hamiltonian keeps sub-ulp resolution in f32 (the reference holds H in
# f64, src/hmc/metropolis.nim:6-16).  Never differentiated -- MD forces
# keep the scalar path.

def gauge_action2(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                  ) -> dsum.Pair:
    """Two-float ``gauge_action`` (same plane enumeration)."""
    nd, nc = lat.nd, lat.nc
    rdt = jnp.real(u).dtype
    pl = dsum.df_zero(rdt)
    rt = dsum.df_zero(rdt)
    pg = dsum.df_zero(rdt)
    T = [_t(u, mu, nd) for mu in range(nd)]
    Td = [_td(u, mu, nd) for mu in range(nd)]
    for mu in range(1, nd):
        for nu in range(mu):
            pl = dsum.df_add(pl, dsum.redot2(T[mu](u[nu]), T[nu](u[mu])))
            if c.rect != 0.0:
                rt = dsum.df_add(rt, dsum.redot2(T[mu](T[nu](u[nu])),
                                                 T[nu](T[nu](u[mu]))))
                rt = dsum.df_add(rt, dsum.redot2(T[mu](T[mu](u[nu])),
                                                 T[nu](T[mu](u[mu]))))
            if c.pgm != 0.0:
                for sg in range(nu):
                    for a, b in (
                            (T[mu](T[nu](u[sg])), T[sg](T[nu](u[mu]))),
                            (T[mu](T[sg](u[nu])), T[nu](T[sg](u[mu]))),
                            (T[nu](T[mu](u[sg])), T[sg](T[mu](u[nu]))),
                            (T[nu](T[sg](u[mu])), T[mu](T[sg](u[nu]))),
                            (T[sg](T[mu](u[nu])), T[nu](T[mu](u[sg]))),
                            (T[sg](T[nu](u[mu])), T[mu](T[nu](u[sg]))),
                            (T[mu](Td[nu](u[sg])), T[sg](Td[nu](u[mu]))),
                            (T[mu](Td[sg](u[nu])), T[nu](Td[sg](u[mu])))):
                        pg = dsum.df_add(pg, dsum.redot2(a, b))
    s = dsum.df_scale(pl, -c.plaq / nc)
    if c.rect != 0.0:
        s = dsum.df_add(s, dsum.df_scale(rt, -c.rect / nc))
    if c.pgm != 0.0:
        s = dsum.df_add(s, dsum.df_scale(pg, -c.pgm / nc))
    return s


def action_a2(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
              ) -> dsum.Pair:
    """Two-float ``action_a`` (plaquette + adjoint plaquette)."""
    nd, nc = lat.nd, lat.nc
    rdt = jnp.real(u).dtype
    pl = dsum.df_zero(rdt)
    ad = dsum.df_zero(rdt)
    T = [_t(u, mu, nd) for mu in range(nd)]
    for mu in range(1, nd):
        for nu in range(mu):
            a = T[mu](u[nu])
            b = T[nu](u[mu])
            trp = linalg.trace(linalg.mul_an(a, b))
            pl = dsum.df_add(pl, dsum.sum2(jnp.real(trp)))
            ad = dsum.df_add(ad, dsum.sum2(
                jnp.real(trp) ** 2 + jnp.imag(trp) ** 2))
    a0 = 0.5 * nd * (nd - 1) * lat.volume
    s = dsum.df_scale(dsum.df_add(dsum.df_const(a0, rdt),
                                  dsum.df_scale(pl, -1.0 / nc)),
                      c.plaq)
    return dsum.df_add(s, dsum.df_scale(
        dsum.df_add(dsum.df_const(a0, rdt),
                    dsum.df_scale(ad, -1.0 / (nc * nc))),
        c.adjplaq))


def full_action2(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                 ) -> dsum.Pair:
    """Two-float ``full_action`` (same dispatch)."""
    if c.adjplaq != 0.0:
        s = action_a2(GaugeActionCoeffs(plaq=c.plaq, adjplaq=c.adjplaq),
                      lat, u)
        if c.rect != 0.0 or c.pgm != 0.0:
            s = dsum.df_add(s, gauge_action2(
                GaugeActionCoeffs(rect=c.rect, pgm=c.pgm), lat, u))
        return s
    return gauge_action2(c, lat, u)


# --- hand-structured staple force (plaq + adjplaq) ---------------------------
#
# The AD force graph is correct but moves ~5x the roofline HBM traffic
# (ROUND1.md); for the action pieces the apps actually integrate
# (plaquette and adjoint-plaquette -- QEX gaugeForce/forceA,
# gaugeAction.nim:148-333,684-742) we build the classic staple sum by
# hand with shared transports.  rect/pgm fall back to AD.
#
# Derivation (verified against AD in tests/test_gauge_action.py):
# with P_munu(x) = U_mu(x) U_nu(x+mu) U_mu(x+nu)^+ U_nu(x)^+, the
# U_mu(y) insertions of Re tr P are the up staple
# S1 = U_nu(y+mu) U_mu(y+nu)^+ U_nu(y)^+ and the down staple
# S2 = shift_-nu[U_nu(x+mu)^+ U_mu(x)^+ U_nu(x)], so for
# S = -(c/nc) sum Re tr P the force is F_mu = (c/nc) tah(U_mu Sig_mu),
# Sig_mu = sum_nu (S1+S2).  The adjoint-plaquette term |tr P|^2 weights
# each staple by the complex scalar w = conj(tr P at the plaquette
# base) BEFORE the (R-linear) tah: F += (2 c_adj/nc^2) tah(sum w U S).


def _staple_sums(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                 ) -> list[jax.Array]:
    """Per-direction weighted staple sums Sig_mu with action
    coefficients folded in, such that F_mu = tah(U_mu Sig_mu) and the
    AD-convention gradient is G_mu = -Sig_mu^T."""
    nd, nc = lat.nd, lat.nc
    sh = lambda f, mu: jnp.roll(f, -1, f.ndim - nd + mu)
    su = [[sh(u[a], b) if a != b else None for b in range(nd)]
          for a in range(nd)]
    t = [[linalg.mul(u[a], su[b][a]) if a != b else None
          for b in range(nd)] for a in range(nd)]
    cp = c.plaq / nc
    ca = 2.0 * c.adjplaq / (nc * nc)
    sig = []
    for mu in range(nd):
        acc = None
        for nu in range(nd):
            if nu == mu:
                continue
            s1 = linalg.mul_na(su[nu][mu], t[nu][mu])
            inner = linalg.mul(linalg.adj(t[mu][nu]), u[nu])
            if ca != 0.0:
                # tr P_munu = tr(t1 t2^+); w = conj(tr P)
                w = jnp.conj(jnp.sum(t[mu][nu] * jnp.conj(t[nu][mu]),
                                     axis=(0, 1)))
                s1 = cp * s1 + ca * (w * s1)
                inner = cp * inner + ca * (jnp.conj(w) * inner)
            term = s1 + jnp.roll(inner, 1, inner.ndim - nd + nu)
            acc = term if acc is None else acc + term
        sig.append(acc if ca != 0.0 else cp * acc)
    return sig


def _hand_part(c: GaugeActionCoeffs) -> GaugeActionCoeffs:
    return GaugeActionCoeffs(plaq=c.plaq, adjplaq=c.adjplaq)


def _ad_part(c: GaugeActionCoeffs) -> GaugeActionCoeffs:
    return GaugeActionCoeffs(rect=c.rect, pgm=c.pgm)


def gauge_force_hand(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                     ) -> jax.Array:
    """Hand staple force of the plaq+adjplaq part of ``c`` (QEX
    gaugeForce/forceA parity); rect/pgm must be handled separately."""
    sig = _staple_sums(c, lat, u)
    return jnp.stack([group.tah(linalg.mul(u[mu], sig[mu]))
                      for mu in range(lat.nd)])


def gauge_grad_hand(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                    ) -> jax.Array:
    """AD-convention gradient (dS = Re tr(G^T dU)) of the plaq+adjplaq
    part -- drop-in for ``jax.grad(full_action)`` in smear chain rules."""
    sig = _staple_sums(c, lat, u)
    return jnp.stack([-jnp.swapaxes(sig[mu], 0, 1)
                      for mu in range(lat.nd)])


# --- forces via AD ----------------------------------------------------------

def force_from_action(action_fn: Callable[[jax.Array], jax.Array],
                      u: jax.Array) -> jax.Array:
    """MD force field F with pdot = -F, from any real action S(u).

    JAX's complex gradient G of real S satisfies dS = Re tr(G^T dU)
    summed over links; along dU = P U (P traceless anti-hermitian) this
    gives dS/dt = retr(projTAH(U G^T) P), so

        F_mu(x) = -projTAH( U_mu(x) G_mu(x)^T )

    makes H = K + S exactly conserved by the continuous-time EOM
    (K = -1/2 sum retr(p^2), Udot = p U, pdot = -F).  This replaces
    QEX's hand-derived staple forces (gaugeAction.nim:148-333).
    """
    g = jax.grad(action_fn)(u)
    # per-direction (U G^T)_ac = sum_b U_ab G_cb = U @ adj(conj(G));
    # vmapped explicit products (batched tiny matmuls are slow on TPU)
    m = jax.vmap(lambda uu, gg: linalg.mul_na(uu, jnp.conj(gg)))(u, g)
    return -jax.vmap(group.tah)(m)


def gauge_force(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
                ) -> jax.Array:
    """Force of the full gauge action (QEX gaugeForce/forceA parity).

    Dispatch: hand staple sums for the plaq/adjplaq parts (~3x less
    HBM traffic than the AD graph), AD for rect/pgm remainders."""
    f = None
    if c.plaq != 0.0 or c.adjplaq != 0.0:
        f = gauge_force_hand(c, lat, u)
    if c.rect != 0.0 or c.pgm != 0.0:
        fr = force_from_action(partial(full_action, _ad_part(c), lat), u)
        f = fr if f is None else f + fr
    if f is None:
        f = jnp.zeros_like(u)
    return f


def gauge_grad(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array
               ) -> jax.Array:
    """AD-convention complex gradient of the full gauge action --
    drop-in for ``jax.grad(full_action)`` (used by smear chain rules);
    hand staples for plaq/adjplaq, AD for rect/pgm."""
    g = None
    if c.plaq != 0.0 or c.adjplaq != 0.0:
        g = gauge_grad_hand(c, lat, u)
    if c.rect != 0.0 or c.pgm != 0.0:
        gr = jax.grad(partial(full_action, _ad_part(c), lat))(u)
        g = gr if g is None else g + gr
    if g is None:
        g = jnp.zeros_like(u)
    return g
