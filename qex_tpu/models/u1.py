"""Compact U(1) pure-gauge model in the angle representation.

TPU-native replacement for QEX's 2D U(1) example family:

* ``src/examples/puregauge2du1.nim`` — HMC with Wilson plaquette
  action, topological charge ``topo2DU1`` (:33-57), maximal-tree gauge
  fixing ``maxTreeFix`` (:58-69).
* ``src/examples/puregaugehb2du1.nim`` — even/odd heatbath with
  von Mises link sampling (:66-75) and microcanonical over-relaxation
  flips (:77-103).
* ``src/examples/puregaugehb2du1.nims`` and the heatbath variants.

Design (angle representation, not a port): a U(1) link is a single
phase, so the field is the REAL array ``theta[mu, x...]`` and the
group is additive — ``exp(i theta)`` never needs to be materialized
for the HMC update (theta += dt*p), the force is ``jax.grad`` of the
real action, and the heatbath staple sum is the only place complex
arithmetic appears.  Works in any dimension (the reference family is
2D); all updates are whole-checkerboard masked ops (no site loops).

Conventions:
  S(theta) = beta * sum_{x, mu<nu} (1 - cos F_munu(x)),
  F_munu(x) = theta_mu(x) + theta_nu(x+mu) - theta_mu(x+nu)
              - theta_nu(x)   (the plaquette phase),
  Q = sum_x wrap(F_01(x)) / 2pi   (2D; exactly integer on the torus).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ..hmc.integrators import get_integrator
from .xy import _parity_mask, _sample_von_mises


# --- geometry helpers -------------------------------------------------------

def _roll(f: jax.Array, mu: int, dist: int) -> jax.Array:
    """f(x + dist*mu_hat): lattice axes are the trailing ndim-1 axes of
    theta[mu, ...]; here f is a single component (no leading axis)."""
    return jnp.roll(f, -dist, axis=mu)


def plaq_angle(theta: jax.Array, mu: int, nu: int) -> jax.Array:
    """F_munu(x) = theta_mu(x) + theta_nu(x+mu) - theta_mu(x+nu)
    - theta_nu(x)."""
    return (theta[mu] + _roll(theta[nu], mu, 1)
            - _roll(theta[mu], nu, 1) - theta[nu])


def _planes(nd: int):
    return [(mu, nu) for nu in range(nd) for mu in range(nu)]


def action(theta: jax.Array, beta: float) -> jax.Array:
    """Wilson action beta * sum (1 - cos F) over all planes
    (gaugeAction2 with GaugeActionCoeffs(plaq: beta) at nc=1,
    puregauge2du1.nim:95)."""
    nd = theta.shape[0]
    s = 0.0
    for mu, nu in _planes(nd):
        f = plaq_angle(theta, mu, nu)
        s = s + jnp.sum(1.0 - jnp.cos(f))
    return beta * s


def plaquette(theta: jax.Array) -> jax.Array:
    """Mean plaquette as a complex number (plaq3 analog,
    puregauge2du1.nim:283): mean over planes and sites of exp(i F)."""
    nd = theta.shape[0]
    tot = 0.0 + 0.0j
    n = 0
    for mu, nu in _planes(nd):
        f = plaq_angle(theta, mu, nu)
        tot = tot + jnp.sum(jnp.exp(1j * f))
        n += f.size
    return tot / n


def topo_charge(theta: jax.Array) -> jax.Array:
    """Q = sum_planes sum_x wrap(F)/2pi (topo2DU1,
    puregauge2du1.nim:33-57).  wrap(F) = atan2(sin F, cos F) maps each
    plaquette phase to (-pi, pi]; on the 2D torus the raw F telescope
    to zero, so Q is exactly integer."""
    nd = theta.shape[0]
    q = 0.0
    for mu, nu in _planes(nd):
        f = plaq_angle(theta, mu, nu)
        q = q + jnp.sum(jnp.arctan2(jnp.sin(f), jnp.cos(f)))
    return q / (2.0 * jnp.pi)


def force(theta: jax.Array, beta: float) -> jax.Array:
    """dS/dtheta (the U(1) analog of gaugeforce2,
    puregauge2du1.nim:121): exact via AD of the real action."""
    return jax.grad(action)(theta, beta)


# --- maximal-tree gauge fixing ----------------------------------------------

def max_tree_mask(shape: Sequence[int]) -> jax.Array:
    """Boolean mask of links on the maximal tree (maxTreeFix,
    puregauge2du1.nim:58-69): link (x, mu) is on the tree iff
    x_mu < L_mu - 1 and x_nu == 0 for all nu > mu.  Gauge freedom can
    set every tree link to a fixed value; HMC in the fixed gauge zeroes
    tree momenta/forces."""
    nd = len(shape)
    masks = []
    for mu in range(nd):
        m = None
        for nu in range(nd):
            sh = [1] * nd
            sh[nu] = shape[nu]
            co = jax.lax.broadcasted_iota(jnp.int32, tuple(sh), nu)
            if nu == mu:
                cond = co < shape[nu] - 1
            elif nu > mu:
                cond = co == 0
            else:
                continue
            m = cond if m is None else jnp.logical_and(m, cond)
        masks.append(jnp.broadcast_to(
            m if m is not None else jnp.array(True), tuple(shape)))
    return jnp.stack(masks)


# --- HMC ---------------------------------------------------------------------

def hmc_step(key: jax.Array, theta: jax.Array, beta: float,
             tau: float, steps: int, scheme: str = "2MN",
             gfix: bool = False):
    """One HMC trajectory (puregauge2du1.nim main loop :215-276).

    Flat phase space: T-step is theta += dt*p, V-step is
    p -= dt*grad S.  Force-gradient (FG) kicks use the exact
    Hessian-vector product via jvp (flat-space gaugeDerivDeriv2).
    With ``gfix`` the maximal-tree links are frozen (momenta and
    forces masked), sampling the gauge-fixed distribution.

    Returns (theta', stats) with stats = dict(dH, accept, plaq, topo).
    """
    sch = get_integrator(scheme)
    tree = max_tree_mask(theta.shape[1:]) if gfix else None
    dt = tau / steps

    key, kp, ka = jax.random.split(key, 3)
    p = jax.random.normal(kp, theta.shape, theta.dtype)
    if tree is not None:
        p = jnp.where(tree, 0.0, p)

    def grad_s(th):
        g = jax.grad(action)(th, beta)
        return jnp.where(tree, 0.0, g) if tree is not None else g

    h0 = action(theta, beta) + 0.5 * jnp.sum(p * p)

    th, mom = theta, p
    for _rep in range(steps):
        for st in sch.steps:
            if st[0] == "T":
                th = th + (st[1] * dt) * mom
            elif st[0] == "V":
                if st[1] != 0.0:
                    mom = mom - (st[1] * dt) * grad_s(th)
            elif st[0] == "FG":
                c, xi = st[1], st[2]
                if c == 0.0:
                    continue
                # F_eff = grad S(theta - a grad S) to first order
                # (integrators.fg_force convention, a = 2 xi dt^2/c)
                a = 2.0 * xi * dt * dt / c
                f0, hf = jax.jvp(grad_s, (th,), (grad_s(th),))
                mom = mom - (c * dt) * (f0 - a * hf)
            else:  # pragma: no cover
                raise ValueError(f"bad step kind {st[0]}")

    h1 = action(th, beta) + 0.5 * jnp.sum(mom * mom)
    dh = h1 - h0
    acc = jax.random.uniform(ka, (), theta.dtype) < jnp.exp(-dh)
    theta_new = jnp.where(acc, th, theta)
    stats = {"dH": dh, "accept": acc,
             "plaq": jnp.real(plaquette(theta_new)),
             "topo": topo_charge(theta_new)}
    return theta_new, stats


# --- heatbath + over-relaxation ----------------------------------------------

def staple_sum(theta: jax.Array, mu: int) -> jax.Array:
    """Complex staple sum W_mu(x) such that the theta_mu(x)-dependent
    part of -S/beta is Re[exp(i theta_mu(x)) * conj(W)] = |W| cos(theta
    - arg W)  (sumStaples, puregaugehb2du1.nim:5-17)."""
    nd = theta.shape[0]
    u = jnp.exp(1j * theta)
    w = jnp.zeros(theta.shape[1:], u.dtype)
    for nu in range(nd):
        if nu == mu:
            continue
        # upper staple: u_nu(x+mu) u_mu(x+nu)^* u_nu(x)^*
        w = w + (_roll(u[nu], mu, 1) * jnp.conj(_roll(u[mu], nu, 1))
                 * jnp.conj(u[nu]))
        # lower staple: u_nu(x+mu-nu)^* u_mu(x-nu)^* u_nu(x-nu)
        w = w + (jnp.conj(_roll(_roll(u[nu], mu, 1), nu, -1))
                 * jnp.conj(_roll(u[mu], nu, -1))
                 * _roll(u[nu], nu, -1))
    # w accumulated exp(i(F - theta_mu(x))): Re[u_mu(x) w] = sum cos F,
    # so the theta-dependent weight is exp(beta Re[u w]) =
    # exp(beta |w| cos(theta + arg w)).  Return conj(w) so callers see
    # the docstring convention |W| cos(theta - arg W).
    return jnp.conj(w)


def heatbath_sweep(key: jax.Array, theta: jax.Array, beta: float,
                   over_relax: int = 1) -> jax.Array:
    """One even/odd heatbath sweep + ``over_relax`` microcanonical
    over-relaxation sweeps (puregaugehb2du1.nim evolve :43-103).

    Heatbath: theta_mu(x) | staples ~ vonMises(arg W, beta |W|),
    sampled for a whole parity class of one direction at a time (the
    staples of same-parity links of one mu are disjoint from each
    other).  Over-relaxation reflects theta about the staple angle:
    theta -> 2 arg W - theta, which preserves the action exactly.
    """
    nd = theta.shape[0]
    par = _parity_mask(theta.shape[1:])
    for p in (0, 1):
        for mu in range(nd):
            key, k = jax.random.split(key)
            w = staple_sum(theta, mu)
            lam = beta * jnp.abs(w)
            phi = jnp.angle(w)
            smp = _sample_von_mises(k, lam, lam.shape)
            new = phi + smp
            theta = theta.at[mu].set(
                jnp.where(par == p, new, theta[mu]))
    for _ in range(over_relax):
        theta = over_relax_sweep(theta)
    return theta


def over_relax_sweep(theta: jax.Array) -> jax.Array:
    """One microcanonical over-relaxation sweep: reflect each link
    about its staple angle, theta -> 2 arg W - theta, per parity and
    direction.  Preserves the action exactly
    (puregaugehb2du1.nim:77-103)."""
    nd = theta.shape[0]
    par = _parity_mask(theta.shape[1:])
    for p in (0, 1):
        for mu in range(nd):
            w = staple_sum(theta, mu)
            phi = jnp.angle(w)
            new = 2.0 * phi - theta[mu]
            theta = theta.at[mu].set(
                jnp.where(par == p, new, theta[mu]))
    return theta


# --- gradient flow ------------------------------------------------------------

def gauge_flow(theta: jax.Array, eps: float, steps: int) -> jax.Array:
    """U(1) gradient flow dtheta/dt = -dS/dtheta at unit coupling, RK4
    (the 2D analog of gauge_flow's wflow; drives F to multiples of
    2pi, freezing Q)."""

    def g(th):
        return -jax.grad(action)(th, 1.0)

    def step(th, _):
        k1 = g(th)
        k2 = g(th + 0.5 * eps * k1)
        k3 = g(th + 0.5 * eps * k2)
        k4 = g(th + eps * k3)
        return th + (eps / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    theta, _ = jax.lax.scan(step, theta, None, length=steps)
    return theta


def random_field(key: jax.Array, shape: Sequence[int],
                 dtype=jnp.float64) -> jax.Array:
    """Random start: theta ~ U(-pi, pi) per link (g.random r)."""
    return jax.random.uniform(key, tuple(shape), dtype,
                              minval=-jnp.pi, maxval=jnp.pi)
