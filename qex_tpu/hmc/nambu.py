"""Nambu-bracket HMC for pure gauge theory (two adjoint momenta).

TPU-native replacement for QEX's src/nhmc/puregaugenhmc.nim: the MD
evolves under NAMBU mechanics with two Hamiltonians,

    H  = 1/4 |pi|^2 + 1/4 |qi|^2 + S_target(U)      (accept/reject)
    H' = 1/4 |qi|^2 + S_guide(U)                     (auxiliary)

where pi, qi are su(N)-adjoint-component momentum fields and the
equations of motion couple them multiplicatively (the Nambu bracket):

    Udot   = expand(pi * qi) U                (component product)
    pidot  = -(F_target - F_guide)_a qi_a
    qidot  = -(F_guide)_a pi_a

integrated with the reference's splitting (U half-steps bracketing
P(1/2) Q(1) P(1/2)).  The guide action may be stout-smeared and/or a
clover topological-charge term with metadynamics bias; all guide
forces come from jax.grad (replacing purestout's hand chain).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..gauge.action import force_from_action
from ..ops import group, linalg


def su_generators(nc: int = 3) -> np.ndarray:
    """Antihermitian su(nc) basis T_a with tr(T_a T_b) = -delta_ab/2
    (i/2 x Gell-Mann for nc=3)."""
    gens = []
    # off-diagonal symmetric and antisymmetric pairs
    for i in range(nc):
        for j in range(i + 1, nc):
            m = np.zeros((nc, nc), complex)
            m[i, j] = m[j, i] = 1.0
            gens.append(m)
            m = np.zeros((nc, nc), complex)
            m[i, j] = -1j
            m[j, i] = 1j
            gens.append(m)
    # diagonal
    for k in range(1, nc):
        m = np.zeros((nc, nc), complex)
        for i in range(k):
            m[i, i] = 1.0
        m[k, k] = -k
        m *= np.sqrt(2.0 / (k * (k + 1)))
        gens.append(m)
    lam = np.stack(gens)          # hermitian, tr(lam_a lam_b) = 2 delta
    return 0.5j * lam             # antihermitian, tr = -delta/2


def project_ta(f: jax.Array, gens: jax.Array) -> jax.Array:
    """TAH matrix field (nd, nc, nc, *dims) -> adjoint components
    (nd, dA, *dims) real: v_a = -2 Re tr(T_a f)."""
    return -2.0 * jnp.real(jnp.einsum("aij,dji...->da...", gens, f))


def expand_ta(v: jax.Array, gens: jax.Array) -> jax.Array:
    """Adjoint components -> TAH matrix field: sum_a v_a T_a."""
    return jnp.einsum("da...,aij->dij...", v.astype(gens.dtype), gens)


@dataclasses.dataclass(frozen=True)
class NambuSystem:
    target_action: Callable
    guide_action: Callable
    gens: jax.Array
    # optional explicit forces (e.g. gauge.action.gauge_force hand
    # staples); default AD through the action callables
    target_force: Callable | None = None
    guide_force: Callable | None = None

    def forces(self, u):
        ft = (self.target_force(u) if self.target_force is not None
              else force_from_action(self.target_action, u))
        fg = (self.guide_force(u) if self.guide_force is not None
              else force_from_action(self.guide_action, u))
        return (project_ta(ft - fg, self.gens),
                project_ta(fg, self.gens))


def nambu_trajectory(sys: NambuSystem, u, pi, qi, tau: float,
                     nsteps: int):
    """The reference's splitting: U(1/2) [P(1/2) Q(1) P(1/2) U(1)]^n
    with U half-steps at both ends (puregaugenhmc.nim main loop)."""
    dt = tau / nsteps

    def update_u(u, pi, qi, eps):
        fi = pi * qi
        ex = jax.vmap(linalg.expm)(eps * expand_ta(fi, sys.gens))
        return jax.vmap(linalg.mul)(ex, u)

    def step(carry, i):
        u, pi, qi = carry
        eps_u = dt  # full step except boundaries handled outside
        u = update_u(u, pi, qi, eps_u)
        fdiff, fguide = sys.forces(u)
        pi = pi - (0.5 * dt) * fdiff * qi
        qi = qi - dt * fguide * pi
        pi = pi - (0.5 * dt) * fdiff * qi
        return (u, pi, qi), None

    # first U half-step
    u = update_u(u, pi, qi, 0.5 * dt)
    fdiff, fguide = sys.forces(u)
    pi = pi - (0.5 * dt) * fdiff * qi
    qi = qi - dt * fguide * pi
    pi = pi - (0.5 * dt) * fdiff * qi
    (u, pi, qi), _ = jax.lax.scan(step, (u, pi, qi), None,
                                  length=nsteps - 1)
    u = update_u(u, pi, qi, 0.5 * dt)
    return u, pi, qi


def kinetic(v: jax.Array) -> jax.Array:
    """1/4 |v|^2 (reference uiNorm2 + hamiltonian normalization)."""
    return 0.25 * jnp.sum(v * v)


def draw_adjoint_momentum(key, u_shape, gens, nd, dtype):
    """randomTAH then projectTa (reference drawMomentum)."""
    nc = gens.shape[-1]
    p = jax.vmap(lambda k: group.random_tah(k, u_shape, nc, dtype))(
        jax.random.split(key, nd))
    return project_ta(p, gens)


def metadynamics_bias(q: jax.Array, centers: jax.Array,
                      counts: jax.Array, amplitude: float,
                      sdev: float) -> jax.Array:
    """Metadynamics bias potential over deposited topological-charge
    history (puregaugenhmc.nim NActTopoCloverStoutMeta):

        V(q) = sum_i counts_i * A * [ exp(-(q-c_i)^2 / 2 s^2)
                                    + exp(-(q+c_i)^2 / 2 s^2) ]

    ``centers``/``counts`` are fixed-size arrays (zero counts for
    unused slots) so the guide stays jittable as the history grows.
    """
    d1 = q - centers
    d2 = q + centers
    g = jnp.exp(-0.5 * (d1 * d1) / (sdev * sdev)) \
        + jnp.exp(-0.5 * (d2 * d2) / (sdev * sdev))
    return amplitude * jnp.sum(counts * g)


class MetaHistory:
    """Host-side deposited-charge histogram (fixed jit-size buffers)."""

    def __init__(self, max_slots: int = 64):
        self.centers = np.zeros(max_slots, np.float32)
        self.counts = np.zeros(max_slots, np.float32)

    def deposit(self, q: float) -> None:
        c = float(abs(round(q)))
        occupied = np.where((self.counts > 0)
                            & (self.centers == c))[0]
        if len(occupied):
            self.counts[occupied[0]] += 1
            return
        free = np.where(self.counts == 0)[0]
        if len(free):
            self.centers[free[0]] = c
            self.counts[free[0]] = 1

    def arrays(self):
        return jnp.asarray(self.centers), jnp.asarray(self.counts)


def nambu_hmc_step(key, u, sys: NambuSystem, tau: float, nsteps: int,
                   always_accept: bool = False):
    """One Nambu-HMC trajectory with Metropolis on the target H."""
    nd = u.shape[0]
    kp, kq, ka = jax.random.split(key, 3)
    dims = u.shape[3:]
    pi = draw_adjoint_momentum(kp, dims, sys.gens, nd, u.dtype)
    qi = draw_adjoint_momentum(kq, dims, sys.gens, nd, u.dtype)
    h0 = kinetic(pi) + kinetic(qi) + sys.target_action(u)
    g0 = kinetic(qi) + sys.guide_action(u)
    u1, pi1, qi1 = nambu_trajectory(sys, u, pi, qi, tau, nsteps)
    h1 = kinetic(pi1) + kinetic(qi1) + sys.target_action(u1)
    g1 = kinetic(qi1) + sys.guide_action(u1)
    dH = h1 - h0
    dG = g1 - g0
    acc = jnp.logical_or(
        jnp.asarray(always_accept),
        jnp.log(jax.random.uniform(ka, (), jnp.float32)) < -dH)
    u_out = jnp.where(acc, u1, u)
    return u_out, dH, dG, acc
