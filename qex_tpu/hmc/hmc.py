"""HMC trajectory driver: momentum refresh, MD, Metropolis.

TPU-native replacement for QEX's src/hmc/metropolis.nim
(``MetropolisRoot`` generate/start/finish/accept/reject state machine),
src/hmc/hmc.nim:8-17 (``checkReverse``), and the pure-gauge HMC loop of
src/examples/puregaugehmc.nim.

Everything is functional: one jitted ``hmc_step`` maps
(key, u) -> (u', diagnostics); the Markov chain is a host-side loop over
steps (matching the reference's per-trajectory host loop).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import group, linalg
from .integrators import Integrator, integrate


class HMCState(NamedTuple):
    """Per-trajectory diagnostics (QEX MEAS* lines analog)."""

    accepted: jax.Array   # bool
    dH: jax.Array         # H_new - H_old
    h_old: jax.Array
    h_new: jax.Array


def gauge_update_u(u: jax.Array, p: jax.Array, eps: float) -> jax.Array:
    """U <- exp(eps p) U per link (QEX mdt, staghmc_spv.nim:873-888)."""
    from ..ops import linalg as la
    ex = jax.vmap(lambda m: la.expm(m))(eps * p)
    return jax.vmap(la.mul)(ex, u)


def kinetic_energy(p: jax.Array) -> jax.Array:
    """K = -1/2 sum_mu retr(p^2) = +1/2 |p|^2 for TAH momenta."""
    return 0.5 * linalg.norm2(p)


def kinetic_energy2(p: jax.Array):
    """Two-float kinetic energy (hi, lo): compensated |p|^2 reduction
    for exact Metropolis at volume in f32 (ops.dsum; the reference
    accumulates H in f64, src/hmc/metropolis.nim:6-16)."""
    from ..ops import dsum
    return dsum.df_scale(dsum.norm22(p), 0.5)


def hmc_step(key: jax.Array, u: jax.Array,
             action_fn: Callable[[jax.Array], jax.Array],
             force_fn: Callable[[jax.Array], jax.Array],
             scheme: Integrator, tau: float, nsteps: int,
             always_accept: bool | jax.Array = False,
             action2_fn: Callable | None = None,
             compensated_md: bool = False,
             ) -> tuple[jax.Array, HMCState]:
    """One HMC trajectory: refresh p, integrate, Metropolis.

    ``always_accept`` disables the accept test (QEX's warmup
    ``no_metropolis_until`` behavior, staghmc_spv.nim); it may be a
    traced boolean so one compiled step covers warmup and production.
    jit-safe with static (scheme, tau, nsteps, action_fn, force_fn).

    ``action2_fn``: optional two-float action (e.g.
    gauge.action.full_action2) -> the Hamiltonian is carried as an
    (hi, lo) pair and dH keeps sub-ulp resolution at volume in f32
    (the f64-Metropolis role of the reference, metropolis.nim:6-16).

    ``compensated_md``: accumulate MD kicks through two-float
    momenta (integrators.integrate(compensated=True)) -- removes the
    measured f32 sub-ulp kick-loss energy drift that grows ~n^4 with
    the step count (see integrate's docstring; DRIFT_CPU.json).
    Required for valid f32 Metropolis at fine steps / large volume.
    """
    from ..ops import dsum
    nd, nc = u.shape[0], u.shape[1]
    kp, ka = jax.random.split(key)
    p = jax.vmap(lambda k: group.random_tah(
        k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))

    u_new, p_new = integrate(scheme, u, p, tau, nsteps, force_fn,
                             gauge_update_u,
                             compensated=compensated_md)
    if action2_fn is not None:
        h_old2 = dsum.df_add(kinetic_energy2(p), action2_fn(u))
        h_new2 = dsum.df_add(kinetic_energy2(p_new),
                             action2_fn(u_new))
        dH = dsum.df_value(dsum.df_sub(h_new2, h_old2))
        h_old = dsum.df_value(h_old2)
        h_new = dsum.df_value(h_new2)
    else:
        h_old = kinetic_energy(p) + action_fn(u)
        h_new = kinetic_energy(p_new) + action_fn(u_new)
        dH = h_new - h_old

    r = jax.random.uniform(ka, (), jnp.float32)
    acc = jnp.logical_or(jnp.asarray(always_accept), jnp.log(r) < -dH)
    u_out = jnp.where(acc, u_new, u)
    return u_out, HMCState(accepted=acc, dH=dH, h_old=h_old, h_new=h_new)


def hmc_step_guided(key: jax.Array, u: jax.Array,
                    target_action_fn: Callable[[jax.Array], jax.Array],
                    guide_force_fn: Callable[[jax.Array], jax.Array],
                    scheme: Integrator, tau: float, nsteps: int,
                    always_accept: bool = False,
                    ) -> tuple[jax.Array, HMCState]:
    """HMC with a GUIDE action driving the molecular dynamics and the
    TARGET action in the Metropolis test (surrogate-force HMC).

    Valid MCMC for any guide (the leapfrog-family integrator stays
    reversible and volume-preserving for ANY force field; only
    acceptance uses H_target), but practical ONLY when
    S_guide - S_target is nearly constant along trajectories --
    otherwise dH grows with the volume and everything is rejected.
    For the reference's nhmc program semantics (different guide
    dynamics at high acceptance) use qex_tpu.hmc.nambu, which evolves
    Nambu-bracket dynamics conserving the target H.
    """
    nd, nc = u.shape[0], u.shape[1]
    kp, ka = jax.random.split(key)
    p = jax.vmap(lambda k: group.random_tah(
        k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))

    h_old = kinetic_energy(p) + target_action_fn(u)
    u_new, p_new = integrate(scheme, u, p, tau, nsteps, guide_force_fn,
                             gauge_update_u)
    h_new = kinetic_energy(p_new) + target_action_fn(u_new)
    dH = h_new - h_old
    if always_accept:
        acc = jnp.array(True)
    else:
        r = jax.random.uniform(ka, (), jnp.float32)
        acc = jnp.log(r) < -dH
    u_out = jnp.where(acc, u_new, u)
    return u_out, HMCState(accepted=acc, dH=dH, h_old=h_old,
                           h_new=h_new)


def check_reverse(u: jax.Array, p: jax.Array,
                  action_fn: Callable[[jax.Array], jax.Array],
                  force_fn: Callable[[jax.Array], jax.Array],
                  scheme: Integrator, tau: float, nsteps: int
                  ) -> dict:
    """Reversibility test: integrate, flip p, integrate back; report
    |H_back - H_0| and gauge-field deviation.

    QEX parity: ``checkReverse`` (hmc/hmc.nim:8-17; staghmc_spv
    rev_check :1091).
    """
    h0 = kinetic_energy(p) + action_fn(u)
    u1, p1 = integrate(scheme, u, p, tau, nsteps, force_fn, gauge_update_u)
    h1 = kinetic_energy(p1) + action_fn(u1)
    u2, p2 = integrate(scheme, u1, -p1, tau, nsteps, force_fn,
                       gauge_update_u)
    h2 = kinetic_energy(p2) + action_fn(u2)
    return {
        "dH_fwd": h1 - h0,
        "dH_rev": h2 - h0,
        "u_dev2": linalg.norm2(u2 - u) / linalg.norm2(u),
        "p_dev2": linalg.norm2(p2 + p) / linalg.norm2(p),
    }
