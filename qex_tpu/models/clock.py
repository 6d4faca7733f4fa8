"""Z_N clock model Monte Carlo (heatbath + Metropolis).

TPU-native replacement for the reference's 2d clock-model heatbath
examples (src/examples/ heatbath family alongside the XY programs):
spins theta(x) = 2 pi k / N, H = -beta sum_<xy> cos(theta_x - theta_y).

The heatbath is an EXACT discrete Gibbs update: for a checkerboard of
sites, evaluate the conditional weight of all N states against the
frozen neighbor field and sample categorically -- fully vectorized
(no rejection loop needed for discrete states).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def angles(n_states: int) -> jax.Array:
    return 2.0 * jnp.pi * jnp.arange(n_states) / n_states


def energy(k: jax.Array, beta: float, n_states: int) -> jax.Array:
    """H for integer spin field k (values 0..N-1)."""
    th = 2.0 * jnp.pi * k.astype(jnp.float32) / n_states
    e = 0.0
    for mu in range(k.ndim):
        e = e + jnp.sum(jnp.cos(jnp.roll(th, -1, mu) - th))
    return -beta * e


def magnetization(k: jax.Array, n_states: int) -> jax.Array:
    th = 2.0 * jnp.pi * k.astype(jnp.float32) / n_states
    return jnp.abs(jnp.mean(jnp.exp(1j * th)))


def _parity(shape):
    s = 0
    for mu, n in enumerate(shape):
        sh = [1] * len(shape)
        sh[mu] = n
        s = s + jax.lax.broadcasted_iota(jnp.int32, tuple(sh), mu)
    return jnp.broadcast_to(s % 2, shape)


def _neighbor_field(k: jax.Array, n_states: int):
    """(cos_sum, sin_sum) of neighbor spins per site."""
    th = 2.0 * jnp.pi * k.astype(jnp.float32) / n_states
    c = 0.0
    s = 0.0
    for mu in range(k.ndim):
        for sgn in (-1, 1):
            tn = jnp.roll(th, sgn, mu)
            c = c + jnp.cos(tn)
            s = s + jnp.sin(tn)
    return c, s


def heatbath_sweep(key: jax.Array, k: jax.Array, beta: float,
                   n_states: int) -> jax.Array:
    """Exact discrete Gibbs sweep (even then odd checkerboard)."""
    par = _parity(k.shape)
    ang = angles(n_states)
    for p in (0, 1):
        key, kk = jax.random.split(key)
        c, s = _neighbor_field(k, n_states)
        # weight of state a: exp(beta * (cos a * c + sin a * s))
        logits = beta * (jnp.cos(ang)[:, None, None]
                         * c[None] + jnp.sin(ang)[:, None, None]
                         * s[None])
        logits = jnp.moveaxis(logits, 0, -1)  # (..., N)
        new = jax.random.categorical(kk, logits)
        k = jnp.where(par == p, new.astype(k.dtype), k)
    return k


def metropolis_sweep(key: jax.Array, k: jax.Array, beta: float,
                     n_states: int) -> tuple[jax.Array, jax.Array]:
    """Checkerboard Metropolis with uniform state proposals."""
    par = _parity(k.shape)
    acc_tot = 0.0
    for p in (0, 1):
        key, k1, k2 = jax.random.split(key, 3)
        prop = jax.random.randint(k1, k.shape, 0, n_states,
                                  dtype=k.dtype)
        c, s = _neighbor_field(k, n_states)
        th_old = 2.0 * jnp.pi * k.astype(jnp.float32) / n_states
        th_new = 2.0 * jnp.pi * prop.astype(jnp.float32) / n_states
        dE = -beta * ((jnp.cos(th_new) - jnp.cos(th_old)) * c
                      + (jnp.sin(th_new) - jnp.sin(th_old)) * s)
        acc = jax.random.uniform(k2, k.shape) < jnp.exp(-dE)
        upd = jnp.logical_and(acc, par == p)
        k = jnp.where(upd, prop, k)
        acc_tot = acc_tot + jnp.mean(jnp.where(par == p, acc, 0.0)) * 2
    return k, acc_tot / 2
