"""2D (any-D) XY model Monte Carlo: heatbath, Metropolis, Wolff
cluster, and U(1) spin gradient flow.

TPU-native replacement for QEX's src/xy_cluster_mc/xy_cluster.nim
(Wolff cluster :198-273, spin flow) and src/xy_heatbath_mc/.

H = -beta * sum_{x,mu} cos(theta(x) - theta(x+mu)).

Design notes (jit-friendly rewrites of inherently sequential
algorithms):

* Heatbath: the conditional distribution of theta(x) is von Mises with
  parameter kappa = beta*|h(x)| around the local-field angle.  Sampled
  with the Best-Fisher (1979) rejection scheme run as a MASKED
  fixed-iteration loop over whole checkerboards -- every site of one
  parity updates simultaneously.
* Wolff cluster: the cluster containing the seed is found by iterative
  label propagation over frozen bonds (a vectorized
  connected-components pass, O(diameter) sweeps under lax.while_loop)
  and reflected as one masked update.  Identical Markov kernel to the
  sequential stack-based growth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def energy(theta: jax.Array, beta: float) -> jax.Array:
    """H = -beta sum_{x,mu} cos(dtheta_mu)."""
    e = 0.0
    for mu in range(theta.ndim):
        e = e + jnp.sum(jnp.cos(jnp.roll(theta, -1, mu) - theta))
    return -beta * e


def magnetization(theta: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(|M|, arg M) with M = mean exp(i theta)."""
    m = jnp.mean(jnp.exp(1j * theta))
    return jnp.abs(m), jnp.angle(m)


def _local_field(theta: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(magnitude, angle) of h(x) = sum_neighbors exp(i theta_nbr)."""
    h = 0.0
    for mu in range(theta.ndim):
        h = h + jnp.exp(1j * jnp.roll(theta, -1, mu)) \
            + jnp.exp(1j * jnp.roll(theta, 1, mu))
    return jnp.abs(h), jnp.angle(h)


def _parity_mask(shape) -> jax.Array:
    s = 0
    for mu, n in enumerate(shape):
        sh = [1] * len(shape)
        sh[mu] = n
        s = s + jax.lax.broadcasted_iota(jnp.int32, tuple(sh), mu)
    return jnp.broadcast_to(s % 2, shape)


def _sample_von_mises(key, kappa, shape, n_iter: int = 32):
    """Best-Fisher rejection sampling of von Mises(0, kappa), masked
    fixed-point loop (all kappa entries sampled in parallel)."""
    tau = 1.0 + jnp.sqrt(1.0 + 4.0 * kappa * kappa)
    rho = (tau - jnp.sqrt(2.0 * tau)) / (2.0 * kappa + 1e-30)
    r = (1.0 + rho * rho) / (2.0 * rho + 1e-30)

    def body(carry):
        key, theta, done, it = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        u1 = jax.random.uniform(k1, shape)
        u2 = jax.random.uniform(k2, shape)
        u3 = jax.random.uniform(k3, shape)
        z = jnp.cos(jnp.pi * u1)
        f = (1.0 + r * z) / (r + z)
        c = kappa * (r - f)
        accept = jnp.logical_or(c * (2.0 - c) - u2 > 0,
                                jnp.log(c / (u2 + 1e-30)) + 1.0 - c
                                >= 0)
        new_theta = jnp.sign(u3 - 0.5) * jnp.arccos(
            jnp.clip(f, -1.0, 1.0))
        theta = jnp.where(jnp.logical_and(accept,
                                          jnp.logical_not(done)),
                          new_theta, theta)
        done = jnp.logical_or(done, accept)
        return key, theta, done, it + 1

    def cond(carry):
        _, _, done, it = carry
        return jnp.logical_and(jnp.logical_not(jnp.all(done)),
                               it < n_iter)

    # kappa ~ 0: distribution is uniform; seed with uniform fallback
    key, ku = jax.random.split(key)
    theta0 = jax.random.uniform(ku, shape, minval=-jnp.pi,
                                maxval=jnp.pi)
    small = kappa < 1e-6
    _, theta, done, _ = jax.lax.while_loop(
        cond, body, (key, theta0, small, jnp.zeros((), jnp.int32)))
    return theta


def heatbath_sweep(key: jax.Array, theta: jax.Array, beta: float
                   ) -> jax.Array:
    """One even+odd checkerboard heatbath sweep (xy_heatbath_mc
    parity)."""
    par = _parity_mask(theta.shape)
    for p in (0, 1):
        key, k = jax.random.split(key)
        hmag, hang = _local_field(theta)
        sample = _sample_von_mises(k, beta * hmag, theta.shape)
        new = hang + sample
        theta = jnp.where(par == p, new, theta)
    return theta


def metropolis_sweep(key: jax.Array, theta: jax.Array, beta: float,
                     delta: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Checkerboard Metropolis sweep; returns (theta, acc_rate)."""
    par = _parity_mask(theta.shape)
    acc_tot = 0.0
    for p in (0, 1):
        key, k1, k2 = jax.random.split(key, 3)
        prop = theta + delta * jax.random.uniform(
            k1, theta.shape, minval=-1.0, maxval=1.0)
        hmag, hang = _local_field(theta)
        dE = -beta * hmag * (jnp.cos(prop - hang)
                             - jnp.cos(theta - hang))
        acc = jax.random.uniform(k2, theta.shape) < jnp.exp(-dE)
        upd = jnp.logical_and(acc, par == p)
        theta = jnp.where(upd, prop, theta)
        acc_tot = acc_tot + jnp.mean(jnp.where(par == p, acc, 0.0)) * 2
    return theta, acc_tot / 2


def wolff_update(key: jax.Array, theta: jax.Array, beta: float
                 ) -> tuple[jax.Array, jax.Array]:
    """One Wolff cluster reflection (xy_cluster.nim:198-273 kernel).

    Returns (theta, cluster_fraction).  Reflection about a random unit
    vector r: s -> s - 2 (s.r) r, i.e. theta -> 2*alpha + pi - theta.
    Bond freeze probability p = 1 - exp(min(0, -2 beta sx sy)) with
    s = cos(theta - alpha).
    """
    nd = theta.ndim
    key, ka, ks, kb = jax.random.split(key, 4)
    alpha = jax.random.uniform(ka, (), minval=0.0, maxval=2 * jnp.pi)
    s = jnp.cos(theta - alpha)          # spin component along r

    # frozen bonds per direction
    bonds = []
    keys = jax.random.split(kb, nd)
    for mu in range(nd):
        s_nbr = jnp.roll(s, -1, mu)
        p = 1.0 - jnp.exp(jnp.minimum(0.0, -2.0 * beta * s * s_nbr))
        bonds.append(jax.random.uniform(keys[mu], theta.shape) < p)

    # seed site: random flat index
    seed = jax.random.randint(ks, (), 0, theta.size)
    in_cluster = (jnp.arange(theta.size).reshape(theta.shape) == seed)

    def propagate(carry):
        mask, changed = carry
        new = mask
        for mu in range(nd):
            b = bonds[mu]
            # bond (x, x+mu): membership flows both ways
            new = jnp.logical_or(new, jnp.logical_and(
                jnp.roll(mask, -1, mu), b))
            new = jnp.logical_or(new, jnp.roll(
                jnp.logical_and(mask, b), 1, mu))
        return (new, jnp.any(new != mask))

    def cond(carry):
        _, changed = carry
        return changed

    mask, _ = jax.lax.while_loop(cond, propagate,
                                 (in_cluster, jnp.array(True)))
    theta_new = jnp.where(mask, 2.0 * alpha + jnp.pi - theta, theta)
    return theta_new, jnp.mean(mask.astype(jnp.float32))


def spin_flow(theta: jax.Array, eps: float, steps: int) -> jax.Array:
    """U(1) gradient flow of the spins: dtheta/dt = -dH/dtheta
    (unit coupling), RK4 integration (xy_cluster.nim spin-flow
    analog)."""

    def grad_h(th):
        g = 0.0
        for mu in range(th.ndim):
            g = g + jnp.sin(th - jnp.roll(th, -1, mu)) \
                + jnp.sin(th - jnp.roll(th, 1, mu))
        return g

    def step(th, _):
        k1 = -grad_h(th)
        k2 = -grad_h(th + 0.5 * eps * k1)
        k3 = -grad_h(th + 0.5 * eps * k2)
        k4 = -grad_h(th + eps * k3)
        return th + (eps / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

    theta, _ = jax.lax.scan(step, theta, None, length=steps)
    return theta
