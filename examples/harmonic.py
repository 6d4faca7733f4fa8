"""Coupled harmonic oscillators (free scalar field) HMC.

qex_tpu counterpart of reference src/examples/harmonic.nim:
H = (1/2) sum_<i,j> (x_i - x_j)^2 over nearest neighbors, leapfrog
MD, Metropolis accept/reject, recentering, <x> and <x^2> observables.

Run: python examples/harmonic.py -lat:16 -ntraj:4 -nsteps:8 -tau:1.0
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qex_tpu.utils.params import Params

prm = Params(sys.argv[1:])
lat_s = prm.str_param("lat", "16", "lattice size (comma-separated)")
ntraj = prm.int_param("ntraj", 4, "trajectories")
nsteps = prm.int_param("nsteps", 8, "MD steps")
tau = prm.float_param("tau", 1.0, "trajectory length")
seed = prm.int_param("seed", 1, "RNG seed")
use_cpu = prm.bool_param("cpu", True, "force CPU")

import jax  # noqa: E402

if use_cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

shape = tuple(int(s) for s in lat_s.split(","))


def action_x(x):
    s = 0.0
    for mu in range(x.ndim):
        d = x - jnp.roll(x, -1, mu)
        s = s + 0.5 * jnp.sum(d * d)
    return s


@jax.jit
def trajectory(key, x):
    kp, ka = jax.random.split(key)
    p = jax.random.normal(kp, x.shape, x.dtype)
    h0 = action_x(x) + 0.5 * jnp.sum(p * p)
    eps = tau / nsteps
    grad = jax.grad(action_x)

    def step(carry, _):
        x, p = carry
        x = x + 0.5 * eps * p
        p = p - eps * grad(x)
        x = x + 0.5 * eps * p
        return (x, p), None

    (x1, p1), _ = jax.lax.scan(step, (x, p), None, length=nsteps)
    h1 = action_x(x1) + 0.5 * jnp.sum(p1 * p1)
    ds = h1 - h0
    acc = jax.random.uniform(ka, (), x.dtype) < jnp.exp(-ds)
    x_new = jnp.where(acc, x1, x)
    x_new = x_new - jnp.mean(x_new)        # recenter (zero mode)
    return x_new, ds, acc


x = jnp.zeros(shape)
n_acc, ds2 = 0, 0.0
for traj in range(1, ntraj + 1):
    key = jax.random.fold_in(jax.random.PRNGKey(seed), traj)
    x, ds, acc = trajectory(key, x)
    ds2 += float(ds) ** 2
    n_acc += int(acc)
    tag = "Accept" if acc else "Reject"
    print(f"{tag}: {float(ds):.6g}")
    print(f"  ave x: {float(jnp.mean(x)):.6g}")
    print(f"  ave x2: {float(jnp.mean(x * x)):.6g}")

print(f"Acceptance ratio: {n_acc / ntraj}")
print(f"ds2: {ds2 / ntraj:.6g}")
