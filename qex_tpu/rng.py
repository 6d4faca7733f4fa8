"""Parallel RNG streams for lattice fields.

TPU-native replacement for QEX's RNG layer (src/rng/milcrng.nim,
src/rng/mrg32k3a.nim, per-site RNG fields seeded by lexicographic index,
src/rng/distributionUtils.nim:26-80).

QEX carries a per-site RNG *field* so that random draws are independent
of the rank layout and checkpoint exactly.  Here the same guarantees come
from JAX's counter-based threefry PRNG: a draw is a pure function of
``(key, draw_counter, logical array shape)`` -- identical for any device
mesh sharding -- so the "RNG field" collapses to a key plus an integer
counter, both trivially checkpointable (see qex_tpu.io.checkpoint).

Not bitwise MILC-compatible; golden values are regenerated (SURVEY.md §7).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class LatticeRNG:
    """A resumable RNG stream: root key + draw counter.

    Each draw uses ``fold_in(root, counter)`` and bumps the counter, so
    state = (seed, counter) reproduces the stream exactly after restart
    (QEX parity: RNG-field checkpoint, staghmc_spv_rng.nim:135-182).
    """

    seed: int
    counter: int = 0

    def next_key(self) -> jax.Array:
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self.counter)
        self.counter += 1
        return key

    def state(self) -> dict:
        return {"seed": int(self.seed), "counter": int(self.counter)}

    @classmethod
    def from_state(cls, state: dict) -> "LatticeRNG":
        return cls(seed=int(state["seed"]), counter=int(state["counter"]))


def uniform(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    return jax.random.uniform(key, shape, dtype)


def gaussian(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Unit normals (QEX ``gaussian``, distributionUtils.nim:26-80)."""
    return jax.random.normal(key, shape, dtype)


def gaussian_complex(key: jax.Array, shape, dtype=jnp.complex64) -> jax.Array:
    """Complex gaussian with unit variance per real component.

    QEX's ``gaussian`` on complex element types draws each real component
    as a unit normal, giving E|z|^2 = 2; matched here.
    """
    rdtype = jnp.finfo(dtype).dtype
    kr, ki = jax.random.split(key)
    z = (jax.random.normal(kr, shape, rdtype)
         + 1j * jax.random.normal(ki, shape, rdtype))
    return z.astype(dtype)


def z4_noise(key: jax.Array, shape, dtype=jnp.complex64) -> jax.Array:
    """Z4 noise: uniform over {1, i, -1, -i} (QEX distribution.nim)."""
    k = jax.random.randint(key, shape, 0, 4)
    vals = jnp.array([1, 1j, -1, -1j], dtype=dtype)
    return vals[k]


def z2_noise(key: jax.Array, shape, dtype=jnp.complex64) -> jax.Array:
    """Z2 noise: uniform over {+1, -1}."""
    k = jax.random.randint(key, shape, 0, 2)
    return (1.0 - 2.0 * k).astype(dtype)


def u1_noise(key: jax.Array, shape, dtype=jnp.complex64) -> jax.Array:
    """U(1) noise: exp(i theta), theta ~ U[0, 2pi)."""
    rdtype = jnp.finfo(dtype).dtype
    th = jax.random.uniform(key, shape, rdtype, 0.0, 2.0 * jnp.pi)
    return jnp.exp(1j * th).astype(dtype)
