"""Tutorial 0 — lattices, fields, even/odd halves, shifts.

qex_tpu counterpart of reference src/examples/ex0.nim: create a
layout, color vector/matrix fields, mixed even/odd assignment, and
shifts.  Everything is a JAX array; "threads:" blocks are simply not
needed (XLA owns the parallelism), and on TPU you wrap work in
``jax.jit``.

Run: python examples/ex0.py [-cpu:true]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qex_tpu.utils.params import Params

prm = Params(sys.argv[1:])
use_cpu = prm.bool_param("cpu", True, "force CPU")

import jax  # noqa: E402

if use_cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from qex_tpu.lattice import Lattice  # noqa: E402
from qex_tpu.ops import linalg, shifts  # noqa: E402

lat = Lattice((4, 4, 4, 4))
print(f"Hello from device {jax.devices()[0]} "
      f"(n_devices={jax.device_count()})")


def parity(shape):
    """(x + y + z + t) mod 2 site mask."""
    s = 0
    for mu, n in enumerate(shape):
        sh = [1] * len(shape)
        sh[mu] = n
        s = s + jax.lax.broadcasted_iota(jnp.int32, tuple(sh), mu)
    return jnp.broadcast_to(s % 2, shape)


@jax.jit
def demo():
    # fields: site tensor axes leading, lattice axes trailing
    v1 = jnp.full((3,) + lat.dims, 2.0 + 0j, jnp.complex64)
    m1 = jnp.broadcast_to(
        jnp.eye(3, dtype=jnp.complex64)[..., None, None, None, None],
        (3, 3) + lat.dims)

    # v2.even := m1 * v1 ; v2.odd := 3   (ex0.nim:14-17)
    par = parity(lat.dims)
    v2 = jnp.where(par == 0, linalg.mv(m1, v1), 3.0 + 0j)
    n_even = linalg.norm2(jnp.where(par == 0, v2, 0))
    n_odd = linalg.norm2(jnp.where(par == 1, v2, 0))

    # shift(v1, dir=0, len=1); then dir=3, len=2  (ex0.nim:20-23)
    v1b = shifts.shift(v2, 0, +1, nd=4)
    v2b = shifts.shift(v1b, 3, +1, nd=4, dist=2)
    n_even2 = linalg.norm2(jnp.where(par == 0, v2b, 0))
    n_odd2 = linalg.norm2(jnp.where(par == 1, v2b, 0))
    return n_even, n_odd, n_even2, n_odd2


ne, no, ne2, no2 = demo()
print(f"v2 even: {float(ne):g}")
print(f"v2 odd: {float(no):g}")
print(f"shifted even: {float(ne2):g}")
print(f"shifted odd: {float(no2):g}")
