"""Tutorial 1 — gauge fields, parallel transport, average plaquette.

qex_tpu counterpart of reference src/examples/ex1.nim: build a unit
(or random) gauge field and measure the average plaquette with
transporters.

Run: python examples/ex1.py [-lat:8,8,8,8] [-random:true] [-cpu:true]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from qex_tpu.utils.params import Params

prm = Params(sys.argv[1:])
use_cpu = prm.bool_param("cpu", True, "force CPU")
lat_s = prm.str_param("lat", "4,4,4,4", "lattice size")
use_random = prm.bool_param("random", False, "random gauge start")
seed = prm.int_param("seed", 7, "RNG seed")

import jax  # noqa: E402

if use_cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from qex_tpu.gauge import loops  # noqa: E402
from qex_tpu.lattice import Lattice  # noqa: E402
from qex_tpu.ops import group  # noqa: E402

shape = tuple(int(x) for x in lat_s.split(","))
lat = Lattice(shape)
print(f"lattice {shape} on {jax.devices()[0]}")


@jax.jit
def make(key):
    if use_random:
        return jnp.stack([
            group.random_su(jax.random.fold_in(key, mu), lat.dims,
                            lat.nc, jnp.complex64)
            for mu in range(lat.nd)])
    return group.unit_gauge(lat, jnp.complex64)


@jax.jit
def plaq(u):
    # average plaquette Re tr P / nc over all planes (ex1.nim:3-15)
    return loops.plaquette(lat, u)


u = make(jax.random.PRNGKey(seed))
print(f"average plaq: {float(plaq(u)):.8g}")
