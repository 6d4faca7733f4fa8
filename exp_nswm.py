"""Scratch-watermark test v2 (poison-aware: one failure ends the probe).

Runs the 5.6 GiB-temp chain-force program, frees everything, then
counts how many 1 GiB chunks are allocatable.  ~12 => frees recover
fully (no watermark); ~7 => the runtime retains a scratch arena sized
to the biggest program temp seen.
"""
import gc

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge.smear import HypCoefs
from qex_tpu.mcmc.theory import (FermionSpec, GaugeActionSpec,
                                 LatticeFieldTheory)
from qex_tpu.mcmc import md as md_mod
from qex_tpu.ops import group
from qex_tpu.solvers.base import SolverParams

print("backend:", jax.default_backend(), flush=True)
lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
th = LatticeFieldTheory(
    lat,
    gauge=GaugeActionSpec(ga.wilson(7.0), steps=12, scheme="2MN"),
    fermions=[FermionSpec("fermion", mass=0.05, steps=6, scheme="2MN",
                          smeared=True),
              FermionSpec("boson", mass=0.5, steps=6, scheme="2MN",
                          smeared=True)],
    smear=HypCoefs(0.4, 0.5, 0.5), bc="pppa",
    solver_params=SolverParams(r2req=1e-10, maxits=1500, restarts=3),
    force_solver_params=SolverParams(r2req=1e-8, maxits=1500,
                                     restarts=2),
    tau=0.5)

u = jax.jit(lambda: group.unit_gauge(lat, dtype))()
phi = jax.jit(lambda: jnp.zeros(
    (3,) + lat.dims[:-1] + (lat.dims[-1] // 2,), dtype))()
md_mod.dispatch_throttle(phi)

cache, transform, stages = th._split_transform_stages()
_sm, _add, chains, pullback, sj = md_mod._smeared_split_jits(
    th.terms, transform, stages)
rdt = jnp.finfo(u.dtype).dtype
ci = chains[1](u, phi, jnp.asarray(0.1, rdt))
md_mod.dispatch_throttle(ci)
print("chain-force ran (temp 5.6 GiB program)", flush=True)
ci = None
gc.collect()

n1 = 2**30 // 8
z = jax.jit(lambda s: jnp.zeros((n1,), jnp.complex64) + s)
held = []
for i in range(14):
    try:
        x = z(jnp.float32(i))
        float(jax.jit(lambda y: jnp.real(y[0]))(x))
        held.append(x)
        print(f"held {len(held)} GiB", flush=True)
    except Exception as e:
        print(f"FAIL at +1 GiB after {len(held)} GiB "
              f"({type(e).__name__})", flush=True)
        break
print("WM DONE", flush=True)
