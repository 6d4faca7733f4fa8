"""North-star OOM localization (round 5).

block_until_ready is a no-op on the axon tunnel, so phase timers
measure DISPATCH: the RESOURCE_EXHAUSTED that surfaced at MD's first
piece was really an execution failure somewhere in the queued begin
pipeline.  This runner executes begin stage by stage with a REAL sync
(scalar fetch) after each, plus an HBM capacity bisect up front.
"""
import time

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


def fetch(x):
    return float(jax.jit(lambda a: jnp.real(
        jnp.sum(jnp.abs(a[(0,) * (a.ndim - 1)]))).astype(jnp.float32))(x))


def try_alloc(gib):
    n = int(gib * 2**30 // 8)
    try:
        x = jax.jit(lambda: jnp.zeros((n,), jnp.complex64))()
        float(jax.jit(lambda y: jnp.real(y[0]))(x))
        del x
        print(f"alloc {gib:5.2f} GiB: OK", flush=True)
        return True
    except Exception as e:
        print(f"alloc {gib:5.2f} GiB: FAIL {type(e).__name__}",
              flush=True)
        return False


for gib in (14, 13, 12, 11, 10, 8):
    if try_alloc(gib):
        break

lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
key = jax.random.PRNGKey(11)
u = jax.jit(lambda: group.unit_gauge(lat, dtype))()
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
cache, transform, stages = th._split_transform_stages()
_sm, _add, _ch, _pb, sj = md_mod._smeared_split_jits(
    th.terms, transform, stages)
j1s, j2s, j3s = sj

t0 = time.time()
a1 = j1s(u)
print(f"j1 (L1 forward): {fetch(a1):.3e}  {time.time()-t0:.1f} s",
      flush=True)
t0 = time.time()
a2 = j2s(u, a1)
print(f"j2 (L2 forward): {fetch(a2):.3e}  {time.time()-t0:.1f} s",
      flush=True)
del a1
t0 = time.time()
v = j3s(u, a2)
print(f"j3 (L3 forward): {fetch(v):.3e}  {time.time()-t0:.1f} s",
      flush=True)
del a2
try_alloc(8)

begin, finish = th._split_begin_finish(transform, stages)
kp, kf, ka = jax.jit(lambda k: jax.random.split(k, 3))(key)
keys = jax.jit(lambda k: jax.random.split(k, len(th.terms)))(kf)
phis = []
for i, t in enumerate(th.terms):
    base = None
    for (_n, b, _s) in th.matter_bases:
        pass
    # heatbath per matter term via the cached bf bundle is internal;
    # drive the public begin instead now that the forward is resident
print("running full begin with per-stage v reuse:", flush=True)
t0 = time.time()
p, phis, h2, ka = begin(key, u)
from qex_tpu.ops import dsum
hv = float(jax.jit(lambda h: dsum.df_value(h))(h2))
print(f"begin: H={hv:.6e}  {time.time()-t0:.1f} s", flush=True)
try_alloc(6)
del v
t0 = time.time()
u1, p1 = md_mod.run_trajectory_split(
    th.terms, u, p, phis, th.tau,
    __import__("qex_tpu.hmc.hmc", fromlist=["x"]).gauge_update_u,
    transform=transform, transform_stages=stages)
print(f"md dispatch: {time.time()-t0:.1f} s", flush=True)
print(f"md synced: |u1|={fetch(u1):.3e}  {time.time()-t0:.1f} s",
      flush=True)
