"""North-star residency diagnostic: client-side live arrays vs
allocatable HBM after each split-trajectory phase at 32^3x64."""
import gc
import time
from collections import Counter

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


def dump_live(tag):
    gc.collect()
    arrs = jax.live_arrays()
    tot = sum(a.nbytes for a in arrs)
    byshape = Counter()
    for a in arrs:
        byshape[(a.dtype.name,) + tuple(a.shape)] += a.nbytes
    print(f"LIVE {tag}: {len(arrs)} arrays, {tot/2**30:.2f} GiB",
          flush=True)
    for k, v in byshape.most_common(6):
        print(f"   {v/2**30:6.2f} GiB  {k}", flush=True)


def try_alloc(gib):
    n = int(gib * 2**30 // 8)
    try:
        x = jax.jit(lambda n=n: jnp.zeros((n,), jnp.complex64))()
        float(jax.jit(lambda y: jnp.real(y[0]))(x))
        del x
        print(f"alloc {gib:5.2f} GiB: OK", flush=True)
        return True
    except Exception as e:
        print(f"alloc {gib:5.2f} GiB: FAIL {type(e).__name__}",
              flush=True)
        return False


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
begin, finish = th._split_begin_finish(transform, stages)
t0 = time.time()
p, phis, h2, ka = begin(key, u)
md_mod.dispatch_throttle(h2)
print(f"begin: {time.time()-t0:.1f} s", flush=True)
dump_live("after begin")
try_alloc(4)

_sm, _add, chains, pullback, sj = md_mod._smeared_split_jits(
    th.terms, transform, stages)
j1, j2, j3 = sj
t0 = time.time()
a1 = j1(u)
md_mod.dispatch_throttle(a1)
dump_live("after j1")
try_alloc(4)
a2 = j2(u, a1)
md_mod.dispatch_throttle(a2)
dump_live("after j2")
try_alloc(4)
v = j3(u, a2)
md_mod.dispatch_throttle(v)
print(f"staged fwd: {time.time()-t0:.1f} s", flush=True)
dump_live("after j3")
try_alloc(2)
# production big-volume flow: free the stage stacks through the
# chain solves; the pullback recomputes them
a1 = a2 = None
gc.collect()

rdt = jnp.finfo(u.dtype).dtype
t0 = time.time()
ci = chains[1](v, phis[1], jnp.asarray(0.1, rdt))
md_mod.dispatch_throttle(ci)
print(f"chain fermion: {time.time()-t0:.1f} s", flush=True)
dump_live("after chain")
try_alloc(2)
t0 = time.time()
tot = _add(ci, chains[2](v, phis[2], jnp.asarray(0.1, rdt)))
md_mod.dispatch_throttle(tot)
ci = v = None
gc.collect()
for attempt in range(3):
    try:
        p2 = pullback(u, p, tot, None, None)
        break
    except Exception as e:
        print(f"pullback attempt {attempt}: {type(e).__name__}",
              flush=True)
        dump_live(f"at pullback failure {attempt}")
        for gib in (4, 2, 1, 0.5, 0.25):
            if try_alloc(gib):
                break
        gc.collect()
        time.sleep(30)
tot = None
md_mod.dispatch_throttle(p2)
print(f"pullback: {time.time()-t0:.1f} s", flush=True)
dump_live("after pullback")
try_alloc(2)
print("DIAG DONE", flush=True)
