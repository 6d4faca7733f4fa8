"""North-star on-chip run: ONE 32^3x64 nHYP-smeared staggered+PV HMC
trajectory on a single v5e chip (VERDICT round-3 task 3).

Memory design that makes this fit (all measured at 24^4 c64,
exp_nhyp_mem.py, and scaled):
  * slab-list per-addend smear pullback (worst piece 2.8 GB at 24^4)
  * per-output slab-list nHYP FORWARDS (md.FWD_SPLIT_MIN_SITES gate;
    the whole-level level-2 forward alone was 9.8 GB at 24^4 = ~62 GB
    here)
  * split-step dispatcher (no whole-trajectory program)

Composition mirrors the staghmc_spv production deck at reduced
step counts (the step count changes cost, not memory).  Prints the
phase-timer tree and solver stats; writes NORTHSTAR32.json.
"""
import json
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.gauge.smear import HypCoefs
from qex_tpu.mcmc.theory import (FermionSpec, GaugeActionSpec,
                                 LatticeFieldTheory)
from qex_tpu.ops import group, linalg
from qex_tpu.solvers.base import SolverParams
from qex_tpu.utils.profile import Profiler

print(f"backend: {jax.default_backend()}", flush=True)
lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64

key = jax.random.PRNGKey(11)


@jax.jit
def cold():
    return group.unit_gauge(lat, dtype)


u = cold()
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

def memstats(tag):
    try:
        s = jax.devices()[0].memory_stats()
        print(f"MEM {tag}: in_use={s.get('bytes_in_use', -1)/2**30:.2f}"
              f" GiB peak={s.get('peak_bytes_in_use', -1)/2**30:.2f}"
              f" GiB limit={s.get('bytes_limit', -1)/2**30:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"MEM {tag}: unavailable ({e})", flush=True)


memstats("start")
prof = Profiler()
t0 = time.time()
try:
    u1, stt = th.hmc_step_split(key, u, always_accept=True, prof=prof)
except Exception:
    memstats("at-failure")
    print(prof.report(), flush=True)
    raise
dt = time.time() - t0
dH = float(stt.dH)


@jax.jit
def plq(uu):
    return jnp.real(loops.plaquette(lat, uu)).astype(jnp.float32)


pl = float(plq(u1))
print(prof.report(), flush=True)
print(f"NORTHSTAR 32^3x64 nHYP+PV trajectory: {dt:.1f} s "
      f"(cold, incl. compiles), dH={dH:+.6f}, plaq={pl:.6f}",
      flush=True)
rec = {"volume": "32c3x64", "cold_sec_per_traj": round(dt, 1),
       "dH": dH, "plaq": pl, "tau": 0.5,
       "composition": "nHYP(f m=0.05) + PV(m=0.5) + wilson g",
       "profile": prof.report()}
with open("NORTHSTAR32.json", "w") as f:
    f.write(json.dumps(rec) + "\n")
print("wrote NORTHSTAR32.json", flush=True)
