"""CONFIG4 perf levers, same-process A/B (VERDICT round-4 task 3).

One process, one 24^4 nHYP stag+PV chain (the staghmc_spv production
composition, g24/f12/pv12 deck), on the chip:

  phase 0: cold start + 1 forced-accept warmup (compiles everything)
  phase A: >=3 warm baseline trajectories (the spread the VERDICT
           asked for -- round 4's 1383.7 s was a single sample)
  phase B: chain-graph OFF (QEX_NO_CHAIN_SHARE=1): one smear pullback
           per chain instead of summing same-time chains -- measures
           what the production chain-graph convention saves (no new
           compiles: same pullback programs, called more often)
  phase C: sloppy_solve=1 (bf16-link inner CG with f32 true-residual
           restarts, SolverParams.sloppy): warm trajectories after the
           sloppy solver programs compile

Writes CONFIG4_AB.json.  Run SOLO on the tunnel (expect ~1 h cold
compile + ~25 min/traj).
"""
import json
import os
import time

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.apps.staghmc_spv import build_theory
from qex_tpu.utils.config import HMCConfig
from qex_tpu.ops import group
from qex_tpu.gauge import loops

print(f"backend: {jax.default_backend()}", flush=True)

cfg = HMCConfig()
cfg.ns = 24
cfg.nt = 24
cfg.beta = 7.0
cfg.tau = 1.0
cfg.nf = 8
cfg.mass = 0.05
cfg.num_pv = 1
cfg.mass_pv = 0.5
cfg.g_steps = 24
cfg.f_steps = 12
cfg.pv_steps = 12
cfg.bc = "pppa"
cfg.a_tol = 1e-20
cfg.f_tol = 1e-12

lat = Lattice((24, 24, 24, 24))
dtype = jnp.complex64
th = build_theory(cfg, lat, dtype)


@jax.jit
def cold():
    return group.unit_gauge(lat, dtype)


@jax.jit
def plq(uu):
    return jnp.real(loops.plaquette(lat, uu)).astype(jnp.float32)


u = cold()
key = jax.random.PRNGKey(4)
rec = {"volume": "24c4", "deck": "g24/f12/pv12 nHYP 2f+PV cold",
       "phases": {}}


def traj(u, warm=False):
    global key
    key, k = jax.random.split(key)
    t0 = time.time()
    u1, stt = th.hmc_step_split(k, u, always_accept=True)
    dH = float(stt.dH)
    dt = time.time() - t0
    print(f"  traj: {dt:.1f} s dH={dH:+.2f}", flush=True)
    return u1, dt, dH


def dump():
    with open("CONFIG4_AB.json", "w") as f:
        f.write(json.dumps(rec) + "\n")


t0 = time.time()
u, dt0, dH0 = traj(u, warm=True)
cold_s = time.time() - t0
print(f"phase0 cold+warmup: {cold_s:.1f} s (incl. compiles)",
      flush=True)
rec["cold_total_sec"] = round(cold_s, 1)
dump()

for name, env, n in (("baseline", None, 3),
                     ("no_chain_share", "QEX_NO_CHAIN_SHARE", 1),
                     ("sloppy", None, 1)):
    if env:
        os.environ[env] = "1"
    if name == "sloppy":
        cfg.sloppy_solve = 1
        th = build_theory(cfg, lat, dtype)
        # first sloppy trajectory compiles the bf16 solver programs
        u, dt_c, _ = traj(u)
        print(f"  (sloppy compile traj: {dt_c:.1f} s)", flush=True)
    times, dhs = [], []
    for i in range(n):
        u, dt, dH = traj(u)
        times.append(round(dt, 1))
        dhs.append(dH)
    if env:
        del os.environ[env]
    rec["phases"][name] = {"sec_per_traj": times, "dH": dhs,
                           "mean_sec": round(sum(times) / len(times),
                                             1)}
    print(f"phase {name}: {times} s/traj", flush=True)
    dump()

rec["plaq"] = float(plq(u))
dump()
print("wrote CONFIG4_AB.json", flush=True)
