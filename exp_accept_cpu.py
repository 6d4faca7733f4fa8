"""CPU f64 accepting-chain reference for the round-5 acceptance task.

VERDICT round-4 task 2: demonstrate the framework *sampling* -- an
HMC chain with Metropolis acceptance in (0.5, 0.95) and an equilibrium
plaquette that matches an independent f64 chain of the same action
(statistical agreement, not bitwise; the reference's golden logs show
O(0.01-1) dH at production step counts,
/root/reference/src/hmc/metropolis.nim:30-60).

This machine has ONE CPU core and f64 HMC at the CONFIG3 volume
(16^3x32) costs ~25 s/step, so the f64 reference chain runs at a
matched smaller volume, 8^3x16 (plaquette is local; the cross-backend
check is statistical at matched volume).  The chip runs the SAME
8^3x16 chain (exp_accept_chip.py) plus the tuned 16^3x32 CONFIG3
chain; plaquettes must agree within errors.

Stages (all CPU, one process):
  1. tune: warmup from cold at beta=6.0, then scan nsteps and pick the
     smallest with |dH|_rms giving acceptance ~0.8 (exp(-dH) bound).
  2. f64 chain: 30 forced-accept warmup + N_MEAS measured trajectories
     at the tuned step count; record acceptance + plaquette series.

Writes ACCEPT_CPU.json.
"""
import json
import time
from functools import partial

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group

BETA = 6.0
TAU = 1.0
N_WARM = 30
N_MEAS = 40

lat = Lattice((8, 8, 8, 16))
c = ga.wilson(BETA)
act = partial(ga.full_action, c, lat)
frc = partial(ga.gauge_force, c, lat)
scheme = integrators.get_integrator("2MN")


def make_step(nsteps):
    @jax.jit
    def step(key, u, warm):
        u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU, nsteps,
                               always_accept=warm)
        pl = jnp.real(loops.plaquette(lat, u1))
        return u1, stt.dH, stt.accepted, pl
    return step


u = group.unit_gauge(lat, jnp.complex128)
key = jax.random.PRNGKey(50)

# ---- stage 1: coarse warmup (forced accept, cheap steps) ----
coarse = make_step(10)
t0 = time.time()
for i in range(N_WARM):
    key, k = jax.random.split(key)
    u, dH, _, pl = coarse(k, u, jnp.bool_(True))
    if i % 5 == 0:
        print(f"warm {i}: dH={float(dH):+.3f} plaq={float(pl):.5f} "
              f"({time.time()-t0:.0f} s)", flush=True)

# ---- stage 2: step-count scan at equilibrium ----
scan_results = {}
for ns in (20, 30, 45):
    stepf = make_step(ns)
    dhs = []
    for i in range(4):
        key, k = jax.random.split(key)
        u, dH, _, pl = stepf(k, u, jnp.bool_(True))
        dhs.append(float(dH))
    rms = (sum(d * d for d in dhs) / len(dhs)) ** 0.5
    scan_results[ns] = dhs
    print(f"scan nsteps={ns}: dH={['%+.4f' % d for d in dhs]} "
          f"rms={rms:.4f} ({time.time()-t0:.0f} s)", flush=True)
    if rms < 0.35:   # acceptance erfc-bound ~> 0.75
        break

# pick the smallest scanned nsteps with rms(dH) < 0.35, else largest
chosen = None
for ns, dhs in scan_results.items():
    rms = (sum(d * d for d in dhs) / len(dhs)) ** 0.5
    if rms < 0.35:
        chosen = ns
        break
if chosen is None:
    chosen = max(scan_results)
print(f"chosen nsteps={chosen}", flush=True)

# ---- stage 3: measured f64 chain ----
stepf = make_step(chosen)
# short re-equilibration under Metropolis
for i in range(5):
    key, k = jax.random.split(key)
    u, dH, acc, pl = stepf(k, u, jnp.bool_(False))
dhs, accs, plaqs = [], [], []
for i in range(N_MEAS):
    key, k = jax.random.split(key)
    u, dH, acc, pl = stepf(k, u, jnp.bool_(False))
    dhs.append(float(dH))
    accs.append(bool(acc))
    plaqs.append(float(pl))
    print(f"meas {i}: dH={dhs[-1]:+.4f} acc={accs[-1]} "
          f"plaq={plaqs[-1]:.5f} ({time.time()-t0:.0f} s)", flush=True)

import statistics
mean_pl = statistics.mean(plaqs)
err_pl = statistics.stdev(plaqs) / len(plaqs) ** 0.5
acc_rate = sum(accs) / len(accs)
print(f"CPU f64 8^3x16 beta=6.0: acceptance={acc_rate:.3f}, "
      f"plaq={mean_pl:.6f} +- {err_pl:.6f}, nsteps={chosen}",
      flush=True)
rec = {"backend": "cpu_f64", "volume": "8c3x16", "beta": BETA,
       "tau": TAU, "nsteps": chosen, "n_meas": N_MEAS,
       "acceptance": acc_rate, "plaq_mean": mean_pl,
       "plaq_err": err_pl, "dH": dhs, "plaq_series": plaqs,
       "scan": {str(k): v for k, v in scan_results.items()},
       "total_sec": round(time.time() - t0, 1)}
with open("ACCEPT_CPU.json", "w") as f:
    f.write(json.dumps(rec) + "\n")
print("wrote ACCEPT_CPU.json", flush=True)
