"""On-chip accepting chain B rerun at fixed nsteps=20 (16^3x32).

The first exp_accept_chip.py pass exposed a SYSTEMATIC f32 energy
drift at this volume: dH per trajectory is nearly constant at fixed
step count and GROWS with the step count (measured, same process,
equilibrated 16^3x32, beta=6.0, tau=1.0, 2MN: rms(dH) 0.89 @ 24
steps, 3.3 @ 32, 17.4 @ 48 -- the 48-step value is -17.4 +- 0.2 on
every trajectory).  That is integrator-rounding bias (more force
evaluations = more f32 TPU arithmetic per trajectory), not the
O(dt^2) shadow-Hamiltonian term, which would SHRINK with more steps.
At nsteps=20 the genuine equilibrium fluctuation (~1.3, scaled from
the 8^3x16 chain) dominates the drift (~0.5 by the measured ~n^4.3
growth law), so Metropolis statistics are meaningful there.

Writes ACCEPT_CHIP_B.json.  Run SOLO on the tunnel.
"""
import json
import statistics
import time
from functools import partial

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group

BETA = 6.0
TAU = 1.0
NSTEPS = 20
DIMS = (16, 16, 16, 32)
scheme = integrators.get_integrator("2MN")
print(f"backend: {jax.default_backend()}", flush=True)


def _retry(fn, *args, tries=6, sleep_s=45):
    for attempt in range(tries):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if attempt == tries - 1:
                raise
            print(f"transient tunnel failure (attempt {attempt}): "
                  f"{str(e)[:120]}; retrying in {sleep_s} s", flush=True)
            time.sleep(sleep_s)


lat = Lattice(DIMS)
c = ga.wilson(BETA)
act = partial(ga.full_action, c, lat)
act2 = partial(ga.full_action2, c, lat)
frc = partial(ga.gauge_force, c, lat)


@jax.jit
def step(key, u, warm):
    u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU, NSTEPS,
                           always_accept=warm, action2_fn=act2)
    pl = jnp.real(loops.plaquette(lat, u1)).astype(jnp.float32)
    return u1, stt.dH, stt.accepted, pl


u = jax.jit(lambda: group.unit_gauge(lat, jnp.complex64))()
key = jax.random.PRNGKey(61)
t0 = time.time()

for i in range(40):
    key, k = jax.random.split(key)
    u, dH, _, pl = _retry(step, k, u, jnp.bool_(True))
    if i % 10 == 0:
        print(f"warm {i}: dH={float(dH):+.3f} plaq={float(pl):.5f} "
              f"({time.time()-t0:.0f} s)", flush=True)

# 5 Metropolis re-equilibration trajectories, then measure
for i in range(5):
    key, k = jax.random.split(key)
    u, dH, acc, pl = _retry(step, k, u, jnp.bool_(False))

dhs, accs, plaqs = [], [], []
tm0 = time.time()
n_meas = 30
for i in range(n_meas):
    key, k = jax.random.split(key)
    u, dH, acc, pl = _retry(step, k, u, jnp.bool_(False))
    dhs.append(float(dH))
    accs.append(bool(acc))
    plaqs.append(float(pl))
    print(f"meas {i}: dH={dhs[-1]:+.4f} acc={accs[-1]} "
          f"plaq={plaqs[-1]:.5f}", flush=True)

sec_per_traj = (time.time() - tm0) / n_meas
mean_pl = statistics.mean(plaqs)
err_pl = statistics.stdev(plaqs) / n_meas ** 0.5
acc_rate = sum(accs) / len(accs)
import math
exp_mdh = statistics.mean(math.exp(-d) for d in dhs)
rec = {"volume": "16x16x16x32", "beta": BETA, "tau": TAU,
       "nsteps": NSTEPS, "n_meas": n_meas, "acceptance": acc_rate,
       "plaq_mean": mean_pl, "plaq_err": err_pl,
       "mean_dH": statistics.mean(dhs), "rms_dH":
       (sum(d * d for d in dhs) / len(dhs)) ** 0.5,
       "exp_minus_dH": exp_mdh,
       "sec_per_traj": round(sec_per_traj, 3), "dH": dhs,
       "plaq_series": plaqs}
print(f"B: acceptance={acc_rate:.3f} plaq={mean_pl:.6f}+-{err_pl:.6f}"
      f" mean_dH={rec['mean_dH']:+.3f} <e^-dH>={exp_mdh:.3f} "
      f"{sec_per_traj:.2f} s/traj", flush=True)
with open("ACCEPT_CHIP_B.json", "w") as f:
    f.write(json.dumps({"backend": jax.default_backend(),
                        "records": [rec]}) + "\n")
print("wrote ACCEPT_CHIP_B.json", flush=True)
