"""A/B: compensated two-float MD kicks vs plain f32 kicks (CPU).

exp_drift_cpu.py measured the plain-f32 systematic at 8^3x16
nsteps=48: dH = -1.66..-1.59 (constant, biased), f64 control clean.
If the mechanism is biased sub-ulp kick loss, integrate(
compensated=True) must restore dH to the ~0.05 fluctuation scale at
identical cost structure.  Writes DRIFT_CPU2.json.
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

BETA, TAU = 6.0, 1.0
DIMS = (8, 8, 8, 16)
scheme = integrators.get_integrator("2MN")
lat = Lattice(DIMS)
c = ga.wilson(BETA)
act = partial(ga.full_action, c, lat)
act2 = partial(ga.full_action2, c, lat)
frc = partial(ga.gauge_force, c, lat)


def make_step(nsteps, comp):
    @jax.jit
    def step(key, u):
        u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU, nsteps,
                               always_accept=jnp.bool_(True),
                               action2_fn=act2, compensated_md=comp)
        return u1, stt.dH, jnp.real(loops.plaquette(lat, u1))
    return step


t0 = time.time()
u = jax.jit(lambda: group.unit_gauge(lat, jnp.complex64))()
key = jax.random.PRNGKey(50)
warm = make_step(10, False)
for i in range(30):
    key, k = jax.random.split(key)
    u, dH, pl = warm(k, u)
print(f"warmed f32: plaq={float(pl):.5f} ({time.time()-t0:.0f} s)",
      flush=True)

out = {"dims": list(DIMS), "beta": BETA, "tau": TAU, "records": {}}
for tag, comp in (("plain", False), ("comp", True)):
    stepf = make_step(48, comp)
    dhs = []
    kk = jax.random.PRNGKey(77)
    uu = u
    for i in range(3):
        kk, k = jax.random.split(kk)
        uu, dH, pl = stepf(k, uu)
        dhs.append(float(dH))
    out["records"][f"{tag}_n48"] = dhs
    print(f"{tag} nsteps=48: dH = "
          + ", ".join(f"{d:+.4f}" for d in dhs)
          + f" ({time.time()-t0:.0f} s)", flush=True)

with open("DRIFT_CPU2.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("wrote DRIFT_CPU2.json", flush=True)
