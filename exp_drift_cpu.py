"""CPU diagnostic for the step-count-growing f32 energy drift.

The chip measured (exp_accept_chip.py, 16^3x32, beta=6.0, tau=1.0,
2MN, equilibrium): dH approaches a CONSTANT negative value per
trajectory that GROWS with step count (-0.89 @ 24, -3.3 @ 32,
-17.4 +- 0.2 @ 48).  A shadow-Hamiltonian error shrinks as dt^2, so
this is arithmetic, not integrator order.  Question: generic f32
rounding (reproduces on CPU f32) or TPU-specific (3-pass-bf16 f32
matmul)?  Drift ~ V at fixed steps => at 8^3x16 nsteps=48 expect
~ -1.1 if generic; the f64 control should sit at the ~0.05
fluctuation scale.

Writes DRIFT_CPU.json.
"""
import json
import statistics
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


def make_step(nsteps):
    @jax.jit
    def step(key, u):
        u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU, nsteps,
                               always_accept=jnp.bool_(True),
                               action2_fn=act2)
        pl = jnp.real(loops.plaquette(lat, u1))
        return u1, stt.dH, pl
    return step


t0 = time.time()
u = jax.jit(lambda: group.unit_gauge(lat, jnp.complex64))()
key = jax.random.PRNGKey(50)
warm = make_step(10)
for i in range(30):
    key, k = jax.random.split(key)
    u, dH, pl = warm(k, u)
print(f"warmed f32: plaq={float(pl):.5f} ({time.time()-t0:.0f} s)",
      flush=True)

out = {"dims": list(DIMS), "beta": BETA, "tau": TAU, "records": {}}
u64 = jax.jit(lambda x: x.astype(jnp.complex128))(u)
for nsteps in (24, 48):
    stepf = make_step(nsteps)
    for tag, u0 in (("f32", u), ("f64", u64)):
        dhs = []
        kk = jax.random.PRNGKey(77)
        uu = u0
        for i in range(3):
            kk, k = jax.random.split(kk)
            uu, dH, pl = stepf(k, uu)
            dhs.append(float(dH))
        out["records"][f"{tag}_n{nsteps}"] = dhs
        print(f"{tag} nsteps={nsteps}: dH = "
              + ", ".join(f"{d:+.4f}" for d in dhs)
              + f" ({time.time()-t0:.0f} s)", flush=True)

with open("DRIFT_CPU.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("wrote DRIFT_CPU.json", flush=True)
