"""Chip diagnostic for the 16^3x32 f32 dH systematic.

Measured so far (equilibrium, beta=6.0, tau=1.0, 2MN, chip):
  nsteps=20: dH ~ +2.5 (exp_accept_chip2.py, 30 traj)
  nsteps=48: dH = -17.4 +- 0.2 (exp_accept_chip.py, 24 traj)
CPU f32 at matched physics is clean (exp_drift_cpu.py) => the
systematic is TPU arithmetic.  Two-point model: dH_sys(n) =
offset + slope*n with offset ~ +16.7, slope ~ -0.71/step.  This
script measures dH at nsteps=12 and nsteps=40 from the SAME
equilibrated config and momenta to test the law, and measures the
unitarity drift ||u^dag u - 1||_max after the 40-step trajectory
(multiplicative link-update rounding would show ~1e-4 here).

Writes DRIFT_CHIP.json.
"""
import json
import time
from functools import partial

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group, linalg

BETA, TAU = 6.0, 1.0
DIMS = (16, 16, 16, 32)
scheme = integrators.get_integrator("2MN")
print(f"backend: {jax.default_backend()}", flush=True)

lat = Lattice(DIMS)
c = ga.wilson(BETA)
act = partial(ga.full_action, c, lat)
act2 = partial(ga.full_action2, c, lat)
frc = partial(ga.gauge_force, c, lat)


def _retry(fn, *args, tries=6, sleep_s=45):
    for attempt in range(tries):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if attempt == tries - 1:
                raise
            print(f"transient tunnel failure: {str(e)[:100]}; retry",
                  flush=True)
            time.sleep(sleep_s)


def make_step(nsteps, with_unit=False):
    @jax.jit
    def step(key, u):
        u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU, nsteps,
                               always_accept=jnp.bool_(True),
                               action2_fn=act2)
        pl = jnp.real(loops.plaquette(lat, u1)).astype(jnp.float32)
        if with_unit:
            eye = jnp.eye(3, dtype=u1.dtype)[
                (slice(None),) * 2 + (None,) * lat.nd]
            dev = jnp.max(jnp.stack([
                jnp.max(jnp.abs(linalg.mul_na(u1[d], u1[d]) - eye))
                for d in range(u1.shape[0])]))
            return u1, stt.dH, pl, dev.astype(jnp.float32)
        return u1, stt.dH, pl
    return step


t0 = time.time()
u = jax.jit(lambda: group.unit_gauge(lat, jnp.complex64))()
key = jax.random.PRNGKey(61)
warm = make_step(20)
for i in range(40):
    key, k = jax.random.split(key)
    u, dH, pl = _retry(warm, k, u)
print(f"warmed: plaq={float(pl):.5f} dH20={float(dH):+.4f} "
      f"({time.time()-t0:.0f} s)", flush=True)

out = {"volume": "16x16x16x32", "beta": BETA, "tau": TAU,
       "equil_nsteps20_dH": float(dH), "records": {}}
kfix = jax.random.PRNGKey(99)
for nsteps in (12, 40):
    stepf = make_step(nsteps, with_unit=True)
    u1, dH, pl, dev = _retry(stepf, kfix, u)
    out["records"][str(nsteps)] = {
        "dH": float(dH), "plaq": float(pl), "unit_dev": float(dev)}
    print(f"nsteps={nsteps}: dH={float(dH):+.4f} "
          f"unit_dev={float(dev):.3e} ({time.time()-t0:.0f} s)",
          flush=True)

with open("DRIFT_CHIP.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print("wrote DRIFT_CHIP.json", flush=True)
