"""CONFIG3 dH cross-check (VERDICT round-3 task 1 'done' criterion):
run the exact CONFIG3 seeded chain (16^3x32 quenched Wilson, 2MN, 20
steps, cold start, 4 forced-accept warmups + 1 measured trajectory) in
f64 on CPU and print dH at full precision.  Compare with the chip's
compensated-f32 dH (BENCH_CONFIGS r04 config 3): agreement at ~1e-3
absolute on a |H| ~ 6.8e6 Hamiltonian demonstrates the two-float
Metropolis path resolves dH far below the 0.25-0.5 f32 ulp that
locked the round-3 artifact at exactly 58.0.

Run:  python exp_dh3.py   (forces CPU; ~30 min on one core)
"""
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

lat = Lattice((16, 16, 16, 32))
c = ga.wilson(6.0)
act = partial(ga.full_action, c, lat)
act2 = partial(ga.full_action2, c, lat)
frc = partial(ga.gauge_force, c, lat)
u = group.unit_gauge(lat, jnp.complex128)
scheme = integrators.get_integrator("2MN")


@jax.jit
def step(key, uu, warm):
    uu, stt = hmc.hmc_step(key, uu, act, frc, scheme, 1.0, 20,
                           always_accept=warm, action2_fn=act2)
    return uu, stt.dH, jnp.real(loops.plaquette(lat, uu))


t0 = time.time()
warm = jnp.bool_(True)
for i in range(4):
    u, dH, pl = step(jax.random.PRNGKey(30 + i), u, warm)
    print(f"warmup {i}: dH={float(dH):+.10f} t={time.time()-t0:.0f}s",
          flush=True)
u, dH, pl = step(jax.random.PRNGKey(4), u, jnp.bool_(False))
print(f"CONFIG3-f64 measured traj: dH={float(dH):+.10f} "
      f"plaq={float(pl):.8f} total={time.time()-t0:.0f}s", flush=True)
