"""CONFIG3 dH cross-check (VERDICT round-3 task 1 'done' criterion):
re-run the CONFIG3 seeded chain (16^3x32 quenched Wilson, 2MN, 20
steps, cold start, 4 forced-accept warmups + 1 measured trajectory) in
f64 on CPU with THE SAME f32 noise draws the chip makes (jax.random
streams are dtype-dependent: the noise must be drawn in complex64 and
cast, else the chains are unrelated), and print dH at full precision.

Compare with the chip's compensated-f32 dH (BENCH_CONFIGS r04
config 3): the residual difference is cross-precision trajectory
divergence (f32 vs f64 MD arithmetic), not Metropolis quantization --
the round-3 artifact was ulp-locked at exactly 58.0.

Run:  python exp_dh3.py   (forces CPU; ~30-60 min on one core)
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
frc = partial(ga.gauge_force, c, lat)
scheme = integrators.get_integrator("2MN")
nd, nc = lat.nd, lat.nc


@jax.jit
def step64(key, u, warm):
    """hmc.hmc_step with the chip's f32 momentum draw, f64 dynamics."""
    kp, ka = jax.random.split(key)
    p32 = jax.vmap(lambda k: group.random_tah(
        k, lat.dims, nc, jnp.complex64))(jax.random.split(kp, nd))
    p = p32.astype(jnp.complex128)
    h_old = hmc.kinetic_energy(p) + act(u)
    from qex_tpu.hmc.integrators import integrate
    u1, p1 = integrate(scheme, u, p, 1.0, 20, frc,
                           hmc.gauge_update_u)
    h_new = hmc.kinetic_energy(p1) + act(u1)
    dH = h_new - h_old
    r = jax.random.uniform(ka, (), jnp.float32)
    acc = jnp.logical_or(warm, jnp.log(r) < -dH)
    return jnp.where(acc, u1, u), dH, jnp.real(loops.plaquette(lat, u1))


u = group.unit_gauge(lat, jnp.complex128)
t0 = time.time()
warm = jnp.bool_(True)
for i in range(4):
    u, dH, pl = step64(jax.random.PRNGKey(30 + i), u, warm)
    print(f"warmup {i}: dH={float(dH):+.10f} t={time.time()-t0:.0f}s",
          flush=True)
u, dH, pl = step64(jax.random.PRNGKey(4), u, jnp.bool_(False))
print(f"CONFIG3-f64 measured traj: dH={float(dH):+.10f} "
      f"plaq={float(pl):.8f} total={time.time()-t0:.0f}s", flush=True)
