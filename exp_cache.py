"""Probe: does the JAX persistent compilation cache work through the
axon tunnel (remote compile)?  VERDICT round-3 task 2: CONFIG4's cold
run was 4924 s of ~190 serialized remote compiles; a working on-disk
cache turns every later process's cold start warm.

Usage:  python exp_cache.py [cache_dir]   (run TWICE; the second run
should report cache hits and a much smaller compile time)
"""
import sys
import time

import jax

cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qex_jax_cache"
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg

print(f"backend={jax.default_backend()} cache={cache_dir}", flush=True)
lat = Lattice((16, 16, 16, 16))


@jax.jit
def work(seed):
    key = jax.random.PRNGKey(seed)
    u = jnp.stack([linalg.expm(0.3 * group.random_tah(
        jax.random.fold_in(key, i), lat.dims, lat.nc, jnp.complex64))
        for i in range(lat.nd)])
    from qex_tpu.gauge import loops
    return jnp.real(loops.plaquette(lat, u)).astype(jnp.float32)


t0 = time.time()
v = float(work(3))
t1 = time.time() - t0
t0 = time.time()
v2 = float(work(4))
t2 = time.time() - t0
import os
nfiles = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
print(f"plaq={v:.6f} first_call={t1:.2f}s steady={t2:.3f}s "
      f"cache_files={nfiles}", flush=True)
