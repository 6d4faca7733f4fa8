import time
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
n1 = 2**30 // 8
z = jax.jit(lambda s: jnp.zeros((n1,), jnp.complex64) + s)
held = [z(jnp.float32(i)) for i in range(13)]
float(jax.jit(lambda y: jnp.real(y[0]))(held[-1]))
print("held 13 GiB", flush=True)
held = None
import gc; gc.collect()
n4 = 4 * 2**30 // 8
for attempt in range(8):
    try:
        t0 = time.time()
        x = jax.jit(lambda: jnp.zeros((n4,), jnp.complex64))()
        float(jax.jit(lambda y: jnp.real(y[0]))(x))
        print(f"4 GiB alloc OK on attempt {attempt} ({time.time()-t0:.1f} s)", flush=True)
        break
    except Exception as e:
        print(f"attempt {attempt}: FAIL {type(e).__name__}; sleeping 10 s", flush=True)
        time.sleep(10)
# single-buffer ceiling scan while fresh-ish
for gib in (5, 6, 7, 8):
    n = int(gib * 2**30 // 8)
    try:
        x = jax.jit(lambda n=n: jnp.zeros((n,), jnp.complex64))()
        float(jax.jit(lambda y: jnp.real(y[0]))(x))
        del x
        print(f"single {gib} GiB buffer: OK", flush=True)
    except Exception as e:
        print(f"single {gib} GiB buffer: FAIL {type(e).__name__}", flush=True)
        time.sleep(5)
