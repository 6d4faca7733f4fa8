"""AOT memory analysis: per-addend staple VJP (pv) programs at 32^3x64."""
import jax, jax.numpy as jnp
from qex_tpu.lattice import Lattice
from qex_tpu.gauge.smear import HypCoefs, nhyp_stage_terms, nhyp_stages_preproj

print("backend:", jax.default_backend(), flush=True)
lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
coefs = HypCoefs(0.4, 0.5, 0.5)
t1s, t2s, t3s = nhyp_stage_terms(coefs, lat)
u_s = jax.ShapeDtypeStruct((lat.nd, 3, 3) + lat.dims, dtype)
slab_s = jax.ShapeDtypeStruct((3, 3) + lat.dims, dtype)

def report(tag, fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        m = c.memory_analysis()
        gib = 2**30
        print(f"{tag}: temp={m.temp_size_in_bytes/gib:6.2f}"
              f" out={m.output_size_in_bytes/gib:5.2f}"
              f" arg={m.argument_size_in_bytes/gib:5.2f} GiB"
              f" code={m.generated_code_size_in_bytes/2**20:6.1f} MiB", flush=True)
        return m.temp_size_in_bytes / gib
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)
        return 0

def pv_u_a(t):
    def pv(u, a, gw1):
        us = tuple(u[i] for i in t.u_idx)
        als = tuple(a[i] for i in t.a_idx)
        _, vjp = jax.vjp(t.fn, us, als)
        return vjp(gw1)
    return pv

def pv_u(t):
    def pv(u, gw1):
        us = tuple(u[i] for i in t.u_idx)
        _, vjp = jax.vjp(lambda uss: t.fn(uss, ()), us)
        return vjp(gw1)[0]
    return pv

a1_s = tuple(slab_s for _ in range(len(t1s)))
a2_s = tuple(slab_s for _ in range(len(t2s)))
w = 0.0
for lvl, (tls, a_s) in (("L3", (t3s, a2_s)), ("L2", (t2s, a1_s))):
    for o in (0, 1):
        for k, t in enumerate(tls[o]):
            w = max(w, report(f"{lvl} piece {o} addend {k}", pv_u_a(t), u_s, a_s, slab_s))
for o in (0, 1):
    for k, t in enumerate(t1s[o]):
        w = max(w, report(f"L1 piece {o} addend {k}", pv_u(t), u_s, slab_s))
print(f"worst pv temp: {w:.2f} GiB", flush=True)
