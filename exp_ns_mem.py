"""AOT memory analysis of the north-star 32^3x64 split-smear pieces.

The instrumented run OOM'd (RESOURCE_EXHAUSTED) at the FIRST L1
forward piece of the md phase while the far larger fused heatbath
program ran fine -- so the blocker is a single piece program's
footprint, not total HBM.  AOT-compile the per-output pieces through
the tunnel and print their memory_analysis (exp_nhyp_mem.py method;
no execution needed).
"""
import jax
import jax.numpy as jnp
from qex_tpu.lattice import Lattice
from qex_tpu.gauge.smear import HypCoefs, nhyp_stages_preproj, nhyp_stage_terms

lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
c = HypCoefs(0.4, 0.5, 0.5)
(p1, p2, p3), proj = nhyp_stages_preproj(c, lat)
t1s, t2s, t3s = nhyp_stage_terms(c, lat)

ushape = jax.ShapeDtypeStruct((4, 3, 3) + lat.dims, dtype)
a12 = jax.ShapeDtypeStruct((12, 3, 3) + lat.dims, dtype)
slab = jax.ShapeDtypeStruct((3, 3) + lat.dims, dtype)

import jax.lax as lax

def pre_piece(level, o):
    tl = (t1s, t2s, t3s)[level][o]
    if level == 0:
        def f(u):
            acc = None
            for t in tl:
                us = tuple(u[i] for i in t.u_idx)
                x = t.fn(us, ())
                acc = x if acc is None else lax.optimization_barrier(acc + x)
            return acc
    else:
        def f(u, a):
            acc = None
            for t in tl:
                us = tuple(u[i] for i in t.u_idx)
                als = tuple(a[i] for i in t.a_idx)
                x = t.fn(us, als)
                acc = x if acc is None else lax.optimization_barrier(acc + x)
            return acc
    return f

def mem(tag, fn, *shapes):
    try:
        lowered = jax.jit(fn).lower(*shapes)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        print(f"{tag}: temp={ma.temp_size_in_bytes/2**30:.2f} GiB "
              f"arg={ma.argument_size_in_bytes/2**30:.2f} "
              f"out={ma.output_size_in_bytes/2**30:.2f} "
              f"peak~={(ma.temp_size_in_bytes+ma.argument_size_in_bytes+ma.output_size_in_bytes)/2**30:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

mem("L1 piece o=0", pre_piece(0, 0), ushape)
mem("proj slab", lambda w: proj(w), slab)
mem("projvjp slab", lambda w, g: jax.vjp(proj, w)[1](g)[0], slab, slab)
mem("L2 piece o=0", pre_piece(1, 0), ushape, a12)
mem("L3 piece o=0", pre_piece(2, 0), ushape, a12)
