"""AOT memory analysis of the split nHYP forward pieces at 32^3x64.

Compile-only (no execution): reports temp/output/argument bytes per
piece program (the same pre-projection piece + shared projection
programs md._smeared_split_jits builds) so the north-star live-set
budget is arithmetic, not guesswork.
"""
import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge.smear import (HypCoefs, nhyp_stage_terms,
                                 nhyp_stages_preproj)

print("backend:", jax.default_backend(), flush=True)
lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
coefs = HypCoefs(0.4, 0.5, 0.5)
pre, proj = nhyp_stages_preproj(coefs, lat)
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
              f" code={m.generated_code_size_in_bytes/2**20:6.1f} MiB",
              flush=True)
        return m.temp_size_in_bytes
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return 0


def pre_piece(tl, with_a):
    if with_a:
        def f(u, a):
            acc = None
            for t in tl:
                us = tuple(u[i] for i in t.u_idx)
                als = tuple(a[i] for i in t.a_idx)
                x = t.fn(us, als)
                acc = x if acc is None else \
                    jax.lax.optimization_barrier(acc + x)
            return acc
    else:
        def f(u):
            acc = None
            for t in tl:
                us = tuple(u[i] for i in t.u_idx)
                x = t.fn(us, ())
                acc = x if acc is None else \
                    jax.lax.optimization_barrier(acc + x)
            return acc
    return f


report("proj (shared)", proj, slab_s)
a1_s = tuple(slab_s for _ in range(len(t1s)))
a2_s = tuple(slab_s for _ in range(len(t2s)))
worst = [0, 0, 0]
for o in range(len(t1s)):
    worst[0] = max(worst[0], report(
        f"L1 piece {o:2d}", pre_piece(t1s[o], False), u_s))
for o in range(len(t2s)):
    worst[1] = max(worst[1], report(
        f"L2 piece {o:2d}", pre_piece(t2s[o], True), u_s, a1_s))
for o in range(len(t3s)):
    worst[2] = max(worst[2], report(
        f"L3 piece {o:2d}", pre_piece(t3s[o], True), u_s, a2_s))
print("worst temps (GiB):",
      [round(w / 2**30, 2) for w in worst], flush=True)
