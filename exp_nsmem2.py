"""AOT memory analysis: chain-force / kick / pullback programs at 32^3x64."""
import jax, jax.numpy as jnp
from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge.smear import HypCoefs
from qex_tpu.mcmc.theory import FermionSpec, GaugeActionSpec, LatticeFieldTheory
from qex_tpu.solvers.base import SolverParams

print("backend:", jax.default_backend(), flush=True)
lat = Lattice((32, 32, 32, 64))
dtype = jnp.complex64
th = LatticeFieldTheory(lat,
    gauge=GaugeActionSpec(ga.wilson(7.0), steps=12, scheme="2MN"),
    fermions=[FermionSpec("fermion", mass=0.05, steps=6, scheme="2MN", smeared=True),
              FermionSpec("boson", mass=0.5, steps=6, scheme="2MN", smeared=True)],
    smear=HypCoefs(0.4, 0.5, 0.5), bc="pppa",
    solver_params=SolverParams(r2req=1e-10, maxits=1500, restarts=3),
    force_solver_params=SolverParams(r2req=1e-8, maxits=1500, restarts=2),
    tau=0.5)

u_s = jax.ShapeDtypeStruct((lat.nd, 3, 3) + lat.dims, dtype)
eo_s = jax.ShapeDtypeStruct((3,) + lat.dims[:-1] + (lat.dims[-1] // 2,), dtype)
f32 = jax.ShapeDtypeStruct((), jnp.float32)

def report(tag, fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        m = c.memory_analysis()
        gib = 2**30
        print(f"{tag}: temp={m.temp_size_in_bytes/gib:6.2f}"
              f" out={m.output_size_in_bytes/gib:5.2f}"
              f" arg={m.argument_size_in_bytes/gib:5.2f} GiB"
              f" code={m.generated_code_size_in_bytes/2**20:6.1f} MiB", flush=True)
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)

terms = th.terms
report("chain fermion", lambda v, phi, c: c * terms[1].chain_force(v, phi), u_s, eo_s, f32)
report("chain boson  ", lambda v, phi, c: c * terms[2].chain_force(v, phi), u_s, eo_s, f32)
report("chain gauge?" if terms[0].chain_force else "gauge force",
       (lambda v, phi, c: c * terms[0].chain_force(v, phi)) if terms[0].chain_force
       else (lambda u, c: c * terms[0].force(u, None)), u_s, *([eo_s, f32] if terms[0].chain_force else [f32]))
