"""Wilson-MG vs CGNE A/B at light mass: iterations AND wall-clock.

VERDICT round-4 task 5: the 8^3x16 m=0.005 MG win lived only in prose
(outer iterations are not cost -- each K-cycle does smoother + coarse
work).  This probe prices MG honestly against the strongest available
CGNE baseline (on TPU: the fused Pallas Wilson kernel route of
``wilson.solve_eo``):

  * cgne_eo:   warm wall-clock of the default backend;
  * mg setup:  one-time hierarchy build (adaptive near-null setup +
    COARSE-STENCIL ASSEMBLY, mg/coarse.py -- the matrix-free Galerkin
    coarse op measured 3 orders of magnitude off CGNE in wall-clock);
  * mg_kcycle: warm wall-clock with the hierarchy REUSED (the
    production pattern; hierarchy is a pytree and passes through jit
    as an argument).

Writes MG_AB_<platform>.json with the break-even solve count.
Usage:
    python exp_mg_ab.py [--cpu] [--dims 8 8 8 16] [--mass 0.005]
"""
import argparse
import json
import time

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--dims", type=int, nargs=4, default=[8, 8, 8, 16])
ap.add_argument("--mass", type=float, default=0.005)
ap.add_argument("--scale", type=float, default=0.2,
                help="weak-field TAH scale (light-mass regime)")
ap.add_argument("--r2req", type=float, default=1e-8)
args = ap.parse_args()

import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import wilson as wl
from qex_tpu.solvers.base import MGParams, SolverParams

print(f"backend: {jax.default_backend()}", flush=True)
dtype = jnp.complex64
lat = Lattice(tuple(args.dims))
m = args.mass


@jax.jit
def setup(seed):
    key = jax.random.PRNGKey(seed)
    u = jnp.stack([
        linalg.expm(args.scale * group.random_tah(
            jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
        for i in range(lat.nd)])
    b = (jax.random.normal(jax.random.fold_in(key, 8),
                           lat.dirac_shape(), jnp.float32)
         + 1j * jax.random.normal(jax.random.fold_in(key, 9),
                                  lat.dirac_shape(), jnp.float32)
         ).astype(dtype)
    return u, b


u, b = setup(12)

p_cg = SolverParams(r2req=args.r2req, maxits=4000, restarts=2)
p_mg = SolverParams(r2req=args.r2req, maxits=400, backend="mg",
                    mg=MGParams(nlevels=1, nvec=8, relax_iters=30,
                                m=16, k_m=4, bottom_iters=16))
recs = []


def true_rel(x, bb):
    w = wl.new_wilson(lat, u, m=m, bc="pppp")
    r = wl.wilson_d(w, x) - bb
    return jnp.real(linalg.norm2(r)) / jnp.real(linalg.norm2(bb))


# --- CGNE through the production eo surface -------------------------
@jax.jit
def solve_cg(uu, bb):
    ww = wl.new_wilson_eo(lat, uu, m=m, bc="pppp")
    x, stats = wl.solve_eo(ww, bb, p_cg)
    return (x, stats.iterations.astype(jnp.float32),
            true_rel(x, bb).astype(jnp.float32))


x, its, rel = solve_cg(u, b)
float(rel)
t0 = time.perf_counter()
x, its, rel = solve_cg(u, b)
relv = float(rel)
t_cg = time.perf_counter() - t0
print(f"cgne_eo: {t_cg:.3f} s warm, its={int(float(its))}, "
      f"true rel_r2={relv:.2e}", flush=True)
recs.append({"solver": "cgne_eo", "warm_seconds": round(t_cg, 4),
             "iterations": int(float(its)), "true_rel_r2": relv})

# --- MG: one-time hierarchy build, then reused solves ---------------
mp = p_mg.mg


@jax.jit
def build_and_solve(uu, bb):
    ww = wl.new_wilson(lat, uu, m=m, bc="pppp")
    x, stats, hier = wl.solve_mg(ww, bb, p_mg)
    return (hier, x, stats.iterations.astype(jnp.float32),
            true_rel(x, bb).astype(jnp.float32))


@jax.jit
def solve_reuse(uu, bb, hier):
    ww = wl.new_wilson(lat, uu, m=m, bc="pppp")
    x, stats, _ = wl.solve_mg(ww, bb, p_mg, hierarchy=hier)
    return (x, stats.iterations.astype(jnp.float32),
            true_rel(x, bb).astype(jnp.float32))


hier, x, its, rel = build_and_solve(u, b)
float(rel)
t0 = time.perf_counter()
hier, x, its, rel = build_and_solve(u, b)
float(rel)
t_setup_solve = time.perf_counter() - t0

x, its, rel = solve_reuse(u, b, hier)
float(rel)
t0 = time.perf_counter()
x, its, rel = solve_reuse(u, b, hier)
relv = float(rel)
t_mg = time.perf_counter() - t0
t_setup = t_setup_solve - t_mg
print(f"mg setup (adaptive + stencil assembly): {t_setup:.3f} s warm",
      flush=True)
print(f"mg_kcycle (hierarchy reused): {t_mg:.3f} s warm, "
      f"its={int(float(its))}, true rel_r2={relv:.2e}", flush=True)
recs.append({"solver": "mg_kcycle", "warm_seconds": round(t_mg, 4),
             "setup_seconds": round(t_setup, 4),
             "iterations": int(float(its)), "true_rel_r2": relv})

speedup = t_cg / t_mg
breakeven = (t_setup / (t_cg - t_mg)) if t_cg > t_mg else None
print(f"MG speedup over CGNE (warm solve): {speedup:.2f}x; "
      f"setup amortizes after "
      f"{breakeven:.1f} solves" if breakeven is not None else
      f"MG speedup over CGNE (warm solve): {speedup:.2f}x; never "
      f"amortizes", flush=True)
out = {"platform": jax.default_backend(),
       "dims": args.dims, "mass": m, "scale": args.scale,
       "r2req": args.r2req, "records": recs,
       "speedup_mg_over_cgne_warm": round(speedup, 3),
       "breakeven_solves": (round(breakeven, 1)
                            if breakeven is not None else None)}
fn = f"MG_AB_{jax.default_backend()}.json"
with open(fn, "w") as f:
    f.write(json.dumps(out) + "\n")
print(f"wrote {fn}", flush=True)
