"""Eigensolver refinement at production volume (VERDICT round-4
task 4): 24^3x48 real-HISQ 16-pair eigensolve on the chip, then the
SAME-PROCESS A/B of the deflated-inverse-iteration polish
(eigens.refine.refine_inverse_dev).

Round-3 measured the unrefined tier: residuals 4e-5..8e-4 at 763.7 s.
The refinement was then proven only at the 4^3x8 oracle.  This runner
commits the production-volume number: post-refine residuals (target
<= ~1e-6, the reference PRIMME tier, qexPrimme.nim:59) and the added
wall time.  Writes EIGS24_REFINE.json.

Usage: python exp_eigs24r.py [ns nt n_eigs] [--cpu]
"""
import json
import sys
import time


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cpu = "--cpu" in argv
    if cpu:
        argv.remove("--cpu")
    ns, nt = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (24, 48)
    n_eigs = int(argv[2]) if len(argv) >= 3 else 16

    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge.fat7 import hisq_links_lowmem
    from qex_tpu.eigens import hisqev
    from qex_tpu.eigens.refine import refine_inverse_dev
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import staggered as st

    lat = Lattice((ns, ns, ns, nt))
    dtype = jnp.complex64
    print(f"# eigens+refine at {lat.dims} on "
          f"{jax.devices()[0].device_kind}", flush=True)

    @jax.jit
    def hot(seed):
        key = jax.random.PRNGKey(seed)
        return jnp.stack([
            linalg.expm(0.7 * group.random_tah(
                jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
            for i in range(lat.nd)])

    u = hot(11)
    phase = jax.jit(lambda uu: st.phase_links(lat, uu, "pppa"))
    t0 = time.time()
    fl, ll = hisq_links_lowmem(lat, phase(u))
    float(jax.jit(lambda a: jnp.real(jnp.sum(jnp.abs(a[0, 0, 0]))))(fl))
    print(f"# fattening: {time.time()-t0:.1f} s (incl. compiles)",
          flush=True)

    t0 = time.time()
    res = hisqev.stag_eigs(lat, None, n_eigs, naik=True,
                           links=(fl, ll), degree=30, tol=1e-5,
                           max_restarts=25, verbose=True)
    t_eig = time.time() - t0
    r_pre = np.asarray(res.resids)
    print(f"# stag_eigs n={n_eigs}: {t_eig:.1f} s, resids "
          f"[{r_pre.min():.2e}, {r_pre.max():.2e}]", flush=True)

    op, _example, op_args = hisqev._normal_op(lat, None, "pppa", True,
                                              links=(fl, ll))
    t0 = time.time()
    evals, vecs, resids, rinfo = refine_inverse_dev(
        op, jnp.asarray(res.vecs), op_args=op_args, iters=2)
    r_post = np.asarray(resids)
    t_ref = time.time() - t0
    print(f"# refine_inverse_dev(iters=2): {t_ref:.1f} s, resids "
          f"[{r_post.min():.2e}, {r_post.max():.2e}]", flush=True)
    for i in range(n_eigs):
        print(f"EIGENrefined {i} ev {float(np.asarray(evals)[i]):.10e}"
              f" resid {r_post[i]:.2e} (pre {r_pre[i]:.2e})",
              flush=True)

    rec = {"volume": f"{ns}c3x{nt}", "n_eigs": n_eigs,
           "lanczos_sec": round(t_eig, 1),
           "refine_sec": round(t_ref, 1),
           "resid_pre": [float(x) for x in r_pre],
           "resid_post": [float(x) for x in r_post],
           "evals_post": [float(x) for x in np.asarray(evals)],
           "device": str(jax.devices()[0].device_kind)}
    with open("EIGS24_REFINE.json", "w") as f:
        f.write(json.dumps(rec) + "\n")
    print("wrote EIGS24_REFINE.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
