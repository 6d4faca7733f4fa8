"""On-chip eigensolver at production scale (VERDICT round-3 item 6).

1. hisqev-style driver on a REAL fattened HISQ operator at 24^3x48:
   EIGEN report lines (values + true residuals) + wall time, via the
   device-resident Chebyshev-filtered thick-restart Lanczos.
2. A/B deflated vs plain CG on the lightest CONFIG4-type mass (0.05):
   measured iteration/time win (or the honest finding that it doesn't
   pay at this mass).

QEX parity: src/eigens/hisqev.nim + qexPrimme.nim:59 (PRIMME-grade
solves on real HISQ operators) and deflation feeding stagSolve.

Usage: python exp_eigs24.py [ns nt] [n_eigs] [--cpu]
"""

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

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge.fat7 import hisq_links_lowmem
    from qex_tpu.eigens.hisqev import stag_eigs, deflation_basis
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import staggered as st
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics.stag_hmc import _fast3_ops
    from qex_tpu.solvers import cg
    from qex_tpu.solvers.deflate import deflated_cg

    lat = Lattice((ns, ns, ns, nt))
    dtype = jnp.complex64
    print(f"# eigens at {lat.dims} on {jax.devices()[0].device_kind}")

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
    # sync via jitted scalar (block_until_ready is a no-op on axon)
    float(jax.jit(lambda a: jnp.real(jnp.sum(jnp.abs(a[0, 0, 0]))))(fl))
    print(f"# fattening: {time.time()-t0:.1f} s (incl. compiles)")

    t0 = time.time()
    res = stag_eigs(lat, None, n_eigs, naik=True, links=(fl, ll),
                    degree=30, tol=1e-5, max_restarts=25, verbose=True)
    t_eig = time.time() - t0
    print(f"# stag_eigs n={n_eigs}: {t_eig:.1f} s wall "
          f"(matvecs_A {res.info['matvecs_A']}, "
          f"cycles {res.info['cycles']}, window {res.info['window']})")

    # --- deflation A/B at the light mass --------------------------------
    # links passed as jit ARGUMENTS (closures serialize into the
    # remote-compile request: HTTP 413 at this volume)
    mass = 0.05
    evals, vecs = deflation_basis(res, mass)

    key = jax.random.PRNGKey(99)

    @jax.jit
    def mkrhs():
        b = jax.random.normal(
            key, (lat.nc,) + lat.dims[:-1] + (lat.dims[-1] // 2,),
            jnp.float32).astype(dtype)
        return sf.to_fast(b / jnp.sqrt(linalg.norm2(b)).astype(dtype),
                          lat)

    b = mkrhs()

    def mkop(fl, ll):
        s3 = st.new_stag3_eo(lat, fl, ll)
        f3 = sf.new_fast3(s3)
        ee, _dd = _fast3_ops(f3)
        return lambda v: ee(v, mass)

    @jax.jit
    def plain(b, fl, ll):
        x, stats = cg.cg_solve(mkop(fl, ll), b, r2req=1e-10,
                               maxits=3000)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    @jax.jit
    def defl(b, fl, ll, evals, vecs):
        vf = jnp.stack([sf.to_fast(vecs[i], lat)
                        for i in range(vecs.shape[0])])
        x, stats = deflated_cg(mkop(fl, ll), b, evals, vf,
                               r2req=1e-10, maxits=3000)
        return (jnp.real(stats.r2).astype(jnp.float32),
                stats.iterations.astype(jnp.float32))

    for name, fn, args in (("plain", plain, (b, fl, ll)),
                           ("deflated", defl,
                            (b, fl, ll, evals, vecs))):
        r2, its = fn(*args)
        float(r2)  # compile+warm
        t0 = time.time()
        r2, its = fn(*args)
        r2v, itv = float(r2), int(float(its))
        dt = time.time() - t0
        print(f"# CG m={mass} {name}: {dt:.3f} s, its={itv}, "
              f"rel_r2={r2v:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
