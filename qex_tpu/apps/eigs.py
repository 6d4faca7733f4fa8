"""Staggered eigensolver program: lowest-N eigenpairs on a config.

TPU-native replacement for the reference's eigensolver CLIs — the
hisqev production driver (src/eigens/hisqev.nim) and the
modeigs1/PRIMME example programs (src/examples/modeigs1.nim,
tests/primme/) — built on the qex_tpu.eigens tier (Chebyshev-filtered
thick-restart Lanczos).

Usage:
    python -m qex_tpu.apps.eigs -gauge:cfg.scidac -nev:8 \
        -mass:0.0 -bc:pppa [-naik:true] [-degree:24] [-tol:1e-8] \
        [-save:eigs.npz] [-cpu:true]
    (no -gauge -> hot start at -lat:X,Y,Z,T; .npz checkpoints accepted)

Prints grep-able ``EIGEN i ev sv resid`` lines (hisqev report style)
plus a deflation demo line showing the CG iteration reduction when the
computed basis deflates a light-mass solve.
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    from qex_tpu.utils.params import Params
    prm = Params(argv)
    gauge_file = prm.str_param("gauge", "", "gauge file (.scidac/.npz)")
    lat_dims = prm.int_seq_param("lat", [8, 8, 8, 8],
                                 "lattice (when no gauge file)")
    nev = prm.int_param("nev", 8, "number of lowest eigenpairs")
    mass = prm.float_param("mass", 0.0, "report shift m (evals + m^2)")
    bc = prm.str_param("bc", "pppa", "fermion boundary conditions")
    naik = prm.bool_param("naik", False, "fat+naik (HISQ) operator")
    degree = prm.int_param("degree", 24, "Chebyshev filter degree")
    tol = prm.float_param("tol", 1e-8, "eigenpair residual tolerance")
    seed = prm.int_param("seed", 987654321, "RNG seed (hot start)")
    save = prm.str_param("save", "", "save eigenpairs to .npz")
    deflate_demo = prm.bool_param("deflate", True,
                                  "demo deflated vs plain CG")
    refine_iters = prm.int_param("refine", 0,
                                 "compensated Rayleigh-Ritz polish "
                                 "iterations after the Lanczos")
    use_cpu = prm.bool_param("cpu", False, "force CPU")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from qex_tpu.eigens import hisqev
    from qex_tpu.io import checkpoint as ckpt
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg

    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64

    if gauge_file.endswith(".npz"):
        lat = Lattice(tuple(lat_dims))
        u, _, _ = ckpt.load_checkpoint(gauge_file, lat, dtype)
    elif gauge_file:
        from qex_tpu.utils.params import default_setup
        lat, u = default_setup(Params(argv=[gauge_file]))
        u = jnp.asarray(u, dtype)
    else:
        lat = Lattice(tuple(lat_dims))

        @jax.jit
        def hot(seed):
            key = jax.random.PRNGKey(seed)
            return jnp.stack([
                linalg.expm(0.5 * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc,
                    dtype)) for i in range(lat.nd)])
        u = hot(seed)

    print(f"# eigs: {lat.dims} nev={nev} naik={naik} bc={bc} "
          f"degree={degree} tol={tol:g}")
    t0 = time.perf_counter()
    res = hisqev.stag_eigs(lat, u, nev, bc=bc, naik=naik,
                           degree=degree, tol=tol, verbose=True,
                           refine_iters=refine_iters)
    print(f"# eigensolve: {time.perf_counter() - t0:.2f} s, "
          f"{res.info['matvecs_A']} A-matvecs")
    if mass != 0.0:
        sh = res.evals + mass * mass
        for i, ev in enumerate(sh):
            print(f"EIGENshifted {i} ev {ev:.12g} (m={mass})")

    if save:
        np.savez(save, evals=res.evals, svals=res.svals,
                 resids=res.resids, vecs=np.asarray(res.vecs))
        print(f"# saved {nev} eigenpairs -> {save}")

    if deflate_demo:
        from qex_tpu.physics import staggered as st
        from qex_tpu.solvers import cg as cgmod
        from qex_tpu.solvers.deflate import deflated_cg
        m_d = mass if mass != 0.0 else 0.05
        evals, vecs = hisqev.deflation_basis(res, m_d)
        op, example, op_args = hisqev._normal_op(lat, u, bc, naik)
        key = jax.random.PRNGKey(seed + 1)

        @jax.jit
        def make_b(key):
            # example may be a ShapeDtypeStruct; draw on device (the
            # tunnel has no eager dispatch)
            return (jax.random.normal(key, example.shape)
                    + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                             example.shape)
                    ).astype(dtype)

        b = make_b(key)
        mm = m_d * m_d

        @jax.jit
        def solves(b, evals, vecs, *op_args):
            # evals/vecs threaded as ARGUMENTS: n eigenvectors at
            # lattice volume closed over would serialize into the
            # remote-compile request on the axon tunnel (HTTP 413)
            a_op = lambda v: mm * v + op(v, *op_args)
            x0, s0 = cgmod.cg_solve_restarted(a_op, b, r2req=1e-10,
                                              maxits=2000, restarts=2)
            x1, s1 = deflated_cg(a_op, b, evals, vecs, r2req=1e-10,
                                 maxits=2000, restarts=2)
            r0 = linalg.norm2(a_op(x0) - b) / linalg.norm2(b)
            r1 = linalg.norm2(a_op(x1) - b) / linalg.norm2(b)
            return (s0.iterations.astype(jnp.float32),
                    s1.iterations.astype(jnp.float32),
                    jnp.real(r0).astype(jnp.float32),
                    jnp.real(r1).astype(jnp.float32))

        i0, i1, r0, r1 = solves(b, evals, vecs, *op_args)
        from qex_tpu.solvers.deflate import deflation_pays
        # criterion uses the UNSHIFTED lambda band (res.evals is host
        # numpy; the shifted jnp `evals` would need a device fetch)
        pays = deflation_pays(res.evals, m_d)
        print(f"DEFLATE m={m_d}: plain CG its={int(float(i0))} "
              f"rel_r2={float(r0):.2e} | deflated({nev}) "
              f"its={int(float(i1))} rel_r2={float(r1):.2e} "
              f"| auto-criterion: {'use' if pays else 'skip'} "
              f"(stag_solve gates on lambda_low vs m^2)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
