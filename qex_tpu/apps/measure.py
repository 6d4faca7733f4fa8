"""Measurement program: observables on stored gauge configurations.

TPU-native replacement for QEX's src/observables/ CLI programs
(fpvaMeas.nim meson correlators, scalarTrace.nim disconnected/pbp with
noise+dilution, conn4d.nim point-source correlators) plus the basic
gauge observables of gaugeUtils (plaq/ploop/topoQ).

Usage:
    python -m qex_tpu.apps.measure -gauge:cfg.scidac \
        -mass:0.1 -bc:pppa -mesons:true -pbp:true -noise:z4 \
        -nNoise:4 -dilution:eo [-cpu:true]
    (also accepts -gauge:cfg.npz checkpoints; no -gauge -> hot start)
"""

from __future__ import annotations

import sys
import time


def main(argv=None) -> int:
    # long-running app: line-buffer stdout so progress survives
    # pipes and timeouts
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    from qex_tpu.utils.params import Params
    prm = Params(argv)
    gauge_file = prm.str_param("gauge", "", "gauge file (.scidac/.npz)")
    lat_dims = prm.int_seq_param("lat", [8, 8, 8, 8],
                                 "lattice (when no gauge file)")
    mass = prm.float_param("mass", 0.1, "valence quark mass")
    bc = prm.str_param("bc", "pppa", "fermion boundary conditions")
    do_mesons = prm.bool_param("mesons", False, "meson correlators")
    do_pbp = prm.bool_param("pbp", False, "chiral condensate")
    noise = prm.str_param("noise", "z4", "pbp noise: z4|z2|u1|gauss")
    n_noise = prm.int_param("nNoise", 2, "noise vectors")
    dilution = prm.str_param("dilution", "none",
                             "pbp dilution: none|eo|corner3d")
    tol = prm.float_param("tol", 1e-12, "solver tolerance")
    seed = prm.int_param("seed", 987654321, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import loops
    from qex_tpu.io import checkpoint as ckpt
    from qex_tpu.io import lime
    from qex_tpu.observables import condensate, mesons
    from qex_tpu.ops import group, linalg
    from qex_tpu.solvers.base import SolverParams

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
    print(f"# measure: {lat.dims} mass={mass} bc={bc} "
          f"device={jax.devices()[0]}")

    basics = jax.jit(lambda uu: (
        jnp.real(loops.plaquette(lat, uu)).astype(jnp.float32),
        jnp.real(loops.polyakov_loop(lat, uu)).astype(jnp.float32),
        jnp.imag(loops.polyakov_loop(lat, uu)).astype(jnp.float32),
        jnp.real(loops.topo_charge_clover(lat, uu)).astype(jnp.float32)))
    pl, plr, pli, q = basics(u)
    print(f"MEASplaq {float(pl):.12g}")
    print(f"MEASploop {float(plr):.10g} {float(pli):.10g}")
    print(f"MEAStopo {float(q):.8g}")

    sp = SolverParams(r2req=tol, maxits=10000, restarts=3)
    if do_mesons:
        t0 = time.time()
        corr = mesons.stag_meson_correlators(
            lat, u, mass, bc=bc,
            channels=tuple(mesons.STAG_CHANNELS), params=sp)
        for ch, c in corr.items():
            vals = " ".join(f"{float(x):.10g}"
                            for x in jax.device_get(c))
            print(f"MEASmeson {ch} {vals}")
        print(f"# mesons in {time.time()-t0:.1f} s")
    if do_pbp:
        t0 = time.time()
        v = condensate.pbp_staggered(
            jax.random.PRNGKey(seed + 1), lat, u, mass, bc=bc,
            noise=noise, n_noise=n_noise, dilution=dilution, params=sp)
        print(f"MEASpbp {float(v):.10g}")
        print(f"# pbp in {time.time()-t0:.1f} s")
    if prm.bool_param("wilsonMesons", False,
                      "Wilson meson correlators (12 solves)"):
        from qex_tpu.physics import wilson as wl
        t0 = time.time()
        w = wl.new_wilson(lat, u, mass, bc=bc)
        cols = []
        for s0 in range(4):
            for c0 in range(lat.nc):
                src = jnp.zeros(lat.dirac_shape(), u.dtype
                                ).at[(s0, c0) + (0,) * lat.nd].set(1.0)
                x, _ = wl.solve(w, src, sp)
                cols.append(x)
        props = jnp.stack(cols).reshape((4, lat.nc) + cols[0].shape)
        corr = mesons.wilson_mesons_from_prop(
            lat, props, channels=mesons.WILSON_CHANNELS)
        for ch, c in corr.items():
            vals = " ".join(f"{float(x):.10g}"
                            for x in jax.device_get(c))
            print(f"MEASwmeson {ch} {vals}")
        print(f"# wilson mesons in {time.time()-t0:.1f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
