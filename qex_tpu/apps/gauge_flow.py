"""XML-driven gradient-flow measurement program.

TPU-native replacement for QEX's src/flow/gauge_flow.nim (746 LoC):
flow action = Wilson / rect / adjoint (any GaugeActionCoeffs),
fixed-step RK3 integration with (t_max, dt) segments, measuring t^2 E
(plaquette & clover), topological charge Q, and the Polyakov loop at
every step; w0 slope from finite differences of t dE/dt.

Usage:
    python -m qex_tpu.apps.gauge_flow --xml input_gf.xml [--cpu]
    python -m qex_tpu.apps.gauge_flow --lattice 8 8 8 8 --beta 5.0 \
        --tmax 1.0 --dt 0.02 [--load config.npz]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    # long-running app: line-buffer stdout so progress survives
    # pipes and timeouts
    try:
        sys.stdout.reconfigure(line_buffering=True)
    except Exception:
        pass
    ap = argparse.ArgumentParser(prog="gauge_flow")
    ap.add_argument("--xml")
    ap.add_argument("--lattice", type=int, nargs="+", default=None)
    ap.add_argument("--beta", type=float, default=5.0)
    ap.add_argument("--c1", type=float, default=None,
                    help="rectangle coefficient (enables rect action)")
    ap.add_argument("--adj", type=float, default=None,
                    help="adjoint/fundamental ratio (enables adj action)")
    ap.add_argument("--tmax", type=float, default=1.0)
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--load", help="gauge checkpoint (.npz) to flow")
    ap.add_argument("--seed", type=int, default=987654321)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import flow as gf
    from qex_tpu.io import checkpoint as ckpt
    from qex_tpu.ops import group, linalg
    from qex_tpu.utils.config import FlowConfig

    if args.xml:
        cfg = FlowConfig.from_xml(args.xml)
        dims = cfg.dims
        segments = cfg.segments
        if cfg.flow_act == "Wilson":
            coeffs = ga.wilson(2.0 * 3)  # flow normalization (see flow.py)
        elif cfg.flow_act == "Rect":
            coeffs = ga.gauge_act_rect(2.0 * 3, cfg.c1)
        elif cfg.flow_act == "Adj":
            coeffs = ga.adjoint_action(2.0 * 3, cfg.adj_plaq)
        else:
            raise ValueError(f"unknown flow action {cfg.flow_act!r}")
        seed = cfg.seed
    else:
        dims = tuple(args.lattice or (8, 8, 8, 8))
        segments = [(args.tmax, args.dt)]
        if args.adj is not None:
            coeffs = ga.adjoint_action(2.0 * 3, args.adj)
        elif args.c1 is not None:
            coeffs = ga.gauge_act_rect(2.0 * 3, args.c1)
        else:
            coeffs = ga.wilson(2.0 * 3)
        seed = args.seed

    lat = Lattice(dims)
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64
    print(f"# gauge_flow: lattice {dims} segments {segments} "
          f"device={jax.devices()[0]}")

    if args.load:
        u, _, _ = ckpt.load_checkpoint(args.load, lat, dtype)
    else:
        @jax.jit
        def hot(seed):
            key = jax.random.PRNGKey(seed)
            return jnp.stack([
                linalg.expm(0.3 * group.random_tah(
                    jax.random.fold_in(key, i), lat.dims, lat.nc, dtype))
                for i in range(lat.nd)])
        u = hot(seed)

    t = 0.0
    prev_t2e = None
    prev_t = None
    for t_max, dt in segments:
        n = max(1, round((t_max - t) / dt))

        @jax.jit
        def seg(u, t0):
            return gf.flow(coeffs, lat, u, dt, n, t0=t0)

        u, ms = seg(u, t)
        t2e_c = jax.device_get(jnp.real(ms.t2e_clover))
        t2e_p = jax.device_get(jnp.real(ms.t2e_plaq))
        topo = jax.device_get(jnp.real(ms.topo_q))
        plq = jax.device_get(jnp.real(ms.plaq))
        ts = jax.device_get(jnp.real(ms.t))
        for i in range(n):
            # w0 observable: W(t) = t d(t^2 E)/dt  (finite difference)
            if prev_t2e is not None:
                w = ts[i] * (t2e_c[i] - prev_t2e) / (ts[i] - prev_t)
            else:
                w = 0.0
            print(f"FLOW {ts[i]:.6g} plaq {plq[i]:.10g} "
                  f"t2E_plaq {t2e_p[i]:.10g} t2E_clover {t2e_c[i]:.10g} "
                  f"Q {topo[i]:.6g} W {w:.10g}")
            prev_t2e, prev_t = t2e_c[i], ts[i]
        t = t + n * dt
    return 0


if __name__ == "__main__":
    sys.exit(main())
