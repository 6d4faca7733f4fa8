"""2D XY model Monte Carlo program (heatbath / Metropolis / Wolff
cluster) with U(1) spin gradient flow measurements.

TPU-native replacement for QEX's src/xy_cluster_mc/xy_cluster.nim and
src/xy_heatbath_mc/ CLI programs.

Usage:
    python -m qex_tpu.apps.xy_mc -L:64 -beta:1.1 -algo:wolff \
        -sweeps:200 -meas:10 -flowTime:1.0 [-cpu:true]
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
    L = prm.int_param("L", 32, "lattice size (LxL)")
    beta = prm.float_param("beta", 1.1, "coupling")
    algo = prm.str_param("algo", "wolff",
                         "update: heatbath|metropolis|wolff")
    sweeps = prm.int_param("sweeps", 100, "updates")
    meas_freq = prm.int_param("meas", 10, "measurement frequency")
    flow_time = prm.float_param("flowTime", 0.0,
                                "spin flow time per measurement")
    flow_dt = prm.float_param("flowDt", 0.05, "spin flow step")
    seed = prm.int_param("seed", 987654321, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.models import xy

    print(f"# xy_mc L={L} beta={beta} algo={algo} "
          f"device={jax.devices()[0]}")
    key = jax.random.PRNGKey(seed)
    theta = jax.random.uniform(key, (L, L), minval=-3.14159,
                               maxval=3.14159)

    if algo == "heatbath":
        upd = jax.jit(lambda k, t: (xy.heatbath_sweep(k, t, beta),
                                    jnp.zeros((), jnp.float32)))
    elif algo == "metropolis":
        upd = jax.jit(lambda k, t: xy.metropolis_sweep(k, t, beta))
    elif algo == "wolff":
        upd = jax.jit(lambda k, t: xy.wolff_update(k, t, beta))
    else:
        raise SystemExit(f"unknown algo {algo!r}")

    meas = jax.jit(lambda t: (
        jnp.asarray(xy.energy(t, beta) / (2 * L * L), jnp.float32),
        jnp.asarray(xy.magnetization(t)[0], jnp.float32)))
    nflow = int(round(flow_time / flow_dt)) if flow_time > 0 else 0
    flow = jax.jit(lambda t: xy.spin_flow(t, flow_dt, nflow)) \
        if nflow else None

    t0 = time.time()
    for sw in range(sweeps):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), sw + 1)
        theta, aux = upd(key, theta)
        if (sw + 1) % meas_freq == 0:
            e, m = meas(theta)
            line = (f"MEAS sweep {sw+1} E/bond {float(e):.8g} "
                    f"|M| {float(m):.8g} aux {float(aux):.4g}")
            if flow is not None:
                tf = flow(theta)
                ef, mf = meas(tf)
                line += (f" flowE {float(ef):.8g} flowM "
                         f"{float(mf):.8g}")
            print(line)
    print(f"# {sweeps} sweeps in {time.time()-t0:.2f} s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
