"""2D (any-D) compact U(1) pure-gauge Monte Carlo program: HMC or
heatbath(+over-relaxation), with plaquette / topological-charge /
flowed-charge measurements.

TPU-native replacement for QEX's src/examples/puregauge2du1.nim (HMC,
maximal-tree gauge fixing, topo2DU1) and puregaugehb2du1.nim
(von Mises heatbath + over-relaxation sweeps).

Usage:
    python -m qex_tpu.apps.u1_mc -L:32 -beta:5.0 -algo:hmc \
        -trajs:64 -tau:2.0 -steps:10 -scheme:2MN [-gfix:true] [-cpu:true]
    python -m qex_tpu.apps.u1_mc -algo:heatbath -sweeps:50 -or:1
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
    L = prm.int_param("L", 32, "lattice size (LxL)")
    nd = prm.int_param("nd", 2, "dimensions")
    beta = prm.float_param("beta", 5.0, "coupling")
    algo = prm.str_param("algo", "hmc", "update: hmc|heatbath")
    trajs = prm.int_param("trajs", 64, "HMC trajectories")
    tau = prm.float_param("tau", 2.0, "trajectory length")
    steps = prm.int_param("steps", 10, "MD steps per trajectory")
    scheme = prm.str_param("scheme", "2MN", "integrator scheme")
    gfix = prm.bool_param("gfix", False, "maximal-tree gauge fixing")
    sweeps = prm.int_param("sweeps", 50, "heatbath sweeps")
    n_or = prm.int_param("or", 1, "over-relaxation sweeps per heatbath")
    meas_freq = prm.int_param("meas", 1, "measurement frequency")
    flow_time = prm.float_param("flowTime", 0.0,
                                "gradient-flow time per measurement")
    flow_dt = prm.float_param("flowDt", 0.02, "flow step")
    seed = prm.int_param("seed", 11 ** 7, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.models import u1

    shape = (nd,) + (L,) * nd
    print(f"# u1_mc lat={'x'.join([str(L)] * nd)} beta={beta} "
          f"algo={algo} device={jax.devices()[0]}")

    @jax.jit
    def init(key):
        return u1.random_field(key, shape, jnp.float32)

    theta = init(jax.random.PRNGKey(seed))

    meas = jax.jit(lambda t: (
        jnp.real(u1.plaquette(t)).astype(jnp.float32),
        jnp.imag(u1.plaquette(t)).astype(jnp.float32),
        u1.topo_charge(t).astype(jnp.float32)))
    nflow = int(round(flow_time / flow_dt)) if flow_time > 0 else 0
    flow = jax.jit(lambda t: u1.gauge_flow(t, flow_dt, nflow)) \
        if nflow else None

    if algo == "hmc":
        upd = jax.jit(lambda k, t: u1.hmc_step(
            k, t, beta, tau, steps, scheme, gfix=gfix))
        n_iter = trajs
    elif algo == "heatbath":
        upd = jax.jit(lambda k, t: (
            u1.heatbath_sweep(k, t, beta, over_relax=n_or), None))
        n_iter = sweeps
    else:
        raise SystemExit(f"unknown algo {algo!r}")

    t0 = time.time()
    n_acc = 0
    for it in range(n_iter):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), it + 1)
        theta, stats = upd(key, theta)
        if (it + 1) % meas_freq == 0:
            pre, pim, q = meas(theta)
            line = (f"MEAS {algo} {it+1} plaq {float(pre):.8g} "
                    f"{float(pim):.4g} topo {float(q):.6g}")
            if stats is not None:
                acc = bool(stats["accept"])
                n_acc += acc
                line += (f" dH {float(stats['dH']):.6g} "
                         f"acc {int(acc)}")
            if flow is not None:
                qf = meas(flow(theta))[2]
                line += f" flowTopo {float(qf):.6g}"
            print(line)
    dtime = time.time() - t0
    extra = (f" acc_rate {n_acc/max(1, n_iter):.3f}"
             if algo == "hmc" else "")
    print(f"# {n_iter} {algo} updates in {dtime:.2f} s{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
