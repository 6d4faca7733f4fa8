"""Repelling-attracting HMC for pure gauge theory.

TPU-native replacement for QEX's src/rahmc/puregaugerahmc.nim
(465 LoC; arXiv:2403.04607): conformal leapfrog where the momentum
update carries a damping factor b = exp(gamma eps/2),

    p <- b p - eps F(U),

run with gamma < 0 (repelling) for the first half of the trajectory
and gamma > 0 (attracting, b -> 1/b) for the second; the phase-space
volume factors cancel between halves so plain Metropolis acceptance is
exact.  The usual HMC limit is gamma = 0.

Usage:
    python -m qex_tpu.apps.rahmc -lat:8,8,8,8 -beta:6.0 -gamma:0.3 \
        -tau:1.0 -steps:24 -trajs:10 -hmcUntil:2 [-cpu:true]
"""

from __future__ import annotations

import math
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
    lat_dims = prm.int_seq_param("lat", [8, 8, 8, 8], "lattice size")
    beta = prm.float_param("beta", 6.0, "gauge coupling")
    adj_fac = prm.float_param("adjFac", 0.0, "adjoint ratio")
    gamma = prm.float_param("gamma", 0.3, "conformal damping rate")
    tau = prm.float_param("tau", 1.0, "trajectory length")
    steps = prm.int_param("steps", 24, "MD steps (even)")
    trajs = prm.int_param("trajs", 10, "trajectories")
    hmc_until = prm.int_param("hmcUntil", 1,
                              "plain-HMC warmup trajectories")
    seed = prm.int_param("seed", 987654321, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU backend")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from functools import partial

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import loops
    from qex_tpu.hmc import hmc, integrators
    from qex_tpu.ops import group

    lat = Lattice(tuple(lat_dims))
    on_cpu = jax.devices()[0].platform == "cpu"
    dtype = jnp.complex128 if (on_cpu and jax.config.jax_enable_x64) \
        else jnp.complex64
    coeffs = (ga.adjoint_action(beta, adj_fac) if adj_fac
              else ga.wilson(beta))
    act = partial(ga.full_action, coeffs, lat)
    frc = partial(ga.gauge_force, coeffs, lat)
    nhalf = steps // 2
    eps = tau / steps

    def conformal_half(u, p, g):
        """One half-trajectory of conformal leapfrog at rate g
        (puregaugerahmc.nim evolveRAHMC)."""
        b = math.exp(g * eps / 2)
        b2 = math.exp(g * eps)
        p = b * p - (eps / 2) * frc(u)
        for _ in range(nhalf - 1):
            u = hmc.gauge_update_u(u, p, eps)
            p = b2 * p - (1.0 + b2) * (eps / 2) * frc(u)
        u = hmc.gauge_update_u(u, p, eps)
        p = b * p - b * (eps / 2) * frc(u)
        return u, p

    def ra_step(key, u):
        kp, ka = jax.random.split(key)
        nd, nc = u.shape[0], u.shape[1]
        p = jax.vmap(lambda k: group.random_tah(
            k, u.shape[3:], nc, u.dtype))(jax.random.split(kp, nd))
        h0 = hmc.kinetic_energy(p) + act(u)
        u1, p1 = conformal_half(u, p, -gamma)   # repelling
        u1, p1 = conformal_half(u1, p1, +gamma)  # attracting
        h1 = hmc.kinetic_energy(p1) + act(u1)
        dH = h1 - h0
        accept = jnp.log(jax.random.uniform(ka, (), jnp.float32)) < -dH
        return jnp.where(accept, u1, u), dH, accept

    scheme = integrators.get_integrator("LF")
    hmc_step = jax.jit(lambda k, uu: hmc.hmc_step(
        k, uu, act, frc, scheme, tau, steps))
    rahmc_step = jax.jit(ra_step)
    meas = jax.jit(lambda uu: jnp.real(
        loops.plaquette(lat, uu)).astype(jnp.float32))

    print(f"# rahmc {lat.dims} beta={beta} gamma={gamma} tau={tau} "
          f"steps={steps} device={jax.devices()[0]}")
    u = group.unit_gauge(lat, dtype)
    n_acc = 0
    for traj in range(trajs):
        t0 = time.time()
        key = jax.random.fold_in(jax.random.PRNGKey(seed), traj)
        if traj < hmc_until:
            u, st = hmc_step(key, u)
            dH, acc, alg = float(st.dH), bool(st.accepted), "HMC"
        else:
            u, dHj, accj = rahmc_step(key, u)
            dH, acc, alg = float(dHj), bool(accj), "raHMC"
        n_acc += int(acc)
        print(f"traj {traj} [{alg}]: dH {dH:+.6g} "
              f"{'ACCEPT' if acc else 'REJECT'} MEASplaq "
              f"{float(meas(u)):.10g} ({time.time()-t0:.2f} s)")
    print(f"# acceptance {n_acc}/{trajs} = {n_acc/max(1,trajs):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
