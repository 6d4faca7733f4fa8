"""Ensemble quasi-Newton HMC for 2D compact U(1) pure gauge.

TPU-native replacement for QEX's src/examples/puregauge2du1qn.nim:
``nstream`` parallel chains, L-BFGS-style mass matrix built from
inter-stream (x, force) difference pairs after ``qnbegin``
trajectories of plain HMC, forward/backward stream sweeps, optional
maximal-tree gauge fixing (required for a meaningful Hessian: the
gauge zero modes are removed).

Usage:
    python -m qex_tpu.apps.u1_qn_hmc -L:16 -beta:5.0 -trajs:24 \
        -qnbegin:8 -nstream:6 [-cpu:true]
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
    L = prm.int_param("L", 16, "lattice size (LxL)")
    beta = prm.float_param("beta", 5.0, "coupling")
    trajs = prm.int_param("trajs", 24, "sweeps over all streams")
    tau = prm.float_param("tau", 2.0, "trajectory length (plain)")
    steps = prm.int_param("steps", 10, "MD steps (plain)")
    qnbegin = prm.int_param("qnbegin", 8, "sweep to start QN updates")
    qntau = prm.float_param("qntau", tau, "trajectory length (QN)")
    qnsteps = prm.int_param("qnsteps", steps, "MD steps (QN)")
    qnh0 = prm.float_param("qnh0", 1.0, "base Hessian diagonal")
    qnyscut = prm.float_param("qnyscut", 0.0, "y.s cutoff")
    nstream = prm.int_param("nstream", 6, "parallel streams")
    gfix = prm.bool_param("gfix", True, "maximal-tree gauge fixing")
    seed = prm.int_param("seed", 11 ** 7, "RNG seed")
    use_cpu = prm.bool_param("cpu", False, "force CPU")

    import jax
    if use_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.hmc import qnhmc
    from qex_tpu.models import u1

    # QEX default qnyscale = 1/(2 beta): inverse diagonal of the
    # free-field Hessian (puregauge2du1qn.nim:724)
    yscale = prm.float_param("qnyscale", 1.0 / (2.0 * beta),
                             "Hessian scale on y")

    shape = (2, L, L)
    print(f"# u1_qn_hmc lat={L}x{L} beta={beta} nstream={nstream} "
          f"qnbegin={qnbegin} device={jax.devices()[0]}")

    tree = u1.max_tree_mask((L, L)) if gfix else None

    def act(t):
        return u1.action(t, beta)

    grad = jax.grad(act)

    @jax.jit
    def mgrad(t):
        g = grad(t)
        return jnp.where(tree, 0.0, g) if tree is not None else g

    @jax.jit
    def init(key):
        ths = jnp.stack([u1.random_field(jax.random.fold_in(key, i),
                                         shape, jnp.float64)
                         for i in range(nstream)])
        if tree is not None:
            ths = jnp.where(tree[None], 0.0, ths)
        return ths

    gs = init(jax.random.PRNGKey(seed))

    plain = jax.jit(lambda k, t: u1.hmc_step(k, t, beta, tau, steps,
                                             gfix=gfix))
    qn_step = jax.jit(lambda k, t, ops: qnhmc.qn_hmc_step(
        k, t, ops, act, grad, qntau, qnsteps, mask=tree))
    prep = jax.jit(lambda st, ex: qnhmc.qn_prep(st, exclude=ex))
    meas = jax.jit(lambda t: (
        jnp.real(u1.plaquette(t)).astype(jnp.float32),
        u1.topo_charge(t).astype(jnp.float32)))

    # pair slot i = difference between streams i and i+1 (mod nstream)
    st = qnhmc.qn_init(nstream, shape, h0=qnh0, dtype=jnp.float64)
    set_pair = jax.jit(lambda s, i, xa, xb: qnhmc.qn_set(
        s, i, xa, mgrad(xa), xb, mgrad(xb), yscale=yscale,
        cutoff=qnyscut), static_argnums=1)

    forward = True
    t0 = time.time()
    n_acc = n_tot = 0
    for n in range(1, trajs + 1):
        if n == qnbegin:
            print("# STARTING QN updates")
            for i in range(nstream):
                st = set_pair(st, i, gs[i], gs[(i + 1) % nstream])
        for ns in range(nstream):
            i = ns if forward else nstream - 1 - ns
            key = jax.random.fold_in(
                jax.random.PRNGKey(seed + 1), n * nstream + ns)
            if n >= qnbegin:
                ex = jnp.zeros((nstream,), bool)
                ex = ex.at[i].set(True).at[(i - 1) % nstream].set(True)
                ops = prep(st, ex)
                x_new, stats = qn_step(key, gs[i], ops)
            else:
                x_new, stats = plain(key, gs[i])
            gs = gs.at[i].set(x_new)
            acc = bool(stats["accept"])
            n_acc += acc
            n_tot += 1
            if n >= qnbegin:
                # refresh the pairs this stream participates in
                st = set_pair(st, i, gs[i], gs[(i + 1) % nstream])
                st = set_pair(st, (i - 1) % nstream,
                              gs[(i - 1) % nstream], gs[i])
            pl, q = meas(gs[i])
            print(f"MEAS sweep {n} stream {i} plaq {float(pl):.8g} "
                  f"topo {float(q):.5g} dH {float(stats['dH']):.6g} "
                  f"acc {int(acc)}")
        forward = not forward
    print(f"# {n_tot} trajectories in {time.time()-t0:.2f} s "
          f"acc_rate {n_acc/max(1, n_tot):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
