"""XY model tests: detailed-balance proxies (energy distributions),
cluster correctness, flow monotonicity.

Physics oracle: at beta >> 1 the 2D XY model orders (|M| -> 1); at
beta << 1 it disorders (|M| ~ 1/sqrt(V)); E/bond -> -beta*<cos> with
<cos> -> 1 at strong coupling.  All three algorithms must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.models import xy


def run_chain(update, key, theta, n, *args):
    for i in range(n):
        key, k = jax.random.split(key)
        out = update(k, theta, *args)
        theta = out[0] if isinstance(out, tuple) else out
    return theta


@pytest.mark.parametrize("algo", ["heatbath", "metropolis", "wolff"])
def test_ordered_phase(algo):
    """beta = 2.0 (ordered): |M| large; all algorithms agree."""
    L = 16
    beta = 2.0
    key = jax.random.PRNGKey(1)
    theta = jax.random.uniform(key, (L, L), minval=-np.pi, maxval=np.pi)
    if algo == "heatbath":
        upd = jax.jit(lambda k, t: xy.heatbath_sweep(k, t, beta))
        theta = run_chain(upd, key, theta, 60)
    elif algo == "metropolis":
        upd = jax.jit(lambda k, t: xy.metropolis_sweep(k, t, beta, 0.8))
        theta = run_chain(upd, key, theta, 150)
    else:
        hb = jax.jit(lambda k, t: xy.heatbath_sweep(k, t, beta))
        wf = jax.jit(lambda k, t: xy.wolff_update(k, t, beta))
        theta = run_chain(hb, key, theta, 10)
        theta = run_chain(wf, jax.random.fold_in(key, 7), theta, 60)
    m, _ = xy.magnetization(theta)
    assert float(m) > 0.5, (algo, float(m))


def test_disordered_phase():
    L = 16
    beta = 0.3
    key = jax.random.PRNGKey(2)
    theta = jnp.zeros((L, L))
    upd = jax.jit(lambda k, t: xy.heatbath_sweep(k, t, beta))
    theta = run_chain(upd, key, theta, 80)
    m, _ = xy.magnetization(theta)
    assert float(m) < 0.4, float(m)


def test_heatbath_metropolis_energy_agree():
    """Mean energy from heatbath and Metropolis chains agree within
    statistical errors (cross-algorithm detailed-balance check)."""
    L = 12
    beta = 1.0
    key = jax.random.PRNGKey(3)
    theta = jax.random.uniform(key, (L, L), minval=-np.pi, maxval=np.pi)
    hb = jax.jit(lambda k, t: xy.heatbath_sweep(k, t, beta))
    mp = jax.jit(lambda k, t: xy.metropolis_sweep(k, t, beta, 0.8))

    def measure(update, key, theta, n_therm, n_meas):
        theta = run_chain(update, key, theta, n_therm)
        es = []
        for i in range(n_meas):
            key = jax.random.fold_in(key, 1000 + i)
            out = update(key, theta)
            theta = out[0] if isinstance(out, tuple) else out
            es.append(float(xy.energy(theta, beta)))
        return np.mean(es), np.std(es) / np.sqrt(len(es))

    e1, s1 = measure(hb, jax.random.PRNGKey(4), theta, 40, 60)
    e2, s2 = measure(mp, jax.random.PRNGKey(5), theta, 120, 180)
    assert abs(e1 - e2) < 5 * np.sqrt(s1 ** 2 + s2 ** 2) + 0.02 * abs(e1), \
        (e1, e2, s1, s2)


def test_wolff_cluster_is_connected_component():
    """Frozen-bond propagation yields a superset of the seed and flips
    preserve |M| distribution; at beta=0 the cluster is the seed only
    with high probability."""
    L = 8
    key = jax.random.PRNGKey(6)
    theta = jax.random.uniform(key, (L, L), minval=-np.pi, maxval=np.pi)
    _, frac = jax.jit(lambda k, t: xy.wolff_update(k, t, 1e-8))(
        jax.random.PRNGKey(7), theta)
    assert float(frac) == pytest.approx(1.0 / (L * L))
    # beta large: cluster spans a large fraction on an ordered state
    _, frac2 = jax.jit(lambda k, t: xy.wolff_update(k, t, 5.0))(
        jax.random.PRNGKey(8), jnp.zeros((L, L)))
    assert float(frac2) > 0.5


def test_spin_flow_smooths():
    key = jax.random.PRNGKey(9)
    theta = jax.random.uniform(key, (16, 16), minval=-np.pi,
                               maxval=np.pi)
    e0 = float(xy.energy(theta, 1.0))
    th1 = xy.spin_flow(theta, 0.05, 40)
    e1 = float(xy.energy(th1, 1.0))
    assert e1 < e0  # gradient flow descends the energy


def test_clock_model_phases():
    """Z_6 clock model: ordered at strong coupling, disordered at weak;
    heatbath and Metropolis agree on the energy."""
    from qex_tpu.models import clock
    L, N = 16, 6
    key = jax.random.PRNGKey(11)
    k0 = jax.random.randint(key, (L, L), 0, N)
    hb = jax.jit(lambda kk, s: clock.heatbath_sweep(kk, s, 2.0, N))
    s = k0
    for i in range(60):
        s = hb(jax.random.fold_in(key, i), s)
    assert float(clock.magnetization(s, N)) > 0.5
    hbw = jax.jit(lambda kk, s: clock.heatbath_sweep(kk, s, 0.3, N))
    s = k0
    for i in range(60):
        s = hbw(jax.random.fold_in(key, 100 + i), s)
    assert float(clock.magnetization(s, N)) < 0.4
    # cross-algorithm energy agreement at beta=1
    def measure(update, seed, n_therm=40, n_meas=60):
        kk = jax.random.PRNGKey(seed)
        s = k0
        for i in range(n_therm):
            out = update(jax.random.fold_in(kk, i), s)
            s = out[0] if isinstance(out, tuple) else out
        es = []
        for i in range(n_meas):
            out = update(jax.random.fold_in(kk, 1000 + i), s)
            s = out[0] if isinstance(out, tuple) else out
            es.append(float(clock.energy(s, 1.0, N)))
        return np.mean(es), np.std(es) / np.sqrt(len(es))
    h1 = jax.jit(lambda kk, s: clock.heatbath_sweep(kk, s, 1.0, N))
    m1 = jax.jit(lambda kk, s: clock.metropolis_sweep(kk, s, 1.0, N))
    e1, s1 = measure(h1, 7)
    e2, s2 = measure(m1, 8, n_therm=120, n_meas=180)
    assert abs(e1 - e2) < 5 * np.sqrt(s1**2 + s2**2) + 0.02 * abs(e1), \
        (e1, e2)
