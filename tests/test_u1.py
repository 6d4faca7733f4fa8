"""Compact U(1) pure-gauge model tests (models/u1.py).

Reference programs: src/examples/puregauge2du1.nim (HMC, topo2DU1,
maxTreeFix), puregaugehb2du1.nim (heatbath + over-relaxation).

Oracle: in 2D the Wilson U(1) plaquette expectation is exactly
I1(beta)/I0(beta) up to exponentially small torus corrections — both
the heatbath (von Mises sampler + staple convention) and HMC chains
must reproduce it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import iv

from qex_tpu.models import u1


def _rand(key, shape):
    return u1.random_field(jax.random.PRNGKey(key), shape)


def test_topo_charge_integer():
    th = _rand(1, (2, 12, 12))
    q = float(u1.topo_charge(th))
    assert abs(q - round(q)) < 1e-9


def test_force_matches_finite_difference():
    th = _rand(2, (2, 5, 5))
    f = u1.force(th, 1.3)
    eps = 1e-6
    for idx in [(0, 1, 2), (1, 4, 0)]:
        e = jnp.zeros_like(th).at[idx].set(1.0)
        fd = (u1.action(th + eps * e, 1.3)
              - u1.action(th - eps * e, 1.3)) / (2 * eps)
        assert abs(float(f[idx]) - float(fd)) < 1e-6


def test_over_relax_preserves_action():
    th = _rand(3, (2, 8, 8))
    s0 = float(u1.action(th, 1.7))
    s1 = float(u1.action(u1.over_relax_sweep(th), 1.7))
    assert abs(s1 - s0) < 1e-8 * max(1.0, abs(s0))


def test_max_tree_size_and_freeze():
    mask = u1.max_tree_mask((6, 6))
    # a maximal tree on the torus has V-1 links
    assert int(mask.sum()) == 6 * 6 - 1
    th = _rand(4, (2, 6, 6))
    th2, stats = u1.hmc_step(jax.random.PRNGKey(5), th, 1.0,
                             tau=0.5, steps=4, gfix=True)
    # tree links never move in the gauge-fixed chain
    np.testing.assert_allclose(np.asarray(th2)[np.asarray(mask)],
                               np.asarray(th)[np.asarray(mask)])
    assert np.isfinite(float(stats["dH"]))


@pytest.mark.parametrize("scheme,order", [("2MN", 2), ("4MN3F1GP", 4)])
def test_hmc_dh_scaling(scheme, order):
    """dH per trajectory scales as dt^order at fixed tau and momenta
    (exact FG via jvp for the force-gradient scheme)."""
    th = _rand(6, (2, 8, 8))
    beta, tau = 1.0, 1.0

    def dh(steps):
        _, stats = u1.hmc_step(jax.random.PRNGKey(7), th, beta,
                               tau=tau, steps=steps, scheme=scheme)
        return abs(float(stats["dH"]))

    r = dh(4) / max(dh(8), 1e-300)
    expect = 2.0 ** order
    assert 0.5 * expect < r < 2.0 * expect


def test_heatbath_plaquette_exact():
    """<plaq> = I1(beta)/I0(beta) (von Mises sampler + staple
    conventions are both wrong if this fails)."""
    beta, L = 2.0, 16
    exact = iv(1, beta) / iv(0, beta)
    th = _rand(8, (2, L, L))
    sweep = jax.jit(lambda k, t: u1.heatbath_sweep(k, t, beta))
    plq = jax.jit(lambda t: jnp.real(u1.plaquette(t)))
    vals = []
    for it in range(40):
        th = sweep(jax.random.fold_in(jax.random.PRNGKey(9), it), th)
        if it >= 10:
            vals.append(float(plq(th)))
    mean = np.mean(vals)
    # sigma ~ sqrt((1 - <p>^2)/V/n) ~ 0.002; allow 5 sigma-ish
    assert abs(mean - exact) < 0.02, (mean, exact)


def test_hmc_plaquette_exact():
    beta, L = 1.0, 8
    exact = iv(1, beta) / iv(0, beta)
    th = _rand(10, (2, L, L))
    step = jax.jit(lambda k, t: u1.hmc_step(k, t, beta, tau=1.0,
                                            steps=8))
    vals, acc = [], 0
    for it in range(80):
        th, stats = step(jax.random.fold_in(jax.random.PRNGKey(11),
                                            it), th)
        acc += int(stats["accept"])
        if it >= 20:
            vals.append(float(stats["plaq"]))
    assert acc / 80 > 0.7
    assert abs(np.mean(vals) - exact) < 0.04, (np.mean(vals), exact)


def test_flow_freezes_topology():
    """Gradient flow drives plaquette phases to 2*pi multiples: Q
    integer and stable, plaquette -> 1."""
    th = _rand(12, (2, 10, 10))
    q0 = float(u1.topo_charge(th))
    thf = u1.gauge_flow(th, 0.05, 600)
    qf = float(u1.topo_charge(thf))
    assert abs(qf - round(qf)) < 1e-6
    # the flow fixed point in sector Q is uniform F = 2 pi Q / V
    expect = np.cos(2 * np.pi * round(qf) / 100.0)
    assert abs(float(jnp.real(u1.plaquette(thf))) - expect) < 0.01
    # wrapping is exact on the starting field too
    assert abs(q0 - round(q0)) < 1e-9


def test_heatbath_topo_samples_sectors():
    """The heatbath chain moves between topological sectors at small
    beta (ergodicity check on Q)."""
    th = _rand(13, (2, 8, 8))
    sweep = jax.jit(lambda k, t: u1.heatbath_sweep(k, t, 0.5))
    qs = set()
    for it in range(20):
        th = sweep(jax.random.fold_in(jax.random.PRNGKey(14), it), th)
        qs.add(round(float(u1.topo_charge(th))))
    assert len(qs) >= 2
