"""Two-float compensated reductions (ops/dsum.py).

The contract that fixes the round-3 dH=58.0 quantization: an f32
compensated sum of ~1e6 O(1)-magnitude values must agree with the f64
reference sum to ~sqrt(N)*ulp(site) (per-element input rounding only),
orders of magnitude below the plain-f32-sum error.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.ops import dsum


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(5.0, 2.0, size=n)  # nonzero mean: big cancellation-free H


@pytest.mark.parametrize("n", [1, 2, 3, 7, 1000, 1 << 20, (1 << 20) + 13])
def test_sum2_f32_accuracy(n):
    x64 = _rand(n)
    exact = float(np.sum(np.asarray(x64, np.float64)))
    x32 = jnp.asarray(x64, jnp.float32)

    hi, lo = jax.jit(dsum.sum2)(x32)
    comp = float(np.float64(hi) + np.float64(lo))
    naive = float(jnp.sum(x32))

    # error from input rounding alone: ~|x| * eps * sqrt(N) scale
    budget = 5e-7 * np.sqrt(max(n, 1)) * 7.0 * 4
    assert abs(comp - exact) < max(budget, 1e-5)
    if n >= 1 << 20:
        # the compensated sum must beat plain f32 by a wide margin
        assert abs(comp - exact) < 1e-2
        assert abs(comp - exact) <= abs(naive - exact)


def test_sum2_value_matches_plain_in_f64():
    x = jnp.asarray(_rand(4097), jnp.float64)
    hi, lo = dsum.sum2(x)
    assert np.isclose(float(hi) + float(lo), float(jnp.sum(x)),
                      rtol=1e-14)


def test_two_prod_exact():
    a = jnp.asarray(1.0 + 2.0 ** -20, jnp.float32)
    b = jnp.asarray(1.0 + 2.0 ** -19, jnp.float32)
    p, e = jax.jit(dsum.two_prod)(a, b)
    assert float(np.float64(p) + np.float64(e)) == pytest.approx(
        float(np.float64(a) * np.float64(b)), abs=0, rel=1e-15)


def test_df_scale_and_sub():
    # H-sized pair scaled by a coefficient keeps sub-ulp info
    h = dsum.df_const(6.0e6 + 0.125, jnp.float32)
    s = dsum.df_scale(h, 1.0 / 3.0)
    got = float(np.float64(s[0]) + np.float64(s[1]))
    want = (6.0e6 + 0.125) * float(jnp.asarray(1.0 / 3.0, jnp.float32))
    assert got == pytest.approx(want, rel=1e-13)

    h0 = dsum.df_const(6.0e6, jnp.float32)
    h1 = dsum.df_const(6.0e6 + 1e-3, jnp.float32)
    d = dsum.df_value(dsum.df_sub(h1, h0))
    assert float(d) == pytest.approx(1e-3, rel=1e-6)


def test_redot2_norm22_complex():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1000, 2)) @ np.array([1, 1j])
    y = rng.normal(size=(1000, 2)) @ np.array([1, 1j])
    xc = jnp.asarray(x, jnp.complex64)
    yc = jnp.asarray(y, jnp.complex64)
    n2 = dsum.df_value(dsum.norm22(xc))
    rd = dsum.df_value(dsum.redot2(xc, yc))
    assert float(n2) == pytest.approx(float(np.vdot(x, x).real), rel=1e-5)
    assert float(rd) == pytest.approx(float(np.vdot(x, y).real), rel=1e-4)


def test_hmc_step_action2_matches_scalar():
    """Standalone hmc.hmc_step with action2_fn (the compensated
    Metropolis path bench_configs CONFIG3 uses) reproduces the scalar
    path exactly in f64 (same trajectory; dH differs only by
    summation order ~1e-13)."""
    from functools import partial

    from qex_tpu.gauge import action as ga
    from qex_tpu.hmc import hmc, integrators
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group

    lat = Lattice((4, 4, 4, 4))
    c = ga.wilson(5.5)
    act = partial(ga.full_action, c, lat)
    act2 = partial(ga.full_action2, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    u = group.unit_gauge(lat, jnp.complex128)
    sch = integrators.get_integrator("2MN")
    key = jax.random.PRNGKey(5)
    u1, s1 = jax.jit(lambda k, uu: hmc.hmc_step(
        k, uu, act, frc, sch, 0.5, 10))(key, u)
    u2, s2 = jax.jit(lambda k, uu: hmc.hmc_step(
        k, uu, act, frc, sch, 0.5, 10, action2_fn=act2))(key, u)
    assert float(jnp.max(jnp.abs(u1 - u2))) == 0.0
    assert abs(float(s1.dH) - float(s2.dH)) < 1e-11 * (
        1 + abs(float(s1.dH)))
