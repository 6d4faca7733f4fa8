"""Gauge fixing tests (reference pattern: tests/examples/tgaugefix.nim):
fixing a gauge-transformed unit configuration must recover F = 1, and
the gauge condition residual must drop monotonically."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import fix
from qex_tpu.ops import group, linalg

DT = jnp.complex128


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 4))


def test_fix_pure_gauge_configuration(lat):
    """A gauge transform of the unit field must fix back to F ~ 1."""
    key = jax.random.PRNGKey(8)
    g = group.random_su(key, lat.dims, lat.nc, DT)
    uu = group.unit_gauge(lat, DT)
    u = fix.apply_gauge_transform(lat, uu, g)
    f0 = float(fix.functional(lat, u, range(lat.nd)))
    assert f0 < 0.99
    gfix, u_fixed = fix.gauge_fix(lat, u, gauge="landau", iters=300)
    f1 = float(fix.functional(lat, u_fixed, range(lat.nd)))
    assert f1 > 0.99999, f1
    th = float(fix.violation(lat, u_fixed, range(lat.nd)))
    assert th < 1e-8, th


def test_fix_improves_functional_random(lat):
    key = jax.random.PRNGKey(9)
    u = jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    dirs = range(lat.nd - 1)  # coulomb
    f0 = float(fix.functional(lat, u, dirs))
    th0 = float(fix.violation(lat, u, dirs))
    g, u_fixed = fix.gauge_fix(lat, u, gauge="coulomb", iters=150)
    f1 = float(fix.functional(lat, u_fixed, dirs))
    th1 = float(fix.violation(lat, u_fixed, dirs))
    assert f1 > f0
    assert th1 < 1e-6 * th0, (th0, th1)
    # the transform is SU(3)
    dev = group.check_su(g)
    assert dev["unitarity_dev2_per_site"] < 1e-16
    # gauge-invariant quantities unchanged (plaquette)
    from qex_tpu.gauge import loops
    p0 = float(loops.plaquette(lat, u))
    p1 = float(loops.plaquette(lat, u_fixed))
    assert p0 == pytest.approx(p1, rel=1e-10)
