"""Seeded golden-log regression (the reference's de-facto HMC
correctness contract, SURVEY.md §4.6: tests/extra/staghmc_sh golden
logs at ~1e-11 relative tolerance).

A fixed-seed pure-gauge HMC chain on CPU/f64 must reproduce committed
dH and plaquette values.  Any silent change to the RNG stream
convention, action normalization, force sign, or integrator
coefficients breaks this loudly.  (Golden values regenerated ONLY for
deliberate, documented convention changes.)
"""

from functools import partial

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group

# (dH, plaquette) per trajectory; seed 12345, 4^4, beta 5.5, 2MN,
# tau 0.5, 10 steps, cold start, complex128.
GOLDEN = [
    (0.7474117191941332, 0.6923555510301692),
    (0.27686032368728775, 0.6142860254088767),
    (0.1466189239945379, 0.5730437253144857),
    (0.012238588820309815, 0.5686549836247141),
    (0.030043954384382232, 0.5584829485145446),
]

RTOL = 1e-10


def test_seeded_hmc_chain_reproduces():
    lat = Lattice((4, 4, 4, 4))
    c = ga.wilson(5.5)
    act = partial(ga.full_action, c, lat)
    frc = partial(ga.gauge_force, c, lat)
    u = group.unit_gauge(lat, jnp.complex128)
    step = jax.jit(lambda k, uu: hmc.hmc_step(
        k, uu, act, frc, integrators.get_integrator("2MN"), 0.5, 10))
    for t, (dh_ref, pl_ref) in enumerate(GOLDEN):
        u, st = step(jax.random.fold_in(jax.random.PRNGKey(12345), t), u)
        assert float(st.dH) == pytest.approx(dh_ref, rel=RTOL, abs=1e-12)
        assert float(loops.plaquette(lat, u)) == pytest.approx(
            pl_ref, rel=RTOL)
