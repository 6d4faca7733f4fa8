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

RTOL = 2e-11  # the reference regression contract (tests/extra/staghmc_sh/run:40-44)


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


# --- fermionic golden chains (VERDICT round-2 item 2) -----------------------
# Three seeded 4^4 staghmc_spv-composition chains pinned at 2e-11
# (f64, CPU): plain Nf=4 + PV, Hasenbusch-split, nHYP-smeared + PV --
# the reference's de-facto fermionic correctness contract
# (/root/reference/tests/extra/staghmc_sh/run:20-44: seeded trajectory
# logs diffed at 2e-11).  A silent change to the fermion heatbath
# stream, CG-force sign, rooted/Hasenbusch composition, or smeared
# force chain fails here loudly.  Regenerate ONLY on documented
# convention changes: JAX_PLATFORMS=cpu python tools/gen_golden_fermion.py
# (dH, plaq, pbp) per trajectory; params in tools/gen_golden_fermion.py.
# Regenerated round 4: Hamiltonian measurement moved to the
# compensated two-float path (ops/dsum, hamiltonian2) -- trajectories
# are bit-identical (plaq/pbp unchanged), dH shifted ~1e-12 from the
# new summation order.
GOLDEN_FERMION = {
    "plain_pv": [
        (0.7977516919705983, 1.0, 0.39377029170628247),
        (0.913221251602376, 0.7189361898467947, 0.6456261778664704),
        (0.35231822033023713, 0.6327168382404691, 0.6622240932078072),
    ],
    "hasenbusch": [
        (0.960349127977441, 1.0, 0.39377029170628247),
        (1.023688467885335, 0.7323028307197693, 0.597420728433744),
        (0.251873024309676, 0.6473556721902065, 0.6471874900211066),
    ],
    "nhyp_pv": [
        (1.2994141704229474, 1.0, 0.39377029170628247),
        (1.3308161998911543, 1.0, 0.3932153706213661),
        (1.3318467452180747, 0.7313167840218266, 0.5728301518514229),
    ],
}


@pytest.mark.parametrize("name", sorted(GOLDEN_FERMION))
def test_seeded_fermion_chain_reproduces(name):
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "tools"))
    from gen_golden_fermion import LAT, SEED, SP, compositions
    from qex_tpu.observables.condensate import pbp_staggered

    lat = Lattice(LAT)
    theory = compositions(lat)[name]
    u = group.unit_gauge(lat, jnp.complex128)
    step = jax.jit(lambda k, uu: theory.hmc_step(k, uu))
    meas = jax.jit(lambda k, uu: (
        loops.plaquette(lat, uu),
        pbp_staggered(k, lat, uu, 0.2, params=SP)))
    for t, (dh_ref, pl_ref, pbp_ref) in enumerate(GOLDEN_FERMION[name]):
        k = jax.random.fold_in(jax.random.PRNGKey(SEED), t)
        u, st = step(k, u)
        pl, pbp = meas(jax.random.fold_in(k, 999), u)
        assert float(st.dH) == pytest.approx(dh_ref, rel=RTOL,
                                             abs=1e-12), (name, t)
        assert float(pl) == pytest.approx(pl_ref, rel=RTOL), (name, t)
        assert float(pbp) == pytest.approx(pbp_ref, rel=RTOL), (name, t)
