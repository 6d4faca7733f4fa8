"""The SOLVER/HMC hot path on the 8-device mesh (VERDICT.md item 2).

Round 1 shard-tested only the full-lattice oracle operator; these tests
pin the eo-packed layouts actually used in production under GSPMD
sharding: d2ee, the dist-3 naik operator d2ee3, a CG solve, the full
solve_eo driver, and one LatticeFieldTheory HMC trajectory -- each
compared against the identical computation on replicated (single-device)
arrays.

Local-extent constraints (documented contract):
* full-lattice axes: every local extent must be EVEN
  (parallel.mesh.partition_geom enforces this), so shard-local
  coordinate parity equals global parity;
* eo-packed fields have the t axis HALVED, so sharding the packed t
  axis over g_t devices requires (T/2) % g_t == 0 -- guaranteed when
  the full-lattice local t extent is even.

Reference parity: comm/compute-overlapped halo exchange inside the hot
operator (src/physics/stagD.nim:349-396) and depth-3 halos
(src/comms/halo.nim:62-115); GSPMD inserts the collective-permutes.
"""

import jax
import jax.numpy as jnp
import pytest
from functools import partial

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.parallel import make_lattice_mesh, shard_field
from qex_tpu.physics import staggered as st
from qex_tpu.physics import stag_solve
from qex_tpu.solvers import cg
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.fixture(scope="module")
def setup():
    lat = Lattice((8, 8, 8, 8))
    lm = make_lattice_mesh(lat)
    key = jax.random.PRNGKey(7)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])
    s = st.new_stag_eo(lat, u)
    x_e = (jax.random.normal(jax.random.fold_in(key, 9),
                             (lat.nc,) + lat.dims[:-1]
                             + (lat.dims[-1] // 2,)) + 0j).astype(DT)
    return lat, lm, u, s, x_e


def _shard_eo(lm, a, n_site_axes):
    """Shard an eo-packed field: same spec as full fields -- the packed
    t axis (halved) rides mesh axis ax{nd-1}."""
    return shard_field(lm, a, n_site_axes)


def test_d2ee_sharded_matches(setup):
    lat, lm, u, s, x_e = setup
    f = jax.jit(lambda ge, go, v: st.d2ee(st.StaggeredEO(lat, ge, go),
                                          v, 0.1))
    ref = f(s.g_e, s.g_o, x_e)
    got = f(_shard_eo(lm, s.g_e, 3), _shard_eo(lm, s.g_o, 3),
            _shard_eo(lm, x_e, 1))
    dev = float(linalg.norm2(jnp.asarray(got) - ref))
    assert dev < 1e-24 * float(linalg.norm2(ref)), dev


def test_d2ee3_naik_sharded_matches(setup):
    # dist-3 hops crossing shard boundaries (local extent 4 or 2)
    lat, lm, u, s, x_e = setup
    key = jax.random.PRNGKey(11)
    fat = st.phase_links(lat, u)
    long = jnp.stack([
        group.random_su(jax.random.fold_in(key, 20 + i), lat.dims,
                        lat.nc, DT) for i in range(lat.nd)])
    s3 = st.new_stag3_eo(lat, fat, long)
    f = jax.jit(lambda a, b, c, d, v: st.d2ee3(
        st.Staggered3EO(lat, a, b, c, d), v, 0.1))
    ref = f(s3.gf_e, s3.gf_o, s3.gl_e, s3.gl_o, x_e)
    got = f(*[_shard_eo(lm, a, 3) for a in
              (s3.gf_e, s3.gf_o, s3.gl_e, s3.gl_o)],
            _shard_eo(lm, x_e, 1))
    dev = float(linalg.norm2(jnp.asarray(got) - ref))
    assert dev < 1e-24 * float(linalg.norm2(ref)), dev


def test_cg_sharded_converges_same(setup):
    lat, lm, u, s, x_e = setup
    m = 0.2

    def run(ge, go, b):
        sop = st.StaggeredEO(lat, ge, go)
        x, stats = cg.cg_solve_restarted(partial(st.d2ee, sop, m=m), b,
                                         r2req=1e-12, maxits=200,
                                         restarts=2)
        return x, stats.iterations

    f = jax.jit(run)
    x_ref, it_ref = f(s.g_e, s.g_o, x_e)
    x_sh, it_sh = f(_shard_eo(lm, s.g_e, 3), _shard_eo(lm, s.g_o, 3),
                    _shard_eo(lm, x_e, 1))
    # same Krylov trajectory up to reduction reassociation
    assert int(it_sh) == int(it_ref)
    dev = float(linalg.norm2(jnp.asarray(x_sh) - x_ref))
    assert dev < 1e-16 * float(linalg.norm2(x_ref)), dev
    # true residual of the sharded solve
    r = st.d2ee(s, jnp.asarray(x_sh), m) - x_e
    rel = float(linalg.norm2(r)) / float(linalg.norm2(x_e))
    assert rel < 1e-11, rel


def test_solve_eo_driver_sharded(setup):
    # the production driver (fast lane-packed layout inside) accepts
    # sharded inputs and returns the right answer
    lat, lm, u, s, x_e = setup
    m = 0.25
    b = (jax.random.normal(jax.random.PRNGKey(3), lat.vector_shape())
         + 0j).astype(DT)
    b_sh = shard_field(lm, b, 1)
    x, stats = jax.jit(
        lambda ge, go, bb: stag_solve.solve(
            st.StaggeredEO(lat, ge, go), bb, m,
            SolverParams(r2req=1e-12, maxits=200, restarts=2))
    )(_shard_eo(lm, s.g_e, 3), _shard_eo(lm, s.g_o, 3), b_sh)
    # check against the full operator on replicated arrays
    g = st.phase_links(lat, u)
    r = st.d_full(lat, g, jnp.asarray(x), m) - b
    rel = float(linalg.norm2(r)) / float(linalg.norm2(b))
    assert rel < 1e-10, rel


def test_hisq_fattening_sharded_matches(setup):
    # the two-level HISQ fattening (fat7 -> U(3) projection -> asqtad
    # fat + naik) under GSPMD sharding: this is the config-5 path --
    # real 32^4x64 fattening exceeds one chip's HBM and runs on the
    # mesh (BASELINE.md north star).  Staples/projection/naik hops all
    # cross shard boundaries here (local extents 4 and 2).
    from qex_tpu.gauge import fat7

    lat, lm, u, s, x_e = setup
    fl_ref, ll_ref = jax.jit(lambda uu: fat7.hisq_links(lat, uu))(u)
    fl_sh, ll_sh = jax.jit(lambda uu: fat7.hisq_links(lat, uu))(
        shard_field(lm, u, 3))
    for a, b in ((fl_sh, fl_ref), (ll_sh, ll_ref)):
        dev = float(linalg.norm2(jnp.asarray(a) - b))
        assert dev < 1e-24 * float(linalg.norm2(b)), dev
    # the bounded-memory forward path (per-direction jits) also accepts
    # sharded inputs and keeps the sharding across its jit boundaries
    fl_lm, ll_lm = fat7.hisq_links_lowmem(lat, shard_field(lm, u, 3))
    dev = float(linalg.norm2(jnp.asarray(fl_lm) - fl_ref))
    assert dev < 1e-20 * float(linalg.norm2(fl_ref)), dev
    dev = float(linalg.norm2(jnp.asarray(ll_lm) - ll_ref))
    assert dev < 1e-20 * float(linalg.norm2(ll_ref)), dev


def test_nhyp_smear_sharded_matches(setup):
    # the production matter smearing (3-level nHYP with the
    # Newton-Schulz U projection) under GSPMD: staples and projections
    # cross shard boundaries
    from qex_tpu.gauge.smear import HypCoefs, nhyp_smear

    lat, lm, u, s, x_e = setup
    f = jax.jit(lambda uu: nhyp_smear(HypCoefs(), lat, uu))
    ref = f(u)
    got = f(shard_field(lm, u, 3))
    dev = float(linalg.norm2(jnp.asarray(got) - ref))
    assert dev < 1e-24 * float(linalg.norm2(ref)), dev


def test_wilson_solve_sharded_matches(setup):
    # the Wilson eo-CGNE driver (half-spinor fast layout inside) under
    # GSPMD: same Krylov trajectory and solution as replicated
    from qex_tpu.physics import wilson as wl

    lat, lm, u, s, x_e = setup
    m = 0.3
    w = wl.new_wilson_eo(lat, u, m)
    b = (jax.random.normal(jax.random.PRNGKey(17),
                           (4, lat.nc) + lat.dims) + 0j).astype(DT)
    f = jax.jit(lambda ge, go, bb: wl.solve_eo(
        wl.WilsonEO(lat, ge, go, m), bb,
        SolverParams(r2req=1e-18, maxits=300, restarts=2)))
    x_ref, st_ref = f(w.g_e, w.g_o, b)
    x_sh, st_sh = f(_shard_eo(lm, w.g_e, 3), _shard_eo(lm, w.g_o, 3),
                    shard_field(lm, b, 2))
    assert int(st_sh.iterations) == int(st_ref.iterations)
    dev = float(linalg.norm2(jnp.asarray(x_sh) - x_ref))
    assert dev < 1e-16 * float(linalg.norm2(x_ref)), dev
    # true residual of the sharded solution against the full operator
    wd = wl.new_wilson(lat, u, m)
    r = wl.wilson_d(wd, jnp.asarray(x_sh)) - b
    rel = float(linalg.norm2(r)) / float(linalg.norm2(b))
    assert rel < 1e-12, rel


def test_stag_eigs_sharded_matches():
    # the hisqev-style eigensolver driver accepts sharded gauge fields
    # (its matvec jits run under GSPMD); eigenvalues match replicated
    import numpy as np

    from qex_tpu.eigens import hisqev

    lat = Lattice((4, 4, 4, 4))
    lm = make_lattice_mesh(lat, devices=jax.devices()[:4],
                           rank_geom=(1, 1, 2, 2))
    key = jax.random.PRNGKey(23)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])
    r_ref = hisqev.stag_eigs(lat, u, 4, tol=1e-10, seed=1)
    r_sh = hisqev.stag_eigs(lat, shard_field(lm, u, 3), 4, tol=1e-10,
                            seed=1)
    assert np.allclose(r_sh.evals, r_ref.evals, rtol=1e-8)
    assert max(r_sh.resids) < 1e-9


def test_hmc_step_sharded_matches(setup):
    from qex_tpu.gauge import action as ga
    from qex_tpu.gauge import loops
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)

    lat, lm, u, s, x_e = setup
    theory = LatticeFieldTheory(
        lat,
        gauge=GaugeActionSpec(ga.wilson(5.5), steps=4, scheme="2MN"),
        fermions=[FermionSpec("fermion", mass=0.5, steps=2,
                              scheme="2MN", smeared=False)],
        smear=None, bc="pppa",
        solver_params=SolverParams(r2req=1e-10, maxits=100, restarts=1),
        tau=0.2)

    @jax.jit
    def step(key, uu):
        u1, stt = theory.hmc_step(key, uu)
        return u1, stt.dH, loops.plaquette(lat, u1)

    key = jax.random.PRNGKey(5)
    u1, dH, plq = step(key, u)
    u1s, dHs, plqs = step(key, shard_field(lm, u, 3))
    assert float(dHs) == pytest.approx(float(dH), abs=1e-8)
    assert float(plqs) == pytest.approx(float(plq), rel=1e-12)
    dev = float(linalg.norm2(jnp.asarray(u1s) - u1))
    assert dev < 1e-16 * float(linalg.norm2(u1)), dev
