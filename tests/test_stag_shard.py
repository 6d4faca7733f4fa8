"""The shard_map + halo-fixup kernel path (physics/stag_shard.py).

Proves on the 8-device CPU mesh that the local-periodic single-hop
operator plus the exact surface correction reproduces the global fast
operator bit-tight -- the structure that carries the Pallas kernel
multi-chip (GSPMD cannot partition a pallas_call).  The local hop here
is the jnp mirror (hop3_ref), which is separately pinned against the
real kernel by tests/test_stag_pallas.py's interpret-mode equality.

Reference parity: comm/compute-overlapped halo pipeline inside the hot
operator (src/physics/stagD.nim:349-396, src/layout/shifts.nim:67-286).
"""

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.parallel import make_lattice_mesh
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import stag_pallas_hisq as sph
from qex_tpu.physics import stag_shard as sh
from qex_tpu.physics import staggered as st
from qex_tpu.physics.stag_pallas import _split
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.fixture(scope="module", params=[(1, 1, 2, 4), (1, 1, 4, 2)])
def setup(request):
    lat = Lattice((4, 6, 8, 8))   # asymmetric: catches axis mixups
    lm = make_lattice_mesh(lat, rank_geom=request.param)
    key = jax.random.PRNGKey(13)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])
    s = st.new_stag_eo(lat, u)
    fs = sf.new_fast(s)
    ps = sph.new_pallas_stag8(fs, links_dtype=jnp.float64)
    ps_sh = sph.PallasStag3EO(lat, sh.shard_links(lm, ps.l_e),
                              sh.shard_links(lm, ps.l_o))
    x = (jax.random.normal(jax.random.fold_in(key, 9),
                           (lat.nc,) + lat.dims[:-1]
                           + (lat.dims[-1] // 2,)) + 0j).astype(DT)
    xf = sf.to_fast(x, lat)
    return lat, lm, s, fs, ps, ps_sh, _split(xf, jnp.float64)


def _rel(a, b):
    return float(linalg.norm2(jnp.asarray(a) - b)) / float(linalg.norm2(b))


def test_hop_ref_matches_fast_global(setup):
    # the jnp kernel mirror on ONE device (no mesh) == dslash_fast
    lat, lm, s, fs, ps, ps_sh, xs = setup
    xc = xs[0] + 1j * xs[1]
    for parity in (0, 1):
        l = ps.l_e if parity == 0 else ps.l_o
        got = sh.hop3_ref(lat, l, xs, parity)
        ref = sf.dslash_fast(fs, xc, parity)
        assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_d2ee_sharded_matches(setup):
    lat, lm, s, fs, ps, ps_sh, xs = setup
    m = 0.15
    ref = sf.d2ee_fast(fs, xs[0] + 1j * xs[1], m)
    got = jax.jit(lambda v: sh.d2ee_sharded(lm, ps_sh, v, m,
                                            use_pallas=False))(
        sh.shard_vec(lm, xs))
    got = jnp.asarray(got)
    assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_d2dd_sharded_matches(setup):
    lat, lm, s, fs, ps, ps_sh, xs = setup
    for parity in (0, 1):
        ref = sf.d2dd_fast(fs, xs[0] + 1j * xs[1], parity)
        got = jnp.asarray(jax.jit(
            lambda v: sh.d2dd_sharded(lm, ps_sh, v, parity,
                                      use_pallas=False))(
            sh.shard_vec(lm, xs)))
        assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_solve_ee_sharded(setup):
    lat, lm, s, fs, ps, ps_sh, xs = setup
    m = 0.25
    b_e = sf.from_fast(xs[0] + 1j * xs[1], lat)
    x_e, stats = sh.solve_ee_sharded(
        lm, s, b_e, m, SolverParams(r2req=1e-20, maxits=300, restarts=2))
    r = st.d2ee(s, jnp.asarray(x_e), m) - b_e
    rel = float(linalg.norm2(r)) / float(linalg.norm2(b_e))
    assert rel < 1e-18, rel


@pytest.fixture(scope="module")
def setup3():
    # dist-3 halos need local Z >= 3 and local Th >= 2:
    # (4, 6, 8, 16) over (1, 1, 2, 4) -> local (4, 6, 4, 4), Th_l = 2
    from qex_tpu.physics import stag_pallas_hisq as sph

    lat = Lattice((4, 6, 8, 16))
    lm = make_lattice_mesh(lat, rank_geom=(1, 1, 2, 4))
    key = jax.random.PRNGKey(29)
    fat = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])
    long = jnp.stack([
        group.random_su(jax.random.fold_in(key, 10 + i), lat.dims,
                        lat.nc, DT) for i in range(lat.nd)])
    s3 = st.new_stag3_eo(lat, fat, long)
    fs3 = sf.new_fast3(s3)
    ps = sph.new_pallas_hisq(fs3, links_dtype=jnp.float64)
    ps_sh = sph.PallasStag3EO(lat, sh.shard_links3(lm, ps.l_e),
                              sh.shard_links3(lm, ps.l_o))
    x = (jax.random.normal(jax.random.fold_in(key, 9),
                           (lat.nc,) + lat.dims[:-1]
                           + (lat.dims[-1] // 2,)) + 0j).astype(DT)
    xf = sf.to_fast(x, lat)
    return lat, lm, s3, fs3, ps, ps_sh, _split(xf, jnp.float64)


def test_hop3_ref_matches_fast3_global(setup3):
    lat, lm, s3, fs3, ps, ps_sh, xs = setup3
    xc = xs[0] + 1j * xs[1]
    for parity in (0, 1):
        l = ps.l_e if parity == 0 else ps.l_o
        got = sh.hop3_ref(lat, l, xs, parity)
        ref = sf.dslash3_fast(fs3, xc, parity)
        assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_d2ee3_sharded_matches(setup3):
    lat, lm, s3, fs3, ps, ps_sh, xs = setup3
    m = 0.1
    ref = sf.d2ee3_fast(fs3, xs[0] + 1j * xs[1], m)
    got = jnp.asarray(jax.jit(
        lambda v: sh.d2ee3_sharded(lm, ps_sh, v, m, use_pallas=False))(
        sh.shard_vec(lm, xs)))
    assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_d2dd3_sharded_matches(setup3):
    lat, lm, s3, fs3, ps, ps_sh, xs = setup3
    ref = sf.d2dd3_fast(fs3, xs[0] + 1j * xs[1], 0)
    got = jnp.asarray(jax.jit(
        lambda v: sh.d2dd3_sharded(lm, ps_sh, v, 0, use_pallas=False))(
        sh.shard_vec(lm, xs)))
    assert _rel(got[0] + 1j * got[1], ref) < 1e-28


def test_solve_multi_sharded(setup3):
    lat, lm, s3, fs3, ps, ps_sh, xs = setup3
    masses = [0.05, 0.2, 0.5]
    b_e = sf.from_fast(xs[0] + 1j * xs[1], lat)
    out, stats = sh.solve_multi_sharded(
        lm, fs3, b_e, masses,
        SolverParams(r2req=1e-24, maxits=4000))
    for m, x in zip(masses, out):
        r = st.d2ee3(s3, jnp.asarray(x), m) - b_e
        rel = float(linalg.norm2(r)) / float(linalg.norm2(b_e))
        assert rel < 1e-20, (m, rel)


def test_local_extent_guards():
    lat = Lattice((4, 6, 8, 8))
    lm = make_lattice_mesh(lat, rank_geom=(1, 1, 4, 2))  # local Z = 2
    with pytest.raises(ValueError, match="local Z"):
        sh.d2ee3_sharded(lm, None, None, 0.1)


def test_rank_geom_guard():
    lat = Lattice((8, 8, 8, 8))
    lm = make_lattice_mesh(lat, rank_geom=(1, 2, 2, 2))
    with pytest.raises(ValueError, match="shards x/y"):
        sh.d2ee_sharded(lm, None, None, 0.1)


def test_hmc_step_solverparams_mesh_route():
    # SolverParams.mesh (the QEX backend-switch analog) routes the
    # fermion/boson CG solves through the shard_map kernel operators
    # INSIDE the jitted HMC step (custom_vjp forces, while_loop CG):
    # same trajectory as the default route
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)

    lat = Lattice((4, 4, 8, 8))
    lm = make_lattice_mesh(lat, devices=jax.devices()[:4],
                           rank_geom=(1, 1, 2, 2))
    key = jax.random.PRNGKey(31)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])

    def mk(mesh):
        sp = SolverParams(r2req=1e-14, maxits=300, restarts=2, mesh=mesh)
        return LatticeFieldTheory(
            lat, GaugeActionSpec(ga.wilson(5.5), steps=4, scheme="2MN"),
            fermions=[FermionSpec("fermion", 0.5, steps=2, scheme="2MN",
                                  smeared=False),
                      FermionSpec("boson", 0.8, steps=2, scheme="2MN",
                                  smeared=False)],
            smear=None, bc="pppa", solver_params=sp, tau=0.2)

    k = jax.random.PRNGKey(6)
    u1a, sta = jax.jit(lambda kk, uu: mk(None).hmc_step(kk, uu))(k, u)
    u1b, stb = jax.jit(lambda kk, uu: mk(lm).hmc_step(kk, uu))(k, u)
    assert float(stb.dH) == pytest.approx(float(sta.dH), abs=1e-7)
    dev = float(linalg.norm2(jnp.asarray(u1b) - u1a))
    assert dev < 1e-12 * float(linalg.norm2(u1a)), dev


def test_fast3_ops_mesh_route(setup3):
    # stag_hmc._fast3_ops(mesh=...) returns the sharded 16-term kernel
    # operators (the HISQ action/multishift hot ops under a mesh)
    from qex_tpu.physics.stag_hmc import _fast3_ops

    lat, lm, s3, fs3, ps, ps_sh, xs = setup3
    v = xs[0] + 1j * xs[1]
    ee0, dd0 = _fast3_ops(fs3)
    ee1, dd1 = _fast3_ops(fs3, lm)
    a = jax.jit(lambda w: ee1(w, 0.1))(v)
    assert _rel(a, ee0(v, 0.1)) < 1e-28
    b = jax.jit(dd1)(v)
    assert _rel(b, dd0(v)) < 1e-28
