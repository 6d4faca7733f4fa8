"""staghmc_spv deck-key parity (VERDICT.md item 5): every parsed solver
/check key changes behavior observably.

Reference: f_tol/f_maxits force-solver tolerance
(staghmc_spv_init_and_io.nim:482), rev_check reversibility runs
(staghmc_spv.nim:1091,1243-1245), check_solvers per-trajectory solver
stats (staghmc_spv.nim:1066-1090)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.physics import stag_hmc
from qex_tpu.solvers.base import SolverParams

DT = jnp.complex128


@pytest.fixture(scope="module")
def uphi():
    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(3)
    u = jnp.stack([
        group.random_su(jax.random.fold_in(key, i), lat.dims, lat.nc, DT)
        for i in range(lat.nd)])
    ferm = stag_hmc.StagFermion(lat, 0.3, params=SolverParams(
        r2req=1e-14, maxits=500, restarts=2))
    phi = ferm.heatbath(jax.random.fold_in(key, 9), u)
    return lat, u, phi


def test_force_params_change_forces_not_values(uphi):
    lat, u, phi = uphi
    tight = SolverParams(r2req=1e-14, maxits=500, restarts=2)
    loose = SolverParams(r2req=1e-4, maxits=500, restarts=1)
    act_t = stag_hmc.make_quad_inv_action(lat, "pppa", 0.3, tight, tight)
    act_l = stag_hmc.make_quad_inv_action(lat, "pppa", 0.3, tight, loose)
    # primal path (Hamiltonian values) identical: both solve at a_tol
    vt = float(jax.jit(act_t)(u, phi))
    vl = float(jax.jit(act_l)(u, phi))
    assert vt == pytest.approx(vl, rel=1e-12)
    # differentiation path: loose f_tol gives a DIFFERENT (approximate)
    # force -- proving f_tol reaches the force solves
    gt = jax.jit(jax.grad(lambda uu: act_t(uu, phi)))(u)
    gl = jax.jit(jax.grad(lambda uu: act_l(uu, phi)))(u)
    diff = float(linalg.norm2(gt - gl)) / float(linalg.norm2(gt))
    assert 1e-16 < diff < 1e-2, diff


def test_reverse_check_small(uphi):
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)
    lat, u, _ = uphi
    theory = LatticeFieldTheory(
        lat, GaugeActionSpec(ga.wilson(5.2), steps=6, scheme="2MN"),
        fermions=[FermionSpec("fermion", 0.4, steps=3, scheme="2MN",
                              smeared=False)],
        smear=None, bc="pppa",
        solver_params=SolverParams(r2req=1e-16, maxits=500, restarts=2),
        tau=0.4)
    rev = jax.jit(theory.reverse_check)(jax.random.PRNGKey(1), u)
    assert abs(float(rev["dH_rev"])) < 1e-8
    assert float(rev["u_dev2"]) < 1e-16
    assert abs(float(rev["dH_fwd"])) > 1e-8  # forward dH is non-trivial


def test_solver_report(uphi):
    from qex_tpu.gauge import action as ga
    from qex_tpu.mcmc import (FermionSpec, GaugeActionSpec,
                              LatticeFieldTheory)
    lat, u, _ = uphi
    theory = LatticeFieldTheory(
        lat, GaugeActionSpec(ga.wilson(5.2), steps=4, scheme="2MN"),
        fermions=[FermionSpec("fermion", 0.4, steps=2, scheme="2MN",
                              smeared=False),
                  FermionSpec("boson", 0.8, steps=2, scheme="2MN",
                              smeared=False)],
        smear=None, bc="pppa",
        solver_params=SolverParams(r2req=1e-12, maxits=500, restarts=2),
        tau=0.2)
    rep = jax.jit(theory.solver_report)(jax.random.PRNGKey(2), u)
    # fermion has a solve to verify; PV boson has none
    assert len(rep) == 1
    (name, (its, rel)), = rep.items()
    assert name.startswith("fermion")
    assert int(its) > 0
    assert float(rel) < 1e-10


@pytest.mark.slow
def test_app_emits_check_lines(tmp_path):
    import os
    cmd = [sys.executable, "-m", "qex_tpu.apps.staghmc_spv", "--cpu",
           "--ntraj", "1", "-ns=4", "-nt=4", "-beta=5.0", "-tau=0.2",
           "-g_steps=4", "-f_steps=2", "-nf=4", "-mass=0.5",
           "-num_pv=0", "-gauge_smearing=none", "-matter_smearing=none",
           "-start=hot", "-no_metropolis_until=0", "-a_tol=1e-12",
           "-f_tol=1e-8", "-check_solvers=1", "-rev_check_freq=1"]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                       cwd="/root/repo", env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SOLVER fermion" in r.stdout, r.stdout
    assert "Reversed H:" in r.stdout, r.stdout
    assert "REVCHECK" in r.stdout, r.stdout


@pytest.mark.slow
def test_app_rank_geom_sharded_matches(tmp_path):
    # the rank_geom deck key (QEX -rankgeom:, layoutX.nim:83): the
    # sharded chain reproduces the single-device chain measurement
    # lines (GSPMD equality at app level, docs/MULTICHIP.md)
    import os
    base = [sys.executable, "-m", "qex_tpu.apps.staghmc_spv", "--cpu",
            "--ntraj", "2", "-ns=4", "-nt=8", "-beta=5.0", "-tau=0.3",
            "-g_steps=4", "-f_steps=2", "-nf=4", "-mass=0.5",
            "-num_pv=0", "-gauge_smearing=none",
            "-matter_smearing=none", "-start=hot",
            "-no_metropolis_until=0", "-a_tol=1e-16", "-f_tol=1e-12"]
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo",
               JAX_ENABLE_X64="1",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")

    def run(extra):
        r = subprocess.run(base + extra, capture_output=True, text=True,
                           timeout=900, cwd="/root/repo", env=env)
        assert r.returncode == 0, r.stderr[-2000:]
        return [ln for ln in r.stdout.splitlines()
                if ln.startswith(("MEASplaq ", "Begin H", "End H"))]

    ref = run([])
    shd = run(["-rank_geom=1,1,2,2"])
    assert len(ref) == 6 and len(shd) == 6
    for a, b in zip(ref, shd):
        ta, tb = a.split(), b.split()
        assert ta[0] == tb[0]
        va, vb = float(ta[-1]), float(tb[-1])
        assert va == pytest.approx(vb, rel=1e-8, abs=1e-10), (a, b)
