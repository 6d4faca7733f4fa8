"""Observable tests: meson correlators vs structure/symmetry oracles,
stochastic condensate vs dense-matrix trace, resampling statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.observables import condensate, mesons
from qex_tpu.ops import group, linalg
from qex_tpu.physics import staggered as st
from qex_tpu.solvers.base import SolverParams
from qex_tpu.utils import resample

DT = jnp.complex128
SP = SolverParams(r2req=1e-20, maxits=4000, restarts=2)


@pytest.fixture
def lat():
    return Lattice((4, 4, 4, 8))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(42)
    return jnp.stack([
        linalg.expm(0.4 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])


def test_pion_correlator_properties(lat, u):
    c = mesons.stag_meson_correlators(lat, u, m=0.5, bc="pppp",
                                      channels=("pion5", "rho_x"),
                                      params=SP)
    pion = np.asarray(c["pion5"])
    assert pion.shape == (lat.dims[-1],)
    # positivity of the Goldstone correlator
    assert np.all(pion > 0)
    # decay away from the source
    assert pion[0] > pion[1] > pion[2]
    # exact time-reflection symmetry holds on a t-reflection-symmetric
    # configuration: the free field (per-config symmetry is not exact
    # on a random gauge background)
    uu = group.unit_gauge(lat, DT)
    cf = mesons.stag_meson_correlators(lat, uu, m=0.5, bc="pppp",
                                       channels=("pion5",), params=SP)
    pf = np.asarray(cf["pion5"])
    T = lat.dims[-1]
    for t in range(1, T // 2):
        assert pf[t] == pytest.approx(pf[T - t], rel=1e-8)


def test_pbp_vs_dense_trace():
    """Stochastic pbp (many noise vectors) against the exact dense
    tr D^{-1} on a tiny lattice."""
    lat = Lattice((2, 2, 2, 4))
    key = jax.random.PRNGKey(7)
    u = jnp.stack([
        linalg.expm(0.4 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    m = 0.7
    g = st.phase_links(lat, u, bc="pppp")
    n = lat.nc * lat.volume
    cols = []
    for j in range(n):
        e = jnp.zeros((n,), DT).at[j].set(1.0).reshape(lat.vector_shape())
        cols.append(np.asarray(st.d_full(lat, g, e, m)).reshape(n))
    dmat = np.stack(cols, axis=1)
    exact = np.real(np.trace(np.linalg.inv(dmat))) / lat.volume
    est = float(condensate.pbp_staggered(
        jax.random.PRNGKey(3), lat, u, m, bc="pppp", noise="z4",
        n_noise=24, params=SP))
    # stochastic error ~ 1/sqrt(24 * V)
    assert abs(est - exact) < 0.1 * abs(exact), (est, exact)


def test_pbp_dilution_reduces_variance(lat, u):
    """eo dilution estimates must agree with undiluted within errors
    (same expectation)."""
    a = float(condensate.pbp_staggered(jax.random.PRNGKey(1), lat, u,
                                       0.6, noise="z4", n_noise=2,
                                       dilution="eo", params=SP))
    b = float(condensate.pbp_staggered(jax.random.PRNGKey(2), lat, u,
                                       0.6, noise="z4", n_noise=4,
                                       dilution="none", params=SP))
    assert abs(a - b) < 0.3 * max(abs(a), abs(b))


def test_dilution_masks_partition(lat):
    for kind in ("none", "eo", "corner3d"):
        ms = condensate.dilution_masks(lat, kind)
        s = sum(np.asarray(m) for m in ms)
        assert np.all(s == 1.0), kind


def test_jackknife_mean_matches_stderr():
    rng = np.random.default_rng(0)
    d = rng.normal(10.0, 2.0, 400)
    est, err = resample.jackknife(d)
    assert est == pytest.approx(d.mean(), abs=1e-10)
    assert err == pytest.approx(d.std(ddof=1) / np.sqrt(len(d)), rel=1e-6)
    best, berr = resample.bootstrap(d, n_samples=500)
    assert berr == pytest.approx(err, rel=0.25)


def test_autocorrelation_time():
    rng = np.random.default_rng(1)
    # AR(1) process with known tau_int = (1+rho)/(2(1-rho))
    rho = 0.8
    n = 20000
    x = np.zeros(n)
    for i in range(1, n):
        x[i] = rho * x[i - 1] + rng.normal()
    tau = resample.autocorrelation_time(x)
    expect = (1 + rho) / (2 * (1 - rho))  # = 4.5
    assert 0.6 * expect < tau < 1.6 * expect, tau
