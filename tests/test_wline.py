"""Path-engine Wilson lines vs explicit shift products (VERDICT.md
item 10; reference gaugeUtils.nim:405-1103 path-tree wline)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.gauge import loops
from qex_tpu.gauge.wline import PathEngine, path_displacement
from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.ops.shifts import shift

DT = jnp.complex128


@pytest.fixture(scope="module")
def setup():
    lat = Lattice((4, 4, 4, 4))
    key = jax.random.PRNGKey(17)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    return lat, u


def _line_naive(lat, u, path):
    """Left-to-right product of single-link factors via explicit
    shifts -- the oracle."""
    nd = lat.nd
    n = lat.nc
    ident = jnp.eye(n, dtype=u.dtype).reshape((n, n) + (1,) * nd)
    m = jnp.broadcast_to(ident, (n, n) + lat.dims)
    for step in reversed(path):
        mu = abs(step) - 1
        if step > 0:
            m = linalg.mul(u[mu], shift(m, mu, +1, nd))
        else:
            m = shift(linalg.mul_an(u[mu], m), mu, -1, nd)
    return m


@pytest.mark.parametrize("path", [
    (1,), (-3,), (1, 2, -1, -2),                      # plaquette
    (1, 1, 2, -1, -1, -2),                            # 2x1 rect
    (4, 4, 4, 4),                                     # open t-line
    (1, 2, 3, -1, -2, -3),                            # 3d chair
    (2, -4, 2, 1, -2, 4, -2, -1),                     # knotted closed
])
def test_engine_matches_naive(setup, path):
    lat, u = setup
    eng = PathEngine(lat, u)
    got = eng.line(path)
    ref = _line_naive(lat, u, path)
    dev = float(linalg.norm2(got - ref))
    assert dev < 1e-24 * max(1.0, float(linalg.norm2(ref))), dev


def test_plaquette_path_equals_plaq(setup):
    lat, u = setup
    eng = PathEngine(lat, u)
    p_eng = float(eng.loop_trace((1, 2, -1, -2)))
    p_ref = float(jnp.sum(linalg.re_trace(
        loops.plaq_field(u, 0, 1, lat.nd))) / (lat.nc * lat.volume))
    assert p_eng == pytest.approx(p_ref, rel=1e-13)


def test_wilson_loops_unit_gauge(setup):
    lat, _ = setup
    uu = group.unit_gauge(lat, DT)
    eng = PathEngine(lat, uu)
    for (r, t) in ((1, 1), (2, 1), (2, 3)):
        assert float(eng.wilson_loop(0, 3, r, t)) == pytest.approx(1.0)


def test_subpath_reuse(setup):
    """Loop families share cached segments: building all 6 plaquette
    orientations costs far fewer distinct segments than 6x the
    single-loop cost."""
    lat, u = setup
    eng = PathEngine(lat, u)
    for mu in range(4):
        for nu in range(mu + 1, 4):
            eng.clover_leaves(mu, nu)
    segs = eng.stats()["segments"]
    # 24 leaf paths x 3 sub-segments each would be ~96 without reuse;
    # single links (8) + halves are shared
    assert segs < 70, segs


def test_fmunu_engine_consistent(setup):
    """clover_fmunu via the engine equals the same contraction on a
    fresh engine and is anti-hermitian traceless."""
    lat, u = setup
    f = loops.clover_fmunu(u, 0, 2, lat.nd)
    dev = float(linalg.norm2(f + linalg.adj(f)))
    assert dev < 1e-24
    tr = float(jnp.max(jnp.abs(linalg.trace(f))))
    assert tr < 1e-12
    q = float(loops.topo_charge_clover(lat, u))
    assert np.isfinite(q)


def test_displacement():
    assert path_displacement((1, 1, -2, 4), 4) == (2, -1, 0, 1)
