"""Fast-layout staggered operator must be numerically identical to the
canonical one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, group, linalg
from qex_tpu.physics import stag_fast as sf
from qex_tpu.physics import staggered as st

DT = jnp.complex128


@pytest.fixture
def lat():
    # deliberately anisotropic to catch axis mixups
    return Lattice((4, 6, 2, 8))


@pytest.fixture
def setup(lat):
    key = jax.random.PRNGKey(13)
    u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                   lat.nc, DT) for i in range(lat.nd)])
    x = (jax.random.normal(key, lat.vector_shape())
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  lat.vector_shape())).astype(DT)
    return u, x


def test_layout_roundtrip(lat, setup):
    u, x = setup
    xe, xo = eo.pack(x, lat.nd)
    f = sf.to_fast(xe, lat)
    assert f.shape == (lat.nc, lat.dims[3] // 2, lat.dims[2],
                       lat.dims[1] * lat.dims[0])
    back = sf.from_fast(f, lat)
    assert float(linalg.norm2(back - xe)) == 0.0


@pytest.mark.parametrize("mu", [0, 1, 2, 3])
@pytest.mark.parametrize("sign", [1, -1])
@pytest.mark.parametrize("parity", [0, 1])
def test_shift_matches_canonical(lat, setup, mu, sign, parity):
    u, x = setup
    xe, xo = eo.pack(x, lat.nd)
    src = xe if parity == 1 else xo  # source parity = 1 - parity_out
    src = xo if parity == 0 else xe
    # canonical: source lives on parity 1-parity_out
    src = eo.pack(x, lat.nd)[1 - parity]
    ref = eo.shift_eo(src, mu, sign, parity, lat.nd)
    fast = sf.shift_fast(sf.to_fast(src, lat), mu, sign, parity, lat)
    assert float(linalg.norm2(sf.from_fast(fast, lat) - ref)) == 0.0


def test_dslash_and_d2ee_match(lat, setup):
    u, x = setup
    s = st.new_stag_eo(lat, u, bc="pppa")
    fs = sf.new_fast(s)
    xe, xo = eo.pack(x, lat.nd)
    ref = st.dslash_eo(s, xe, parity_out=1)
    fast = sf.from_fast(sf.dslash_fast(fs, sf.to_fast(xe, lat), 1), lat)
    assert float(linalg.norm2(fast - ref)) < 1e-24 * float(
        linalg.norm2(ref))
    ref2 = st.d2ee(s, xe, 0.23)
    fast2 = sf.from_fast(sf.d2ee_fast(fs, sf.to_fast(xe, lat), 0.23),
                         lat)
    assert float(linalg.norm2(fast2 - ref2)) < 1e-24 * float(
        linalg.norm2(ref2))


def test_fast3_matches_canonical():
    """Fast-layout fat+naik operator is bit-identical to the canonical
    eo implementation (dslash3, d2ee3, d2dd3; incl. dist-3 t shifts)."""
    import jax
    import jax.numpy as jnp
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import staggered as st
    from qex_tpu.physics import stag_fast as sf

    lat = Lattice((8, 4, 4, 8))
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 9)
    fat = jnp.stack([linalg.expm(
        0.5 * group.random_tah(ks[i], lat.dims, lat.nc, jnp.complex64))
        for i in range(4)])
    lng = jnp.stack([linalg.expm(
        0.5 * group.random_tah(ks[4 + i], lat.dims, lat.nc,
                               jnp.complex64)) for i in range(4)])
    s3 = st.new_stag3_eo(lat, fat, lng)
    f3 = sf.new_fast3(s3)
    x = jax.random.normal(ks[8], (3, 8, 4, 4, 4),
                          jnp.float32).astype(jnp.complex64)
    xf = sf.to_fast(x, lat)
    for par in (0, 1):
        ref = st.dslash3_eo(s3, x, par)
        got = sf.from_fast(sf.dslash3_fast(f3, xf, par), lat)
        assert float(jnp.sum(jnp.abs(got - ref) ** 2)) == 0.0
    ref = st.d2ee3(s3, x, 0.2)
    got = sf.from_fast(sf.d2ee3_fast(f3, xf, 0.2), lat)
    assert float(jnp.sum(jnp.abs(got - ref) ** 2)) == 0.0
    ref = st.d2dd3(s3, x, parity=0)
    got = sf.from_fast(sf.d2dd3_fast(f3, xf, 0), lat)
    assert float(jnp.sum(jnp.abs(got - ref) ** 2)) == 0.0
