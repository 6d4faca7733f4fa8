"""Shift and even-odd packing tests (reference tier: tests/base/tshift.nim,
tmasks.nim)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import eo, shifts


DIMS = (4, 6, 4, 8)


def coord_field(dims):
    """Unique real value per site: lexicographic index."""
    v = np.arange(np.prod(dims)).reshape(dims).astype(np.float64)
    return jnp.asarray(v)


@pytest.mark.parametrize("mu", range(4))
@pytest.mark.parametrize("sign", [+1, -1])
@pytest.mark.parametrize("dist", [1, 2, 3])
def test_shift_full(mu, sign, dist):
    f = coord_field(DIMS)
    s = shifts.shift(f, mu, sign, nd=4, dist=dist)
    ref = np.roll(np.asarray(f), -sign * dist, axis=mu)
    np.testing.assert_array_equal(np.asarray(s), ref)


def test_pack_unpack_roundtrip():
    f = coord_field(DIMS)
    e, o = eo.pack(f, nd=4)
    assert e.shape == DIMS[:-1] + (DIMS[-1] // 2,)
    back = eo.unpack(e, o, nd=4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(f))


def test_pack_parity_membership():
    f = coord_field(DIMS)
    e, o = eo.pack(f, nd=4)
    en = np.asarray(e)
    # every value in the even array must come from an even-parity site
    fn = np.asarray(f)
    for x, y, z, th in itertools.product(*(range(d) for d in en.shape)):
        val = en[x, y, z, th]
        # recover site coords from value (value = lex index)
        idx = np.unravel_index(int(val), DIMS)
        assert sum(idx) % 2 == 0
        o_idx = np.unravel_index(int(np.asarray(o)[x, y, z, th]), DIMS)
        assert sum(o_idx) % 2 == 1


@pytest.mark.parametrize("mu", range(4))
@pytest.mark.parametrize("sign", [+1, -1])
@pytest.mark.parametrize("dist", [1, 2, 3])
def test_shift_eo_matches_full(mu, sign, dist):
    """Packed shift == pack(full shift)."""
    f = coord_field(DIMS)
    fs = shifts.shift(f, mu, sign, nd=4, dist=dist)
    fs_e, fs_o = eo.pack(fs, nd=4)
    e, o = eo.pack(f, nd=4)
    src_for_even = (e, o)[dist % 2]       # odd dist: source is odd array
    src_for_odd = (o, e)[dist % 2]
    got_e = eo.shift_eo(src_for_even, mu, sign, parity_out=0, nd=4, dist=dist)
    got_o = eo.shift_eo(src_for_odd, mu, sign, parity_out=1, nd=4, dist=dist)
    np.testing.assert_array_equal(np.asarray(got_e), np.asarray(fs_e))
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(fs_o))


def test_shift_with_site_axes():
    """Shifts act only on trailing lattice axes of tensor fields."""
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((3, 3) + DIMS))
    s = shifts.shift(f, 1, +1, nd=4)
    ref = np.roll(np.asarray(f), -1, axis=3)  # axis 1 of lattice = array axis 3
    np.testing.assert_array_equal(np.asarray(s), ref)


def test_transport_unit_gauge():
    from qex_tpu.ops import group
    lat = Lattice(DIMS)
    u = group.unit_gauge(lat, jnp.complex128)
    v = jnp.asarray(np.random.default_rng(1).standard_normal((3,) + DIMS)).astype(jnp.complex128)
    t = shifts.transport(u[0], v, 0, +1, nd=4)
    np.testing.assert_allclose(np.asarray(t), np.roll(np.asarray(v), -1, axis=1), rtol=1e-14)
    t2 = shifts.transport(u[0], v, 0, -1, nd=4)
    np.testing.assert_allclose(np.asarray(t2), np.roll(np.asarray(v), 1, axis=1), rtol=1e-14)
