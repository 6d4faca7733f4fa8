"""shard_map + ppermute halo exchange vs single-device reference, on
the virtual 8-device CPU mesh (the reference's mpiexec -n 2 analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.ops.shifts import shift
from qex_tpu.parallel import make_lattice_mesh, shard_field
from qex_tpu.parallel.halo import (dslash_full_sharded, norm2_sharded,
                                   shift_halo)
from qex_tpu.physics import staggered as st

DT = jnp.complex64


@pytest.fixture
def lm():
    lat = Lattice((8, 8, 8, 8))
    return make_lattice_mesh(lat)


@pytest.fixture
def fields(lm):
    lat = lm.lat
    key = jax.random.PRNGKey(2)
    u = jnp.stack([
        linalg.expm(0.5 * group.random_tah(jax.random.fold_in(key, i),
                                           lat.dims, lat.nc, DT))
        for i in range(lat.nd)])
    x = (jax.random.normal(key, lat.vector_shape(), jnp.float32)
         + 0j).astype(DT)
    return u, x


def test_mesh_uses_8_devices(lm):
    assert np.prod(lm.rank_geom) == 8


@pytest.mark.parametrize("mu", [0, 1, 2, 3])
@pytest.mark.parametrize("sign", [1, -1])
def test_shift_halo_matches_roll(lm, fields, mu, sign):
    from jax import shard_map
    from qex_tpu.parallel.mesh import field_spec
    u, x = fields
    lat = lm.lat
    names = lm.mesh.axis_names
    sizes = [lm.mesh.shape[a] for a in names]
    spec = field_spec(lm, 1)
    fn = shard_map(
        lambda v: shift_halo(v, mu, sign, lat.nd, names[mu],
                             sizes[mu]),
        mesh=lm.mesh, in_specs=(spec,), out_specs=spec)
    got = fn(shard_field(lm, x, 1))
    ref = shift(x, mu, sign, lat.nd)
    assert float(linalg.norm2(jnp.asarray(got) - ref)) == 0.0


def test_dslash_sharded_matches_reference(lm, fields):
    u, x = fields
    lat = lm.lat
    g = st.phase_links(lat, u, bc="pppa")
    ref = st.dslash_full(lat, g, x)
    got = dslash_full_sharded(lm, shard_field(lm, g, 3),
                              shard_field(lm, x, 1))
    dev = float(linalg.norm2(jnp.asarray(got) - ref))
    assert dev < 1e-10 * float(linalg.norm2(ref)), dev


def test_norm2_sharded(lm, fields):
    u, x = fields
    got = float(norm2_sharded(lm, shard_field(lm, x, 1)))
    ref = float(linalg.norm2(x))
    assert got == pytest.approx(ref, rel=1e-6)
