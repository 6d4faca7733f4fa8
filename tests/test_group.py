"""Group-op and RNG tests (reference tier: tests/base/tsu3.nim,
trngseed.nim)."""

import jax
import jax.numpy as jnp
import numpy as np

from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu import rng as qrng


def test_tah_properties():
    r = np.random.default_rng(3)
    m = jnp.asarray(r.standard_normal((3, 3, 4, 4)) + 1j * r.standard_normal((3, 3, 4, 4)))
    p = group.tah(m)
    # anti-hermitian
    np.testing.assert_allclose(np.asarray(p), -np.asarray(linalg.adj(p)), atol=1e-14)
    # traceless
    np.testing.assert_allclose(np.asarray(linalg.trace(p)), 0.0, atol=1e-13)
    # idempotent
    np.testing.assert_allclose(np.asarray(group.tah(p)), np.asarray(p), atol=1e-14)


def test_random_tah_normalization():
    """K = -1/2 sum retr(p^2) should average (n^2-1)/2 per matrix."""
    key = jax.random.PRNGKey(0)
    shape = (4, 4, 4, 8)
    p = group.random_tah(key, shape, 3, jnp.complex128)
    nmat = int(np.prod(shape))
    k = float(group.kinetic_energy(p)) / nmat
    expect = (3 * 3 - 1) / 2.0  # 4.0
    assert abs(k - expect) < 0.15, k


def test_random_su_is_su(rng):
    key = jax.random.PRNGKey(1)
    u = group.random_su(key, (2, 2), 3, jnp.complex128)
    un = np.moveaxis(np.asarray(u), (0, 1), (-2, -1))
    prod = np.conj(np.swapaxes(un, -1, -2)) @ un
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(un), 1.0, atol=1e-12)


def test_unit_gauge_and_check_su():
    lat = Lattice((4, 4, 4, 4))
    u = group.unit_gauge(lat, jnp.complex128)
    assert u.shape == (4, 3, 3, 4, 4, 4, 4)
    chk = group.check_su(u[0])
    assert float(chk["unitarity_dev2_per_site"]) < 1e-28
    assert float(chk["det_dev2_per_site"]) < 1e-28


def test_lattice_rng_stream_resumes():
    r1 = qrng.LatticeRNG(seed=42)
    a = qrng.gaussian(r1.next_key(), (8,))
    b = qrng.gaussian(r1.next_key(), (8,))
    st = r1.state()
    c = qrng.gaussian(r1.next_key(), (8,))
    r2 = qrng.LatticeRNG.from_state(st)
    c2 = qrng.gaussian(r2.next_key(), (8,))
    np.testing.assert_array_equal(np.asarray(c), np.asarray(c2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_noise_distributions():
    key = jax.random.PRNGKey(7)
    z4 = qrng.z4_noise(key, (1000,), jnp.complex128)
    np.testing.assert_allclose(np.abs(np.asarray(z4)), 1.0, atol=1e-14)
    z2 = qrng.z2_noise(key, (1000,), jnp.complex128)
    assert set(np.unique(np.real(np.asarray(z2)))) <= {-1.0, 1.0}
    u1 = qrng.u1_noise(key, (1000,), jnp.complex128)
    np.testing.assert_allclose(np.abs(np.asarray(u1)), 1.0, atol=1e-12)


def test_plaquette_unit_and_invariance():
    from qex_tpu.gauge import loops
    lat = Lattice((4, 4, 4, 4))
    u = group.unit_gauge(lat, jnp.complex128)
    assert abs(float(loops.plaquette(lat, u)) - 1.0) < 1e-13
    # gauge invariance: random gauge transform leaves plaquette invariant
    key = jax.random.PRNGKey(5)
    u = group.random_su(key, lat.dims, 3, jnp.complex128).reshape(
        (3, 3) + lat.dims)[None].repeat(4, axis=0)
    # that's a degenerate field (same per mu) - use proper random gauge
    k1, k2 = jax.random.split(key)
    u = jnp.stack([group.random_su(jax.random.fold_in(k1, mu), lat.dims, 3, jnp.complex128)
                   for mu in range(4)])
    p0 = float(loops.plaquette(lat, u))
    g = group.random_su(k2, lat.dims, 3, jnp.complex128)
    from qex_tpu.ops.shifts import shift
    u_t = jnp.stack([
        linalg.mul(linalg.mul(g, u[mu]), linalg.adj(shift(g, mu, +1, 4)))
        for mu in range(4)
    ])
    p1 = float(loops.plaquette(lat, u_t))
    assert abs(p0 - p1) < 1e-12
    # random gauge plaquette is small but not 1
    assert abs(p0) < 0.5
