"""Unit tests for site-local linear algebra (reference tier:
tests/base/tsu3.nim, tmatfun.nim)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.ops import linalg


def rand_mat(rng, n=3, batch=(4, 4)):
    m = rng.standard_normal((n, n) + batch) + 1j * rng.standard_normal((n, n) + batch)
    return jnp.asarray(m, jnp.complex128)


def to_np_batched(m):
    """(n, m, *batch) field -> numpy (*batch, n, m) for linalg comparison."""
    return np.moveaxis(np.asarray(m), (0, 1), (-2, -1))


def test_mul_matches_numpy(rng):
    a, b = rand_mat(rng), rand_mat(rng)
    c = linalg.mul(a, b)
    ref = to_np_batched(a) @ to_np_batched(b)
    np.testing.assert_allclose(to_np_batched(c), ref, rtol=1e-12)


def test_mul_variants(rng):
    a, b = rand_mat(rng), rand_mat(rng)
    an = to_np_batched(a)
    bn = to_np_batched(b)
    H = lambda x: np.conj(np.swapaxes(x, -1, -2))
    np.testing.assert_allclose(to_np_batched(linalg.mul_an(a, b)), H(an) @ bn, rtol=1e-12)
    np.testing.assert_allclose(to_np_batched(linalg.mul_na(a, b)), an @ H(bn), rtol=1e-12)
    np.testing.assert_allclose(to_np_batched(linalg.mul_aa(a, b)), H(an) @ H(bn), rtol=1e-12)


def test_mv_and_outer(rng):
    m = rand_mat(rng)
    v = jnp.asarray(rng.standard_normal((3, 4, 4)) + 1j * rng.standard_normal((3, 4, 4)))
    y = linalg.mv(m, v)
    ref = np.einsum("ab...,b...->a...", np.asarray(m), np.asarray(v))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-12)
    o = linalg.outer(v, y)
    ref_o = np.einsum("a...,b...->ab...", np.asarray(v), np.conj(ref))
    np.testing.assert_allclose(np.asarray(o), ref_o, rtol=1e-12)


def test_det_inv(rng):
    m = rand_mat(rng)
    d = linalg.det(m)
    ref_d = np.linalg.det(to_np_batched(m))
    np.testing.assert_allclose(np.asarray(d), ref_d, rtol=1e-10)
    mi = linalg.inv(m)
    prod = to_np_batched(linalg.mul(m, mi))
    ident = np.broadcast_to(np.eye(3), prod.shape)
    np.testing.assert_allclose(prod, ident, atol=1e-9)


def test_expm_vs_scipy(rng):
    from scipy.linalg import expm as sp_expm
    m = 0.3 * rand_mat(rng, batch=(2, 2))
    e = to_np_batched(linalg.expm(m))
    mn = to_np_batched(m)
    for idx in np.ndindex(2, 2):
        np.testing.assert_allclose(e[idx], sp_expm(mn[idx]), rtol=1e-10)


def test_expm_antihermitian_is_unitary(rng):
    from qex_tpu.ops import group
    m = rand_mat(rng)
    p = group.tah(m)
    u = linalg.expm(p)
    un = to_np_batched(u)
    prod = np.conj(np.swapaxes(un, -1, -2)) @ un
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(un), 1.0, atol=1e-10)


def test_rsqrt_phm(rng):
    x = rand_mat(rng)
    h = linalg.mul_an(x, x)  # SPD
    r = linalg.rsqrt_phm(h, iters=20)
    # r @ h @ r == I
    chk = to_np_batched(linalg.mul(linalg.mul(r, h), r))
    np.testing.assert_allclose(chk, np.broadcast_to(np.eye(3), chk.shape), atol=1e-8)


def test_project_u(rng):
    x = rand_mat(rng)
    u = linalg.project_u(x, iters=20)
    un = to_np_batched(u)
    prod = np.conj(np.swapaxes(un, -1, -2)) @ un
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-8)
    # polar projection: U = X (X^dag X)^{-1/2}, check against numpy svd
    xn = to_np_batched(x)
    w, _, vh = np.linalg.svd(xn)
    np.testing.assert_allclose(un, w @ vh, atol=1e-7)


def test_project_su(rng):
    x = rand_mat(rng)
    u = linalg.project_su(x, iters=20)
    un = to_np_batched(u)
    np.testing.assert_allclose(np.linalg.det(un), 1.0, atol=1e-8)
    prod = np.conj(np.swapaxes(un, -1, -2)) @ un
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(3), prod.shape), atol=1e-8)


def test_norms(rng):
    v = jnp.asarray(rng.standard_normal((3, 8)) + 1j * rng.standard_normal((3, 8)))
    w = jnp.asarray(rng.standard_normal((3, 8)) + 1j * rng.standard_normal((3, 8)))
    np.testing.assert_allclose(float(linalg.norm2(v)), np.sum(np.abs(np.asarray(v)) ** 2), rtol=1e-12)
    np.testing.assert_allclose(complex(linalg.dot(v, w)),
                               np.vdot(np.asarray(v), np.asarray(w)), rtol=1e-12)
    np.testing.assert_allclose(float(linalg.redot(v, w)),
                               np.real(np.vdot(np.asarray(v), np.asarray(w))), rtol=1e-12)


def test_sqrtm_db(rng):
    """Denman-Beavers square root: (sqrt m)^2 == m for SPD fields."""
    import jax
    import jax.numpy as jnp
    from qex_tpu.ops import linalg
    dims = (4, 4)
    a = jnp.asarray(rng.normal(size=(3, 3) + dims)
                    + 1j * rng.normal(size=(3, 3) + dims))
    m = linalg.mul_an(a, a) + 0.5 * linalg.eye_like(a)  # SPD
    r = linalg.sqrtm_db(m)
    dev = linalg.norm2(linalg.mul(r, r) - m) / linalg.norm2(m)
    assert float(dev) < 1e-24


def test_logm_inverts_expm(rng):
    """expm(logm(U)) == U for SU(3)-like fields, and logm of exp(p)
    recovers the algebra element p for small p."""
    import jax
    import jax.numpy as jnp
    from qex_tpu.ops import group, linalg
    key = jax.random.PRNGKey(3)
    dims = (4, 4)
    p = 0.3 * group.random_tah(key, dims, 3, jnp.complex128)
    u = linalg.expm(p)
    l = linalg.logm(u)
    assert float(linalg.norm2(l - p)) / float(linalg.norm2(p)) < 1e-18
    back = linalg.expm(l)
    assert float(linalg.norm2(back - u)) / float(linalg.norm2(u)) < 1e-20


def test_project_u_spectral_vjp_matches_ad():
    """The closed-form spectral VJP of project_u (n=3 custom_vjp, the
    QEX projectUDeriv analog) must match AD through the Newton-Schulz
    iterations, including at exactly-degenerate spectra (unitary
    input), and support grad-of-grad (force-gradient integrators)."""
    import jax
    import jax.numpy as jnp
    from qex_tpu.ops import group, linalg

    key = jax.random.PRNGKey(11)
    shape = (3, 3, 4, 4, 2)
    x = (jax.random.normal(key, shape)
         + 1j * jax.random.normal(jax.random.fold_in(key, 1), shape))
    x = 0.3 * x + jnp.eye(3).reshape(3, 3, 1, 1, 1)  # staple-like
    g = (jax.random.normal(jax.random.fold_in(key, 2), shape)
         + 1j * jax.random.normal(jax.random.fold_in(key, 3), shape))

    def loss(fn):
        return lambda xx: jnp.sum(jnp.real(g * fn(xx, 20)))

    v1 = float(loss(linalg._project_u_ns)(x))
    v2 = float(loss(linalg._project_u3)(x))
    assert v1 == v2  # identical forward
    g1 = jax.grad(loss(linalg._project_u_ns))(x)
    g2 = jax.grad(loss(linalg._project_u3))(x)
    dev = float(jnp.linalg.norm(g1 - g2) / jnp.linalg.norm(g1))
    assert dev < 1e-10, dev

    # fully degenerate spectrum: Haar-unitary input (H == I exactly)
    u = group.random_unitary(key, (2, 2, 2), 3, jnp.complex128)
    gs = g[..., :2, :2, :2]
    g1 = jax.grad(lambda xx: jnp.sum(jnp.real(
        gs * linalg._project_u_ns(xx, 20))))(u)
    g2 = jax.grad(lambda xx: jnp.sum(jnp.real(
        gs * linalg._project_u3(xx, 20))))(u)
    dev = float(jnp.linalg.norm(g1 - g2) / jnp.linalg.norm(g1))
    assert dev < 1e-10, dev

    # second derivative through the custom vjp must exist (fg_force)
    hv = jax.grad(lambda xx: jnp.sum(jnp.abs(
        jax.grad(loss(linalg._project_u3))(xx)) ** 2))(x)
    assert bool(jnp.all(jnp.isfinite(hv)))
