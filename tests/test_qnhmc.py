"""Quasi-Newton preconditioned HMC (hmc/qnhmc.py) tests.

Reference program: src/examples/puregauge2du1qn.nim (ensemble LBFGS
mass matrix, sqrt-free momentum sampling, maximal-tree gauge fixing).
"""

import jax
import jax.numpy as jnp
import numpy as np

from qex_tpu.hmc import qnhmc
from qex_tpu.models import u1

SHAPE = (2, 4, 4)
NDOF = 2 * 4 * 4


def _make_state(m_pairs=5, m_buf=8, seed=0):
    """Pairs from a known SPD quadratic model f = A x so y = A s."""
    key = jax.random.PRNGKey(seed)
    ka, kx = jax.random.split(key)
    r = jax.random.normal(ka, (NDOF, NDOF))
    a_mat = r @ r.T / NDOF + 0.5 * jnp.eye(NDOF)

    def f(x):
        return (a_mat @ x.ravel()).reshape(SHAPE)

    st = qnhmc.qn_init(m_buf, SHAPE, h0=0.7)
    xs = jax.random.normal(kx, (m_pairs + 1,) + SHAPE)
    for i in range(m_pairs):
        st = qnhmc.qn_add(st, xs[i], f(xs[i]), xs[i + 1], f(xs[i + 1]))
    return st, a_mat


def _dense(op, n=NDOF):
    cols = [np.asarray(op(jnp.zeros(SHAPE).ravel().at[i].set(1.0)
                          .reshape(SHAPE))).ravel() for i in range(n)]
    return np.stack(cols, 1)


def test_minv_inverts_m():
    st, _ = _make_state()
    ops = qnhmc.qn_prep(st)
    v = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
    w = ops.apply_minv(ops.apply_m(v))
    np.testing.assert_allclose(np.asarray(w), np.asarray(v),
                               rtol=1e-9, atol=1e-9)


def test_secant_condition():
    """DFP: M s = y for the newest pair."""
    st, _ = _make_state()
    ops = qnhmc.qn_prep(st)
    s_new, y_new = ops.s[-1], ops.y[-1]
    np.testing.assert_allclose(np.asarray(ops.apply_m(s_new)),
                               np.asarray(y_new), rtol=1e-8,
                               atol=1e-10)


def test_mass_spd_and_sampling_covariance():
    """Dense M is SPD and the sqrt-free sampler's exact covariance
    L L^T equals M (L from the jacobian of the affine noise map)."""
    st, _ = _make_state()
    ops = qnhmc.qn_prep(st)
    m_dense = _dense(ops.apply_m)
    np.testing.assert_allclose(m_dense, m_dense.T, atol=1e-10)
    evals = np.linalg.eigvalsh(m_dense)
    assert evals.min() > 0

    mbuf = st.m

    def push(flat):
        q = (jnp.sqrt(ops.h0) * flat[:NDOF]).reshape(SHAPE)
        return ops.push_noise(q, flat[NDOF:]).ravel()

    lmat = np.asarray(jax.jacobian(push)(jnp.zeros(NDOF + mbuf)))
    np.testing.assert_allclose(lmat @ lmat.T, m_dense, rtol=1e-8,
                               atol=1e-10)


def test_invalid_pairs_are_identity():
    """Empty buffer => M = h0 I; negative-curvature pairs masked."""
    st = qnhmc.qn_init(4, SHAPE, h0=2.0)
    ops = qnhmc.qn_prep(st)
    v = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    np.testing.assert_allclose(np.asarray(ops.apply_m(v)),
                               2.0 * np.asarray(v), rtol=1e-12)
    # a pair with y.s < 0 must be rejected
    x0 = jnp.zeros(SHAPE)
    x1 = jnp.ones(SHAPE)
    st = qnhmc.qn_add(st, x0, x1, x1, x0)   # s=1, y=-1 => ys<0
    assert not bool(st.valid[0])


def test_qn_hmc_u1_exactness_and_gfix():
    """QN-HMC on 2D U(1): dH small, tree links frozen under gfix,
    and the chain's plaquette matches the I1/I0 oracle."""
    from scipy.special import iv
    beta, L = 1.0, 6
    th = u1.random_field(jax.random.PRNGKey(8), (2, L, L))
    tree = u1.max_tree_mask((L, L))

    def act(t):
        return u1.action(t, beta)

    grad = jax.grad(act)

    # streams of plain HMC to build pairs (tree-masked forces)
    def mgrad(t):
        return jnp.where(tree, 0.0, grad(t))

    st = qnhmc.qn_init(6, th.shape, h0=1.0)
    xs = [th]
    for i in range(7):
        x2, _ = u1.hmc_step(jax.random.fold_in(jax.random.PRNGKey(9),
                                               i), xs[-1], beta,
                            tau=1.0, steps=8, gfix=True)
        xs.append(x2)
    for i in range(6):
        st = qnhmc.qn_add(st, xs[i], mgrad(xs[i]), xs[i + 1],
                          mgrad(xs[i + 1]), yscale=1.0 / (2 * beta))
    ops = qnhmc.qn_prep(st)

    step = jax.jit(lambda k, t: qnhmc.qn_hmc_step(
        k, t, ops, act, grad, tau=1.0, steps=10, mask=tree))
    x = xs[-1]
    vals, acc = [], 0
    for it in range(60):
        x, stats = step(jax.random.fold_in(jax.random.PRNGKey(11),
                                           it), x)
        acc += int(stats["accept"])
        assert np.isfinite(float(stats["dH"]))
        if it >= 15:
            vals.append(float(jnp.real(u1.plaquette(x))))
    # frozen tree links
    np.testing.assert_allclose(np.asarray(x)[np.asarray(tree)],
                               np.asarray(xs[-1])[np.asarray(tree)])
    assert acc / 60 > 0.6
    exact = iv(1, beta) / iv(0, beta)
    assert abs(np.mean(vals) - exact) < 0.06, (np.mean(vals), exact)
