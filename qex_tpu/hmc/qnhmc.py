"""Ensemble quasi-Newton (L-BFGS-style) preconditioned HMC.

TPU-native replacement for QEX's src/examples/puregauge2du1qn.nim
(ring-buffer LBFGS over an ensemble of streams :130-432, Hessian-
preconditioned momenta/updates :770-830, stream-sweep MCMC :951-1050).

Design (principled rebuild, not a port): the HMC mass matrix M is the
DFP direct-Hessian approximation built from difference pairs
(s_k = x_{k+1} - x_k, y_k = f_{k+1} - f_k) collected across an
ensemble of parallel streams sampling the same distribution.  The DFP
update has the self-dual product form

    M_k = W_k^T M_{k-1} W_k + rho_k y_k y_k^T,
    W_k = I - rho_k s_k y_k^T,    rho_k = 1/(y_k . s_k),

which yields three exact O(m) algorithms with no explicit matrices:

* ``apply_m``   — down/up sweep of rank-1 ops (the recursion itself).
* ``apply_minv`` — DFP inverse-Hessian expansion
    H_k = H_{k-1} + rho_k s_k s_k^T - c_k w_k w_k^T,
    w_k = H_{k-1} y_k, c_k = 1/(y_k . w_k)
  with the w_k prepared once per trajectory (O(m^2) dots; the
  reference's ``prep``).
* ``sample``    — exact N(0, M) draws WITHOUT a matrix square root:
    q_k = W_k^T q_{k-1} + sqrt(rho_k) z_k y_k,  z_k ~ N(0,1)
  reproduces the covariance recursion term by term (the role of the
  reference's A/sqrtH factor chain :328-410).

Momenta are refreshed as p ~ N(0, M); kinetic energy p.M^{-1}p/2;
position update x += dt M^{-1} p.  M is frozen during a trajectory, so
detailed balance holds for ANY pair content — pair quality affects
only acceptance and mixing, never correctness.

Pairs with y.s <= cutoff are masked out (indefinite-curvature guard,
reference ``qnyscut``); ``yscale`` rescales y (Hessian scale,
reference ``qnyscale``); ``h0`` is the base diagonal.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("s", "y", "valid", "pos"),
                   meta_fields=("h0",))
@dataclasses.dataclass(frozen=True)
class QNState:
    """Ring buffer of difference pairs (stacked leading axis m)."""

    s: jax.Array          # (m, *field)
    y: jax.Array          # (m, *field) — already yscale-scaled
    valid: jax.Array      # (m,) bool
    pos: jax.Array        # next write slot
    h0: float = 1.0

    @property
    def m(self) -> int:
        return self.s.shape[0]


def qn_init(m: int, field_shape, h0: float = 1.0,
            dtype=jnp.float64) -> QNState:
    z = jnp.zeros((m,) + tuple(field_shape), dtype)
    return QNState(z, z, jnp.zeros((m,), bool),
                   jnp.zeros((), jnp.int32), h0)


def qn_add(st: QNState, x_prev, f_prev, x_new, f_new,
           yscale: float = 1.0, cutoff: float = 0.0) -> QNState:
    """Push the pair (s, y) = (x_new - x_prev, yscale*(f_new - f_prev))
    into the ring buffer; pairs with y.s <= cutoff are stored invalid
    (puregauge2du1qn.nim ``add`` :231-282 with the ``prep`` ys
    cutoff)."""
    s = x_new - x_prev
    y = yscale * (f_new - f_prev)
    ys = jnp.sum(s * y)
    ok = ys > cutoff
    i = st.pos % st.m
    return QNState(st.s.at[i].set(s), st.y.at[i].set(y),
                   st.valid.at[i].set(ok), st.pos + 1, st.h0)


def qn_set(st: QNState, slot: int, x_prev, f_prev, x_new, f_new,
           yscale: float = 1.0, cutoff: float = 0.0) -> QNState:
    """Store the pair in an explicit ring slot (the reference keys
    pair i by stream index: 'item k has the difference between k and
    k+1', puregauge2du1qn.nim:434-436)."""
    s = x_new - x_prev
    y = yscale * (f_new - f_prev)
    ys = jnp.sum(s * y)
    ok = ys > cutoff
    i = slot % st.m
    return QNState(st.s.at[i].set(s), st.y.at[i].set(y),
                   st.valid.at[i].set(ok), st.pos, st.h0)


def _dots(a, b):
    return jnp.sum(a * b, axis=tuple(range(1, a.ndim)))


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=("s", "y", "w", "rho", "c"),
                   meta_fields=("h0",))
@dataclasses.dataclass(frozen=True)
class QNOps:
    """Prepared per-trajectory operator set."""

    s: jax.Array
    y: jax.Array
    w: jax.Array          # w_k = H_{k-1} y_k
    rho: jax.Array        # masked 1/(y.s)
    c: jax.Array          # masked 1/(y.w)
    h0: float

    def apply_minv(self, v: jax.Array) -> jax.Array:
        """M^{-1} v (DFP inverse-Hessian expansion)."""
        sv = _dots(self.s, jnp.broadcast_to(v, self.s.shape))
        wv = _dots(self.w, jnp.broadcast_to(v, self.w.shape))
        corr = jnp.tensordot(self.rho * sv, self.s, axes=1) \
            - jnp.tensordot(self.c * wv, self.w, axes=1)
        return v / self.h0 + corr

    def apply_m(self, v: jax.Array) -> jax.Array:
        """M v via the product-form recursion (down W, scale, up
        W^T + rank-1)."""
        m = self.s.shape[0]
        a = []
        for k in range(m - 1, -1, -1):
            yv = jnp.sum(self.y[k] * v)
            a.append(yv)
            v = v - self.rho[k] * self.s[k] * yv      # W_k v
        v = self.h0 * v
        for k in range(m):
            yv = a[m - 1 - k]
            v = v - self.rho[k] * self.y[k] * jnp.sum(self.s[k] * v) \
                + self.rho[k] * self.y[k] * yv        # W_k^T v + rho y (y.v)
        return v

    def push_noise(self, q: jax.Array, z: jax.Array) -> jax.Array:
        """Affine map q_m = L [q; z] realizing cov(q_m) = M from
        cov(q) = h0 I, z ~ N(0, I_m): one W^T + rank-1 noise injection
        per pair (oldest first)."""
        for k in range(self.s.shape[0]):
            q = q - self.rho[k] * self.y[k] * jnp.sum(self.s[k] * q) \
                + jnp.sqrt(self.rho[k]) * z[k] * self.y[k]
        return q

    def sample(self, key: jax.Array, shape, dtype) -> jax.Array:
        """Exact p ~ N(0, M) draw (covariance recursion, no sqrt)."""
        m = self.s.shape[0]
        kq, kz = jax.random.split(key)
        q = jnp.sqrt(self.h0) * jax.random.normal(kq, shape, dtype)
        z = jax.random.normal(kz, (m,), dtype)
        return self.push_noise(q, z)

    def kinetic(self, p: jax.Array) -> jax.Array:
        return 0.5 * jnp.sum(p * self.apply_minv(p))


def qn_prep(st: QNState, exclude: jax.Array | None = None,
            damp: float = 0.2) -> QNOps:
    """Prepare the per-trajectory operator scalars (the reference
    ``prep`` :433-520).  Invalid pairs get rho = c = 0 so every
    operator reduces to the identity component for them.  Pairs are
    consumed in ring order (oldest first).

    ``exclude``: (m,) bool in RING-SLOT order — pairs involving the
    currently-updated stream must not enter its own mass matrix
    (detailed balance; the reference excludes slots o.p and o.p-1,
    :441-444).

    ``damp``: Powell damping threshold sigma.  Ensemble pairs have
    LARGE s (differences of independent streams), so the secant data
    can be wildly inconsistent with positive curvature and the raw DFP
    update can collapse M along s — which destroys the leapfrog
    stability limit dt < 2/sqrt(eig(M^-1 Hess)).  Whenever
    s.y < sigma * s.(M_{k-1} s), y is blended toward M_{k-1} s
    (Powell 1978's modified-BFGS trick, transposed to the DFP-Hessian
    update) so M never shrinks below sigma of its previous value along
    s.  This replaces the reference's lambda/delta blend (:492-508)
    with the textbook-damped equivalent; damp=0 recovers the raw
    update."""
    m = st.m
    order = (st.pos + jnp.arange(m)) % m     # oldest .. newest
    s = st.s[order]
    y0 = st.y[order]
    valid = st.valid[order]
    if exclude is not None:
        valid = jnp.logical_and(valid,
                                jnp.logical_not(exclude[order]))

    def apply_partial_m(k, ys_list, rho_list, v):
        """M_{k-1} v via the product recursion over pairs < k (uses
        the already-damped y rows)."""
        a = []
        for j in range(k - 1, -1, -1):
            yv = jnp.sum(ys_list[j] * v)
            a.append(yv)
            v = v - rho_list[j] * s[j] * yv
        v = st.h0 * v
        for j in range(k):
            yv = a[k - 1 - j]
            v = v - rho_list[j] * ys_list[j] * jnp.sum(s[j] * v) \
                + rho_list[j] * ys_list[j] * yv
        return v

    y_rows, rho_rows = [], []
    w = jnp.zeros_like(y0)
    c = jnp.zeros((m,), s.dtype)
    for k in range(m):
        yk = y0[k]
        if damp > 0.0:
            bs = apply_partial_m(k, y_rows, rho_rows, s[k])
            s_bs = jnp.sum(s[k] * bs)
            s_y = jnp.sum(s[k] * yk)
            need = s_y < damp * s_bs
            theta = jnp.where(
                need, (1.0 - damp) * s_bs
                / jnp.where(need, s_bs - s_y, 1.0), 1.0)
            yk = theta * yk + (1.0 - theta) * bs
        ysk = jnp.sum(s[k] * yk)
        ok = jnp.logical_and(valid[k], ysk > 0.0)
        rhok = jnp.where(ok, 1.0 / jnp.where(ok, ysk, 1.0), 0.0)
        yk = jnp.where(ok, yk, 0.0)
        y_rows.append(yk)
        rho_rows.append(rhok)

        # w_k = H_{k-1} y_k with H_{k-1} built from pairs < k
        v = yk / st.h0
        for j in range(k):
            v = v + rho_rows[j] * jnp.sum(s[j] * yk) * s[j] \
                - c[j] * jnp.sum(w[j] * yk) * w[j]
        yw = jnp.sum(yk * v)
        ck = jnp.where(ok, 1.0 / jnp.where(ok, yw, 1.0), 0.0)
        w = w.at[k].set(jnp.where(ok, v, 0.0))
        c = c.at[k].set(ck)
    vb = valid.reshape((m,) + (1,) * (s.ndim - 1))
    return QNOps(jnp.where(vb, s, 0.0), jnp.stack(y_rows),
                 w, jnp.stack(rho_rows), c, st.h0)


def qn_hmc_step(key: jax.Array, x: jax.Array, ops: QNOps,
                action_fn, grad_fn, tau: float, steps: int,
                mask: jax.Array | None = None
                ) -> tuple[jax.Array, dict[str, Any]]:
    """One leapfrog HMC trajectory with mass matrix M = ops.

    ``mask`` (optional bool field): frozen components (maximal-tree
    gauge fixing) — momenta, forces, and pair fields must all vanish
    there so M acts within the free subspace.
    """
    kp, ka = jax.random.split(key)
    p = ops.sample(kp, x.shape, x.dtype)
    if mask is not None:
        p = jnp.where(mask, 0.0, p)

    def grad(xx):
        g = grad_fn(xx)
        return jnp.where(mask, 0.0, g) if mask is not None else g

    h0 = action_fn(x) + ops.kinetic(p)
    dt = tau / steps
    xx, pp = x, p
    for _ in range(steps):
        xx = xx + (0.5 * dt) * ops.apply_minv(pp)
        pp = pp - dt * grad(xx)
        xx = xx + (0.5 * dt) * ops.apply_minv(pp)
    h1 = action_fn(xx) + ops.kinetic(pp)
    dh = h1 - h0
    acc = jax.random.uniform(ka, (), x.dtype) < jnp.exp(-dh)
    x_new = jnp.where(acc, xx, x)
    return x_new, {"dH": dh, "accept": acc}
