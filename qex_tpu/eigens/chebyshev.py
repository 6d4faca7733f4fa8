"""Chebyshev spectral filtering for the Lanczos eigensolver tier.

TPU-native replacement for the reference's Chebyshev-preconditioned
PRIMME eigensolves (reference tests/primme/, the external ``chebyshev``
Nim package listed in qex.nimble:26-29): a degree-k Chebyshev
polynomial of the operator suppresses the unwanted part of the
spectrum [a, b] to |T_k| <= 1 while amplifying modes below ``a``
exponentially in k, so Lanczos on p(A) converges the low modes in far
fewer matvec-equivalents than plain Lanczos on A.

All polynomial applications run as one jitted ``lax.fori_loop`` of the
three-term recurrence on device; eigenvalues of A are recovered by
Rayleigh quotients of the converged filtered Ritz vectors.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .lanczos import (eigs_hermitian, eigs_hermitian_dev,
                      lanczos_hermitian)


def chebyshev_filter(op: Callable, a: float, b: float, degree: int
                     ) -> Callable:
    """v -> T_degree(l(A)) v with l mapping [a, b] -> [-1, 1].

    Modes with eigenvalue x < a are amplified ~ cosh(degree *
    acosh(|l(x)|)); modes inside [a, b] stay bounded by 1.

    ``op`` may take trailing operator arguments (big link arrays must
    be jit ARGUMENTS on the tunneled TPU, never closures -- closed-over
    arrays serialize into the remote-compile request); the returned
    filter forwards them: ``filt(v, *op_args)``.
    """
    if not (b > a):
        raise ValueError(f"need b > a, got [{a}, {b}]")
    center = 0.5 * (b + a)
    half = 0.5 * (b - a)

    def l_op(v, *args):
        return (op(v, *args) - center * v) / half

    def filt(v, *args):
        t0 = v
        t1 = l_op(v, *args)
        if degree == 0:
            return t0
        def body(_, carry):
            tm1, t = carry
            tp1 = 2.0 * l_op(t, *args) - tm1
            return (t, tp1)
        tm1, t = jax.lax.fori_loop(0, degree - 1, body, (t0, t1))
        return t

    return filt


def estimate_spectral_range(op: Callable, example: jax.Array,
                            m: int = 30, seed: int = 7,
                            safety: float = 1.05
                            ) -> tuple[float, float]:
    """(lo, hi) bracket of a hermitian operator's spectrum from an
    m-step Lanczos: extreme Ritz values padded by the residual bound
    times ``safety``.  QEX parity: hisqev.nim's rough spectral bounds
    for its Chebyshev windows; also feeds the rooted-fermion rational
    approximation interval (replacing the loose nd^2 bound)."""
    rdtype = jnp.zeros((), example.dtype).real.dtype
    key = jax.random.PRNGKey(seed)
    v0 = (jax.random.normal(key, example.shape, rdtype)
          + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                   example.shape, rdtype)).astype(
        example.dtype)
    al, be, _ = lanczos_hermitian(op, v0, m)
    t = np.diag(al) + np.diag(be, 1) + np.diag(be, -1)
    ev, evec = np.linalg.eigh(t)
    # residual of the extreme Ritz pairs: beta_last * |last component|
    b_last = be[-1] if len(be) else 0.0
    r_lo = abs(b_last * evec[-1, 0])
    r_hi = abs(b_last * evec[-1, -1])
    lo = ev[0] - safety * r_lo
    hi = ev[-1] + safety * r_hi
    return float(lo), float(hi)


def estimate_spectral_range_dev(op: Callable, example: jax.Array,
                                m: int = 30, seed: int = 7,
                                safety: float = 1.05, op_args=()
                                ) -> tuple[float, float]:
    """:func:`estimate_spectral_range` with the whole m-step Lanczos +
    tridiagonal eigensolve in ONE jit, fetching only the two bracket
    scalars -- required on the axon-tunneled TPU (no eager ops, no
    array transfers)."""
    rdtype = np.zeros((), example.dtype).real.dtype

    @jax.jit
    def run(*args):
        key = jax.random.PRNGKey(seed)
        v = (jax.random.normal(key, example.shape, rdtype)
             + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                      example.shape, rdtype)).astype(
            example.dtype)
        v = v / jnp.sqrt(jnp.sum(jnp.abs(v) ** 2)).astype(v.dtype)
        bb = jnp.zeros((m + 1,) + example.shape, example.dtype
                       ).at[0].set(v)
        al = jnp.zeros((m,), rdtype)
        be = jnp.zeros((m,), rdtype)
        idx = jnp.arange(m + 1)

        def body(j, carry):
            bb, al, be = carry
            w = op(bb[j], *args)
            c1 = jnp.einsum("k...,...->k", jnp.conj(bb), w)
            c1 = c1 * (idx <= j).astype(c1.dtype)
            w = w - jnp.einsum("k,k...->...", c1, bb)
            c2 = jnp.einsum("k...,...->k", jnp.conj(bb), w)  # 2nd pass
            c2 = c2 * (idx <= j).astype(c2.dtype)
            w = w - jnp.einsum("k,k...->...", c2, bb)
            al = al.at[j].set(jnp.real(c1[j]))
            b = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)) + 1e-300
            be = be.at[j].set(b)
            bb = bb.at[j + 1].set(w / b.astype(w.dtype))
            return bb, al, be

        bb, al, be = jax.lax.fori_loop(0, m, body, (bb, al, be))
        t = (jnp.diag(al) + jnp.diag(be[:m - 1], 1)
             + jnp.diag(be[:m - 1], -1))
        ev, evec = jnp.linalg.eigh(t)
        b_last = be[m - 1]
        lo = ev[0] - safety * jnp.abs(b_last * evec[m - 1, 0])
        hi = ev[-1] + safety * jnp.abs(b_last * evec[m - 1, -1])
        return lo, hi

    lo, hi = run(*op_args)
    return float(lo), float(hi)


def eigs_filtered(op: Callable, example: jax.Array, n_eigs: int, *,
                  degree: int = 20, window: tuple[float, float]
                  | None = None, m: int | None = None,
                  max_restarts: int = 40, tol: float = 1e-8,
                  seed: int = 0, device: bool | None = None,
                  op_args=()) -> tuple[np.ndarray, jax.Array, dict]:
    """Lowest ``n_eigs`` eigenpairs of hermitian ``op`` via
    Chebyshev-filtered thick-restart Lanczos.

    ``window`` is the (suppressed) interval [a, b]; defaults to
    [lo + 0.1 (hi - lo), hi] from :func:`estimate_spectral_range`.
    Eigenvalues are Rayleigh quotients of A on the converged filtered
    Ritz vectors, residuals are TRUE residuals |A v - theta v|.

    ``device``: run the fully device-resident path (one jit per
    restart cycle, scalar-only host transfers -- the axon-tunnel-safe
    mode); default auto (True on non-CPU backends).
    """
    if device is None:
        device = jax.default_backend() != "cpu"
    if window is None:
        if device:
            lo, hi = estimate_spectral_range_dev(op, example,
                                                 op_args=op_args)
        else:
            lo, hi = estimate_spectral_range(
                (lambda v: op(v, *op_args)) if op_args else op, example)
        window = (lo + 0.1 * (hi - lo), hi)
    filt = chebyshev_filter(op, window[0], window[1], degree)

    # filtered spectrum: wanted modes map to the LARGEST |T_k| values
    # (T_k > 1 below the window since l(x) < -1 there and T_k(-|x|)
    # = (-1)^k T_k(|x|); use even degree so they are positive-largest)
    if degree % 2 == 1:
        degree += 1
        filt = chebyshev_filter(op, window[0], window[1], degree)
    if device:
        _fvals, vecs, info = eigs_hermitian_dev(
            filt, example, n_eigs, which="largest", m=m,
            max_restarts=max_restarts, tol=tol, seed=seed,
            op_args=op_args)
    else:
        _fvals, vecs, info = eigs_hermitian(
            (lambda v: filt(v, *op_args)) if op_args else filt,
            example, n_eigs, which="largest", m=m,
            max_restarts=max_restarts, tol=tol, seed=seed)
    info["degree"] = degree
    info["window"] = window
    info["matvecs_A"] = info["matvecs"] * degree

    # Rayleigh quotients + true residuals on A, one jit, scalar fetches
    @jax.jit
    def rayleigh(vecs, *args):
        ths, rs = [], []
        for i in range(vecs.shape[0]):  # static unroll, n is small
            v = vecs[i]
            av = op(v, *args)
            th = jnp.real(jnp.einsum("...,...->", jnp.conj(v), av))
            r = jnp.sqrt(jnp.sum(jnp.abs(av - th.astype(av.dtype) * v)
                                 ** 2))
            ths.append(th)
            rs.append(r)
        return jnp.stack(ths), jnp.stack(rs)

    th_d, r_d = rayleigh(vecs, *op_args)
    pick = jax.jit(lambda a, i: a[i])
    thetas = np.array([float(pick(th_d, i))
                       for i in range(vecs.shape[0])])
    resids = np.array([float(pick(r_d, i))
                       for i in range(vecs.shape[0])])
    order = np.argsort(thetas)
    info["true_residuals"] = resids[order]
    return (thetas[order],
            jnp.stack([vecs[i] for i in order]), info)
