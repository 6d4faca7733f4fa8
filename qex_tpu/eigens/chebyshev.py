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

from .lanczos import eigs_hermitian, lanczos_hermitian


def chebyshev_filter(op: Callable, a: float, b: float, degree: int
                     ) -> Callable:
    """v -> T_degree(l(A)) v with l mapping [a, b] -> [-1, 1].

    Modes with eigenvalue x < a are amplified ~ cosh(degree *
    acosh(|l(x)|)); modes inside [a, b] stay bounded by 1.
    """
    if not (b > a):
        raise ValueError(f"need b > a, got [{a}, {b}]")
    center = 0.5 * (b + a)
    half = 0.5 * (b - a)

    def l_op(v):
        return (op(v) - center * v) / half

    def filt(v):
        t0 = v
        t1 = l_op(v)
        if degree == 0:
            return t0
        def body(_, carry):
            tm1, t = carry
            tp1 = 2.0 * l_op(t) - tm1
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


def eigs_filtered(op: Callable, example: jax.Array, n_eigs: int, *,
                  degree: int = 20, window: tuple[float, float]
                  | None = None, m: int | None = None,
                  max_restarts: int = 40, tol: float = 1e-8,
                  seed: int = 0) -> tuple[np.ndarray, jax.Array, dict]:
    """Lowest ``n_eigs`` eigenpairs of hermitian ``op`` via
    Chebyshev-filtered thick-restart Lanczos.

    ``window`` is the (suppressed) interval [a, b]; defaults to
    [lo + 0.1 (hi - lo), hi] from :func:`estimate_spectral_range`.
    Eigenvalues are Rayleigh quotients of A on the converged filtered
    Ritz vectors, residuals are TRUE residuals |A v - theta v|.
    """
    if window is None:
        lo, hi = estimate_spectral_range(op, example)
        window = (lo + 0.1 * (hi - lo), hi)
    filt = chebyshev_filter(op, window[0], window[1], degree)

    # filtered spectrum: wanted modes map to the LARGEST |T_k| values
    # (T_k > 1 below the window since l(x) < -1 there and T_k(-|x|)
    # = (-1)^k T_k(|x|); use even degree so they are positive-largest)
    if degree % 2 == 1:
        degree += 1
        filt = chebyshev_filter(op, window[0], window[1], degree)
    _fvals, vecs, info = eigs_hermitian(filt, example, n_eigs,
                                        which="largest", m=m,
                                        max_restarts=max_restarts,
                                        tol=tol, seed=seed)
    info["degree"] = degree
    info["window"] = window
    info["matvecs_A"] = info["matvecs"] * degree

    # Rayleigh quotients + true residuals on A
    matvec = jax.jit(op)
    thetas, resids, out_vecs = [], [], []
    for i in range(vecs.shape[0]):
        v = vecs[i]
        av = matvec(v)
        th = float(jnp.real(jnp.sum(jnp.conj(v) * av)))
        r = float(jnp.sqrt(jnp.sum(jnp.abs(av - th * v) ** 2)))
        thetas.append(th)
        resids.append(r)
        out_vecs.append(v)
    order = np.argsort(thetas)
    info["true_residuals"] = np.array(resids)[order]
    return (np.array(thetas)[order],
            jnp.stack([out_vecs[i] for i in order]), info)
