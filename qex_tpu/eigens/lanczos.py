"""Thick-restart Lanczos for hermitian lattice operators.

TPU-native replacement for QEX's eigensolver layer: svdLanczos.nim
(Lanczos/SVD of the Dirac operator), the PRIMME FFI (qexPrimme.nim:59
with its QEX matvec callback), and the staggered eigen driver
(hisqev.nim).  LAPACK's role (small dense eigenproblems inside the
restart, eigens/linalgFuncs.nim) is played by numpy on the host.

Algorithm: thick-restart Lanczos (Wu & Simon, SIAM J. Matrix Anal.
2000) with full reorthogonalization -- the same family PRIMME uses for
extreme hermitian eigenpairs.  Matvecs run jitted on device; only the
m x m projected eigenproblem goes to the host.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _normalize(v):
    n = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))
    return v / n.astype(v.dtype), n


def lanczos_hermitian(op: Callable, v0: jax.Array, m: int
                      ) -> tuple[np.ndarray, np.ndarray, jax.Array]:
    """Plain m-step Lanczos with full reorthogonalization.

    Returns (alpha[m], beta[m-1], V[m, ...]).
    """
    v, _ = _normalize(v0)
    vs = [v]
    alphas, betas = [], []
    matvec = jax.jit(op)
    for j in range(m):
        w = matvec(vs[-1])
        a = jnp.real(jnp.sum(jnp.conj(vs[-1]) * w))
        alphas.append(float(a))
        for _ in range(2):  # full reorthogonalization, 2 GS passes
            for vi in vs:
                w = w - jnp.sum(jnp.conj(vi) * w).astype(w.dtype) * vi
        w, b = _normalize(w)
        if j < m - 1:
            betas.append(float(b))
            vs.append(w)
    return np.array(alphas), np.array(betas), jnp.stack(vs)


def eigs_hermitian(op: Callable, example: jax.Array, n_eigs: int,
                   *, which: str = "smallest", m: int | None = None,
                   max_restarts: int = 60, tol: float = 1e-8,
                   seed: int = 0) -> tuple[np.ndarray, jax.Array, dict]:
    """n extreme eigenpairs of a hermitian operator by thick-restart
    Lanczos (PRIMME-equivalent driver; QEX qexPrimme parity).

    Returns (eigenvalues[n], eigenvectors[n, ...], info dict).
    """
    m = m or max(2 * n_eigs + 16, 24)
    k = min(n_eigs + 8, m - 2)       # thick-restart retention
    rdtype = jnp.zeros((), example.dtype).real.dtype

    key = jax.random.PRNGKey(seed)
    v = (jax.random.normal(key, example.shape, rdtype)
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  example.shape, rdtype)).astype(
        example.dtype)
    v, _ = _normalize(v)

    matvec = jax.jit(op)
    basis = [v]                      # current orthonormal basis
    tmat = np.zeros((m, m))          # projected operator
    info = {"cycles": 0, "matvecs": 0}

    for cycle in range(max_restarts):
        # grow the basis to m vectors + 1 residual vector
        while len(basis) <= m:
            j = len(basis) - 1
            w = matvec(basis[-1])
            info["matvecs"] += 1
            coeffs = [jnp.sum(jnp.conj(vi) * w) for vi in basis]
            for i, c in enumerate(coeffs):
                w = w - c.astype(w.dtype) * basis[i]
            for vi in basis:         # second GS pass
                w = w - jnp.sum(jnp.conj(vi) * w).astype(w.dtype) * vi
            for i, c in enumerate(coeffs):
                cr = float(jnp.real(c))
                tmat[i, j] = cr
                tmat[j, i] = cr
            w, b = _normalize(w)
            b_last = float(b)
            if len(basis) < m:
                tmat[len(basis), j] = b_last
                tmat[j, len(basis)] = b_last
            basis.append(w)

        evals, evecs = np.linalg.eigh(tmat)
        order = (np.argsort(evals) if which == "smallest"
                 else np.argsort(-evals))
        evals, evecs = evals[order], evecs[:, order]

        # Ritz residual bound: |r_i| = |b_last * s_{m-1,i}|
        res = np.abs(b_last * evecs[m - 1, :n_eigs])
        scale = max(abs(evals[0]), abs(evals[-1]), 1e-30)
        info["cycles"] = cycle + 1
        info["residual"] = float(res.max())
        if res.max() <= tol * scale or cycle == max_restarts - 1:
            vb = jnp.stack(basis[:m])
            ritz = jnp.einsum("k...,kn->n...", vb,
                              jnp.asarray(evecs[:, :n_eigs],
                                          example.dtype))
            info["converged"] = bool(res.max() <= tol * scale)
            return evals[:n_eigs], ritz, info

        # thick restart: keep k ritz vectors + the residual direction
        vb = jnp.stack(basis[:m])
        ritz = jnp.einsum("k...,kn->n...", vb,
                          jnp.asarray(evecs[:, :k], example.dtype))
        residual_vec = basis[m]
        basis = [ritz[i] for i in range(k)] + [residual_vec]
        tmat = np.zeros((m, m))
        tmat[:k, :k] = np.diag(evals[:k])
        coup = b_last * np.asarray(evecs[m - 1, :k])
        tmat[:k, k] = coup
        tmat[k, :k] = coup

    raise RuntimeError("unreachable")


def svd_lowest(dslash_eo_op: Callable, dslash_oe_op: Callable,
               example_e: jax.Array, n: int, **kw):
    """Lowest singular values of the eo Dslash block via the normal
    operator: sigma_i = sqrt(eig_i(D_eo D_oe^dag-like normal op)).

    QEX parity: svdLanczos.nim usage for staggered spectra.
    """
    def normal(v):
        return dslash_eo_op(dslash_oe_op(v))

    evals, vecs, info = eigs_hermitian(normal, example_e, n,
                                       which="smallest", **kw)
    return np.sqrt(np.maximum(evals, 0.0)), vecs, info
