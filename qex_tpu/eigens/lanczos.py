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

from functools import partial
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
        info["relative_residual"] = float(res.max() / scale)
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


def eigs_hermitian_dev(op: Callable, example: jax.Array, n_eigs: int,
                       *, which: str = "smallest", m: int | None = None,
                       max_restarts: int = 60, tol: float = 1e-8,
                       seed: int = 0, op_args=()
                       ) -> tuple[np.ndarray, jax.Array, dict]:
    """:func:`eigs_hermitian` with the WHOLE restart cycle as one jit.

    Device-resident thick-restart Lanczos: the basis lives on device as
    one (m+1, ...) array, Gram-Schmidt runs as masked einsums, the m x m
    projected eigenproblem uses jnp.linalg.eigh of a SINGLE small
    matrix (not batched over sites), and the host fetches exactly one
    real scalar per cycle (the residual) -- the only reliable pattern
    on the axon-tunneled TPU, where eager ops and non-scalar transfers
    are unsupported (CLAUDE.md).  This is what makes the eigensolver
    tier runnable at production volumes on the chip (QEX parity:
    hisqev.nim / qexPrimme.nim:59 driving PRIMME on real operators).
    """
    m = m or max(2 * n_eigs + 16, 24)
    k = min(n_eigs + 8, m - 2)
    rdtype = np.zeros((), example.dtype).real.dtype  # no eager jnp op
    vshape = example.shape
    desc = which == "largest"

    def gs_pass(bb, w, j, idx):
        mask = (idx <= j).astype(rdtype)
        c = jnp.einsum("k...,...->k", jnp.conj(bb), w)
        c = c * mask.astype(c.dtype)
        w = w - jnp.einsum("k,k...->...", c, bb)
        return w, c

    def extend(bb, tt, k0, args):
        """Grow the basis from rows [0..k0] to [0..m], filling T."""
        idx = jnp.arange(m + 1)

        def body(j, carry):
            bb, tt = carry
            w = op(bb[j], *args)
            w, c = gs_pass(bb, w, j, idx)
            w, _ = gs_pass(bb, w, j, idx)  # second pass
            col = jnp.real(c).astype(tt.dtype)
            colmask = (idx <= j).astype(tt.dtype)
            tt = tt.at[:, j].set(jnp.where(colmask > 0, col, tt[:, j]))
            tt = tt.at[j, :].set(jnp.where(colmask > 0, col, tt[j, :]))
            b = jnp.sqrt(jnp.sum(jnp.abs(w) ** 2)) + 1e-300
            bb = bb.at[j + 1].set((w / b.astype(w.dtype)))
            tt = tt.at[j + 1, j].set(b.astype(tt.dtype))
            tt = tt.at[j, j + 1].set(b.astype(tt.dtype))
            return bb, tt

        return jax.lax.fori_loop(k0, m, body, (bb, tt))

    def finish(bb, tt):
        b_last = tt[m, m - 1]
        evals, svecs = jnp.linalg.eigh(tt[:m, :m])
        order = jnp.argsort(-evals if desc else evals)
        evals = evals[order]
        svecs = svecs[:, order]
        res = jnp.abs(b_last * svecs[m - 1, :n_eigs])
        scale = jnp.maximum(jnp.maximum(jnp.abs(evals[0]),
                                        jnp.abs(evals[-1])), 1e-30)
        # ritz vectors of the wanted modes
        ritz = jnp.einsum("k...,kn->n...", bb[:m],
                          svecs[:, :n_eigs].astype(example.dtype))
        # thick restart state
        keep = jnp.einsum("k...,kn->n...", bb[:m],
                          svecs[:, :k].astype(example.dtype))
        bb_new = jnp.zeros_like(bb)
        bb_new = bb_new.at[:k].set(keep)
        bb_new = bb_new.at[k].set(bb[m])
        tt_new = jnp.zeros_like(tt)
        tt_new = tt_new.at[jnp.arange(k), jnp.arange(k)].set(evals[:k])
        coup = b_last * svecs[m - 1, :k]
        tt_new = tt_new.at[:k, k].set(coup)
        tt_new = tt_new.at[k, :k].set(coup)
        return (bb_new, tt_new, evals[:n_eigs], ritz,
                (jnp.max(res) / scale).astype(jnp.float32),
                jnp.max(res).astype(jnp.float32))

    @partial(jax.jit, static_argnums=(2,))
    def cycle(bb, tt, k0, *args):
        bb, tt = extend(bb, tt, k0, args)
        return finish(bb, tt)

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def init():
        v = (jax.random.normal(key, vshape, rdtype)
             + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                      vshape, rdtype)).astype(
            example.dtype)
        v = v / jnp.sqrt(jnp.sum(jnp.abs(v) ** 2)).astype(v.dtype)
        bb = jnp.zeros((m + 1,) + vshape, example.dtype).at[0].set(v)
        tt = jnp.zeros((m + 1, m + 1), rdtype)
        return bb, tt

    if max_restarts < 1:
        raise ValueError(f"max_restarts must be >= 1, got {max_restarts}")
    bb, tt = init()
    info = {"cycles": 0, "matvecs": 0}
    pick = jax.jit(lambda a, i: a[i])  # real scalar, native dtype
    relres = resabs = None
    for cycle_i in range(max_restarts):
        k0 = 0 if cycle_i == 0 else k
        bb, tt, evals, ritz, resmax, resa = cycle(bb, tt, k0, *op_args)
        info["matvecs"] += m - k0
        info["cycles"] = cycle_i + 1
        relres = float(resmax)  # ONE scalar fetch per cycle
        if relres <= tol:
            break
    resabs = float(resa)  # one extra fetch, after the loop only
    # same convention as the host path: 'residual' = ABSOLUTE max Ritz
    # residual bound, 'relative_residual' = scaled by the spectral range
    info["residual"] = resabs
    info["relative_residual"] = relres
    info["converged"] = bool(relres <= tol)
    # fetch the n_eigs eigenvalues as individual real scalars (the
    # tunnel cannot transfer arrays); vectors stay on device
    evs = np.array([float(pick(evals, i)) for i in range(n_eigs)])
    return evs, ritz, info


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
