"""Mixed-precision Rayleigh-Ritz refinement of approximate eigenpairs.

The device-resident Lanczos (eigens/lanczos.eigs_hermitian_dev) stalls
at true residuals ~4e-5..8e-4 in f32 at production volumes (measured
at 24^3x48, ROUND3.md): every projection coefficient it forms is a
plain f32 reduction over ~5e6 elements, whose ~sqrt(N)*eps relative
quantization (~1e-4) caps how well the Krylov basis can be
orthogonalized.  The reference's PRIMME/Lanczos runs in f64 and
delivers ~1e-8 residuals (/root/reference/src/eigens/qexPrimme.nim:59).

This module closes most of that gap WITHOUT f64 fields: a block
Rayleigh-Ritz polish over span[V, R] where R are the normalized
residual directions, with every inner product computed by COMPENSATED
two-float reductions (ops.dsum.cdot2, entry-accurate to ~eps instead
of ~sqrt(N)*eps).  Per iteration:

    W   = A V                     (n operator applies)
    c   = V^H W  (compensated)    -> R = normalize(W - V c)  (the
          Gram-Schmidt that plain f32 dots CANNOT do at volume: the
          informative residual components are ~1e-4 of |W|)
    S   = [V, R];  H = S^H A S  (compensated; A R = n more applies),
          G = S^H S (compensated, ~= I by construction)
    solve the 2n x 2n generalized problem H c = theta G c on device
    V' <- S c[:, :n]  (smallest theta), renormalized

Everything is one jit (tunnel discipline: no eager ops, scalars only
fetched at the end).  2n operator applies per iteration -- negligible
next to the thousands the Lanczos itself used.

QEX parity: the accuracy tier of qexPrimme.nim / hisqev.nim.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import dsum


def rr_refine_dev(op: Callable, vecs: jax.Array, op_args=(),
                  iters: int = 2, which: str = "smallest",
                  depth: int = 2, filt: Callable | None = None):
    """Refine ``vecs`` (stacked (n, ...) approximate eigenvectors of
    the Hermitian PSD operator ``op(v, *op_args)``).

    ``depth``: block-Krylov levels per iteration -- the subspace is
    span[V, R, A R, ..., A^{depth-1} R].  depth=1 is classic
    [V, residuals]; deeper subspaces converge correspondingly faster
    per iteration at n extra matvecs per level (measured on a dense
    uniform spectrum: ~2x residual/iter at depth 1, ~8x at depth 2).

    ``filt``: optional low-pass polynomial ``filt(v, *op_args)`` (e.g.
    eigens.chebyshev.chebyshev_filter with the eigensolve's window)
    applied to the input vectors at the start of every iteration.
    REQUIRED when the target eigenvalues sit far below the f32 eigh
    noise floor eps*|A| (tiny clustered Dirac low modes): filtering
    crushes the vectors' bulk-mode error so the projected problem
    lives at band scale, where the small f32 eigensolve can resolve
    it.  Without it, deep subspaces at such clusters DEGRADE the
    pairs (measured).

    Returns (evals, vecs, resids, info): np.float64 Rayleigh quotients,
    refined device vectors, np.float64 true residual norms
    |A v - theta v| (compensated), and an info dict.
    """
    n = vecs.shape[0]
    desc = which == "largest"
    cdt = vecs.dtype
    rdt = jnp.finfo(cdt).dtype

    def apply_all(V, args):
        return jnp.stack([op(V[i], *args) for i in range(n)])

    _CHUNK = 2048

    def gram(A, B, m1, m2):
        """(m1, m2) compensated Gram block, batched: per-chunk partial
        dots ride the MXU (einsum), then ONE vectorized two-float tree
        combines the chunk partials exactly (dsum.sum2_last).  Intra-
        chunk rounding (~log2(chunk) ulps of a chunk partial) is the
        only error left -- orders below the plain full-length f32
        reduction, at a fraction of the per-entry-tree compile cost."""
        Af = jnp.conj(A.reshape(m1, -1))
        Bf = B.reshape(m2, -1)
        N = Af.shape[1]
        k = -(-N // _CHUNK)
        pad = k * _CHUNK - N
        if pad:
            Af = jnp.pad(Af, ((0, 0), (0, pad)))
            Bf = jnp.pad(Bf, ((0, 0), (0, pad)))
        Pa = Af.reshape(m1, k, _CHUNK)
        Pb = Bf.reshape(m2, k, _CHUNK)
        P = jnp.einsum("ikb,jkb->ijk", Pa, Pb)
        rh, rl = dsum.sum2_last(jnp.real(P))
        ih, il = dsum.sum2_last(jnp.imag(P))
        return ((rh + rl) + 1j * (ih + il)).astype(cdt)

    def norms(X):
        """Batched compensated-chunked 2-norms of stacked vectors."""
        Xf = X.reshape(X.shape[0], -1)
        z = jnp.real(Xf) ** 2 + jnp.imag(Xf) ** 2
        N = z.shape[1]
        k = -(-N // _CHUNK)
        pad = k * _CHUNK - N
        if pad:
            z = jnp.pad(z, ((0, 0), (0, pad)))
        hi, lo = dsum.sum2_last(
            jnp.sum(z.reshape(z.shape[0], k, _CHUNK), axis=-1))
        return jnp.sqrt(jnp.maximum(hi + lo, 0.0))

    @jax.jit
    def step(V, *args):
        bshape = (n,) + (1,) * (V.ndim - 1)
        if filt is not None:
            V = jnp.stack([filt(V[i], *args) for i in range(n)])
            V = V / jnp.maximum(norms(V), 1e-30).astype(cdt).reshape(
                bshape)
        W = apply_all(V, args)
        # block-Krylov expansion: each level's block is the previous
        # level's image, compensated-GS'd against everything built so
        # far (the generalized solve absorbs residual non-orthogonality
        # through the exact Gram anyway)
        blocks = [V]
        images = [W]
        cur = W
        for _lvl in range(depth):
            R = cur
            for Bq in blocks:
                Cq = gram(Bq, R, n, n)
                R = R - jnp.tensordot(Cq.T, Bq, axes=1)
            rn = norms(R)
            R = R / jnp.maximum(rn, 1e-30).astype(cdt).reshape(bshape)
            AR = apply_all(R, args)
            blocks.append(R)
            images.append(AR)
            cur = AR
        S = jnp.concatenate(blocks, axis=0)
        AS = jnp.concatenate(images, axis=0)
        m = (1 + depth) * n
        H = gram(S, AS, m, m)
        H = 0.5 * (H + jnp.conj(H.T))
        G = gram(S, S, m, m)
        G = 0.5 * (G + jnp.conj(G.T))
        # generalized symmetric eig via G^{-1/2} (G ~= I, well
        # conditioned by construction)
        gl, gq = jnp.linalg.eigh(G)
        isq = jnp.where(gl > 1e-5 * jnp.max(gl),
                        1.0 / jnp.sqrt(jnp.maximum(gl, 1e-30)), 0.0)
        Rm = (gq * isq[None, :].astype(gq.dtype)) @ jnp.conj(gq.T)
        M = Rm @ H @ jnp.conj(Rm.T)
        M = 0.5 * (M + jnp.conj(M.T))
        th, Y = jnp.linalg.eigh(M)
        Cc = Rm @ Y          # Rm is Hermitian: pencil vectors c = Rm y
        # masked (rank-deficient) directions of G produce spurious
        # theta ~ 0 candidates whose pencil vectors are ~0 -- with
        # nearly-converged inputs the residual blocks ARE nearly
        # dependent, so this is the common case, and an unfiltered
        # sort would select the garbage as "smallest".  Push invalid
        # candidates to the far end before ordering.
        cn = jnp.linalg.norm(Cc, axis=0)
        bad = cn < 1e-3
        far = jnp.asarray(-jnp.inf if desc else jnp.inf, th.dtype)
        th = jnp.where(bad, far, th)
        order = jnp.argsort(-th if desc else th)
        th = th[order]
        Cc = Cc[:, order]
        Vn = jnp.tensordot(Cc[:, :n].T, S, axes=1)
        nrm = norms(Vn)
        Vn = Vn / jnp.maximum(nrm, 1e-30).astype(cdt).reshape(bshape)
        return Vn, th[:n]

    @jax.jit
    def finals(V, *args):
        W = apply_all(V, args)
        th = jnp.real(jnp.diagonal(gram(V, W, n, n))).astype(rdt)
        bshape = (n,) + (1,) * (V.ndim - 1)
        rs = norms(W - th.astype(cdt).reshape(bshape) * V)
        return th, rs

    V = vecs
    for _ in range(iters):
        V, _th = step(V, *op_args)
    th, rs = finals(V, *op_args)
    pick = jax.jit(lambda a, i: a[i])
    evals = np.array([float(pick(th, i)) for i in range(n)])
    resids = np.array([float(pick(rs, i)) for i in range(n)])
    return evals, V, resids, {
        "iters": iters, "depth": depth,
        "matvecs": (1 + depth) * n * iters + n}


def refine_inverse_dev(op: Callable, vecs: jax.Array, op_args=(),
                       iters: int = 2, r2req: float = 1e-10,
                       maxits: int = 500, restarts: int = 2):
    """Deflated-inverse-iteration polish for TINY clustered eigenvalues
    (the lattice-Dirac low band, lambda ~ 1e-7..1e-4 under
    lambda_max ~ 7).

    In that regime subspace refinement stalls: even an EXACT f64
    Rayleigh-Ritz over the f32 Lanczos span leaves residuals at the
    span's own ~1e-4 error (measured, 4^3x8), and block-Krylov
    expansion removes it only ~2x per iteration.  Inverse iteration
    multiplies the target modes by 1/lambda -- a ~1e2-1e3 relative
    suppression of near-band error PER SOLVE -- and the solve is cheap
    because the band itself is deflated: the Galerkin projector over
    the current vectors supplies the in-band part of A^{-1} v
    analytically, so CG only works on the out-of-band remainder at the
    bulk condition number (solvers/deflate.py construction).

    The closing block Rayleigh-Ritz runs entirely IN-BAND (all
    vectors are inverse-iterated), so its small f32 eigenproblem has
    |M| ~ band-top -- resolving 1e-7-scale eigenvalues that sit far
    below eps * lambda_max, which is exactly what breaks the plain
    subspace polish here.

    QEX parity: the accuracy tier of the reference's f64 PRIMME runs
    (qexPrimme.nim:59) reached in f32.  Returns
    (evals, vecs, resids, info) like :func:`rr_refine_dev`.
    """
    from ..solvers import cg as cgmod

    n = vecs.shape[0]
    cdt = vecs.dtype
    rdt = jnp.finfo(cdt).dtype
    _CHUNK = 2048

    def gram(A, B, m1, m2):
        Af = jnp.conj(A.reshape(m1, -1))
        Bf = B.reshape(m2, -1)
        N = Af.shape[1]
        k = -(-N // _CHUNK)
        pad = k * _CHUNK - N
        if pad:
            Af = jnp.pad(Af, ((0, 0), (0, pad)))
            Bf = jnp.pad(Bf, ((0, 0), (0, pad)))
        P = jnp.einsum("ikb,jkb->ijk", Af.reshape(m1, k, _CHUNK),
                       Bf.reshape(m2, k, _CHUNK))
        rh, rl = dsum.sum2_last(jnp.real(P))
        ih, il = dsum.sum2_last(jnp.imag(P))
        return ((rh + rl) + 1j * (ih + il)).astype(cdt)

    def norms(X):
        Xf = X.reshape(X.shape[0], -1)
        z = jnp.real(Xf) ** 2 + jnp.imag(Xf) ** 2
        N = z.shape[1]
        k = -(-N // _CHUNK)
        pad = k * _CHUNK - N
        if pad:
            z = jnp.pad(z, ((0, 0), (0, pad)))
        hi, lo = dsum.sum2_last(
            jnp.sum(z.reshape(z.shape[0], k, _CHUNK), axis=-1))
        return jnp.sqrt(jnp.maximum(hi + lo, 0.0))

    @jax.jit
    def step(V, *args):
        aop = lambda x: op(x, *args)
        bshape = (n,) + (1,) * (V.ndim - 1)
        W = jnp.stack([aop(V[i]) for i in range(n)])
        Gm = gram(V, W, n, n)
        Gm = 0.5 * (Gm + jnp.conj(Gm.T))

        def galerkin(r):
            c = jnp.stack([dsum.cdot2(V[i], r) for i in range(n)])
            return jnp.tensordot(jnp.linalg.solve(Gm, c), V, axes=1)

        Vn = []
        for i in range(n):
            x0 = galerkin(V[i])
            r0 = V[i] - aop(x0)
            z, _ = cgmod.cg_solve_restarted(aop, r0, r2req=r2req,
                                            maxits=maxits,
                                            restarts=restarts)
            Vn.append(x0 + z)
        Vn = jnp.stack(Vn)
        Vn = Vn / jnp.maximum(norms(Vn), 1e-30).astype(cdt).reshape(
            bshape)
        # in-band block Rayleigh-Ritz re-diagonalization
        Wn = jnp.stack([aop(Vn[i]) for i in range(n)])
        H = gram(Vn, Wn, n, n)
        H = 0.5 * (H + jnp.conj(H.T))
        G = gram(Vn, Vn, n, n)
        G = 0.5 * (G + jnp.conj(G.T))
        gl, gq = jnp.linalg.eigh(G)
        isq = jnp.where(gl > 1e-5 * jnp.max(gl),
                        1.0 / jnp.sqrt(jnp.maximum(gl, 1e-30)), 0.0)
        Rm = (gq * isq[None, :].astype(gq.dtype)) @ jnp.conj(gq.T)
        M = Rm @ H @ jnp.conj(Rm.T)
        M = 0.5 * (M + jnp.conj(M.T))
        th, Y = jnp.linalg.eigh(M)
        Cc = Rm @ Y
        V2 = jnp.tensordot(Cc[:, :n].T, Vn, axes=1)
        V2 = V2 / jnp.maximum(norms(V2), 1e-30).astype(cdt).reshape(
            bshape)
        return V2

    @jax.jit
    def finals(V, *args):
        aop = lambda x: op(x, *args)
        W = jnp.stack([aop(V[i]) for i in range(n)])
        th = jnp.real(jnp.diagonal(gram(V, W, n, n))).astype(rdt)
        bshape = (n,) + (1,) * (V.ndim - 1)
        rs = norms(W - th.astype(cdt).reshape(bshape) * V)
        return th, rs

    V = vecs
    for _ in range(iters):
        V = step(V, *op_args)
    th, rs = finals(V, *op_args)
    pick = jax.jit(lambda a, i: a[i])
    evals = np.array([float(pick(th, i)) for i in range(n)])
    resids = np.array([float(pick(rs, i)) for i in range(n)])
    return evals, V, resids, {"iters": iters}
