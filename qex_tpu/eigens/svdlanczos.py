"""Golub-Kahan-Lanczos SVD of the Dirac operator.

TPU-native replacement for QEX's dedicated singular-value path:
svdLanczos.nim:1-507 (Lanczos bidiagonalization + bisection kernels
svdbi4.nim) and qexPrimmeSvd.nim (PRIMME-SVD).  Unlike the Hermitian
thick-restart on the normal operator D^dag D (eigens/lanczos.py),
this works on D itself: the bidiagonalization squares nothing, so tiny
singular values keep full relative precision (the conditioning
advantage the reference's svdLanczos exists for).

Algorithm: Golub-Kahan bidiagonalization with Baglama-Reichel-style
thick restart (IRLBA, SIAM J. Sci. Comput. 27(1), 2005) and full
two-sided reorthogonalization:

    D v_j     = alpha_j u_j + beta_{j-1} u_{j-1}
    D^dag u_j = alpha_j v_j + beta_j v_{j+1}

After m steps the projected operator is the (m x m) upper-bidiagonal
B (diag alpha, superdiag beta); its SVD B = P S Q^T gives Ritz
triplets (sigma_i, U P_i, V Q_i) with residual bound
|D^dag u_i - sigma_i v_i| = beta_m |P[m-1, i]|.  The restart keeps k
triplets plus the last right-residual direction; the restarted
projected matrix is diag(sigma_1..k) with coupling column rho_i =
beta_m P[m-1, i] -- exactly the structure IRLBA continues from.

Two drivers share the algebra:

* :func:`svd_lanczos` -- host-loop (eager matvecs through one jitted
  op), for CPU/f64 verification.
* :func:`svd_lanczos_dev` -- device-resident: a whole restart cycle is
  ONE jit (fori_loop bidiagonalization with masked reorthogonalization,
  on-device small SVD), one real-scalar fetch per cycle -- the tunnel
  discipline of eigens/lanczos.eigs_hermitian_dev (eager dispatch is
  unimplemented on the axon backend; arrays cannot be fetched).

Operator-argument discipline: pass link arrays via ``op_args`` --
``av(v, *op_args)`` / ``ahv(u, *op_args)`` -- never closures (a
closed-over device array serializes into the remote-compile request;
observed HTTP 413 at 24^3x48).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _norm(v):
    return jnp.sqrt(jnp.sum(jnp.abs(v) ** 2))


def _proj_out(w, basis):
    """Two-pass classical Gram-Schmidt against a list of vectors."""
    for _ in range(2):
        for q in basis:
            w = w - jnp.sum(jnp.conj(q) * w).astype(w.dtype) * q
    return w


def svd_lanczos(av: Callable, ahv: Callable, example_v: jax.Array,
                n: int, *, m: int = 30, max_restarts: int = 100,
                tol: float = 1e-8, which: str = "smallest",
                seed: int = 0, op_args=()):
    """Host-loop thick-restart GKL.

    av(v, *op_args) = D v (domain -> range), ahv(u, *op_args) = D^dag u.
    Returns (sigma[n], U[n, ...range], V[n, ...domain], info).
    """
    if m < n + 3:
        raise ValueError(f"m={m} too small for n={n}")
    key = jax.random.PRNGKey(seed)
    shape = example_v.shape
    dtype = example_v.dtype
    rdt = jnp.finfo(dtype).dtype
    v = (jax.random.normal(key, shape, rdt)
         + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                  shape, rdt)).astype(dtype)
    v = v / _norm(v).astype(dtype)

    A = jax.jit(lambda x, *a: av(x, *a)) if op_args else jax.jit(av)
    Ah = jax.jit(lambda x, *a: ahv(x, *a)) if op_args else jax.jit(ahv)

    desc = which == "largest"
    info = {"matvecs": 0, "cycles": 0}

    # initial step: u_0 = normalize(D v_0)
    Vb = [v]
    u = A(v, *op_args)
    a0 = float(_norm(u))
    Ub = [u / jnp.asarray(a0, dtype)]
    info["matvecs"] += 1
    # projected matrix B[i, j] = <u_i, D v_j> (upper bidiagonal
    # between restarts; diag sigma + coupling column after a restart)
    B = np.zeros((m, m))
    B[0, 0] = a0
    k0 = 1          # filled columns

    for cycle in range(max_restarts):
        # extend the bidiagonalization to m columns
        for j in range(k0, m):
            # v_j = D^dag u_{j-1} - (previous terms); full reorth
            w = Ah(Ub[j - 1], *op_args)
            info["matvecs"] += 1
            w = _proj_out(w, Vb)
            b = float(_norm(w))
            v_j = w / jnp.asarray(max(b, 1e-300), dtype)
            Vb.append(v_j)
            B_col = b  # beta_{j-1}
            u_w = A(v_j, *op_args)
            info["matvecs"] += 1
            u_w = _proj_out(u_w, Ub)
            a = float(_norm(u_w))
            Ub.append(u_w / jnp.asarray(max(a, 1e-300), dtype))
            B[j - 1, j] = B_col
            B[j, j] = a

        P, S, Qt = np.linalg.svd(B[:m, :m])
        # np returns descending sigma
        order = np.arange(m) if desc else np.arange(m - 1, -1, -1)
        P, S, Qt = P[:, order], S[order], Qt[order, :]
        # residual bound per triplet: |beta_m * P[m-1, i]| with beta_m
        # the NEXT coupling; compute it from one extra half-step
        w = Ah(Ub[m - 1], *op_args)
        info["matvecs"] += 1
        w = _proj_out(w, Vb)
        beta_m = float(_norm(w))
        res = np.abs(beta_m * P[m - 1, :n])
        scale = max(S[0], S[-1], 1e-30)
        info["cycles"] = cycle + 1
        info["residual"] = float(res.max())
        info["relative_residual"] = float(res.max() / scale)
        if res.max() <= tol * scale or cycle == max_restarts - 1:
            Vm = jnp.stack(Vb[:m])
            Um = jnp.stack(Ub[:m])
            Vr = jnp.einsum("k...,ki->i...", Vm,
                            jnp.asarray(Qt.T[:, :n], dtype))
            Ur = jnp.einsum("k...,ki->i...", Um,
                            jnp.asarray(P[:, :n], dtype))
            info["converged"] = bool(res.max() <= tol * scale)
            return S[:n].copy(), Ur, Vr, info

        # thick restart: keep k = n + extras triplets + residual dir
        k = min(n + max(3, n // 2), m - 3)
        Vm = jnp.stack(Vb[:m])
        Um = jnp.stack(Ub[:m])
        Vk = jnp.einsum("k...,ki->i...", Vm,
                        jnp.asarray(Qt.T[:, :k], dtype))
        Uk = jnp.einsum("k...,ki->i...", Um,
                        jnp.asarray(P[:, :k], dtype))
        v_res = w / jnp.asarray(max(beta_m, 1e-300), dtype)
        rho_np = beta_m * np.asarray(P[m - 1, :k])
        Vb = [Vk[i] for i in range(k)] + [v_res]
        Ub = [Uk[i] for i in range(k)]
        B = np.zeros((m, m))
        B[:k, :k] = np.diag(S[:k])
        # coupling column: D^dag u_i = sigma_i v_i + rho_i v_res, so
        # <u_i, D v_res> = rho_i -> column k of B
        B[:k, k] = rho_np
        # u_{k} = D v_res - sum rho_i u_i ; alpha_k = |.|
        uw = A(v_res, *op_args)
        info["matvecs"] += 1
        uw = _proj_out(uw, Ub)
        a = float(_norm(uw))
        Ub.append(uw / jnp.asarray(max(a, 1e-300), dtype))
        B[k, k] = a
        k0 = k + 1

    raise RuntimeError("unreachable")


def svd_stag(lat, u, n: int, *, bc: str = "pppa", mass0: bool = True,
             **kw):
    """Lowest singular triplets of the staggered eo hopping block
    D_oe (even -> odd): sigma(D_oe) = |lambda(Dslash)| at m=0, the
    spectrum svdLanczos.nim targets for staggered overlap/low-mode
    studies.  Returns (sigma, U_odd, V_even, info)."""
    from ..physics import staggered as st
    s = st.new_stag_eo(lat, u, bc)

    def av(v):
        return st.dslash_eo(s, v, parity_out=1)

    def ahv(w):
        # (D_oe)^dag = -D_eo for the antihermitian staggered Dslash
        return -st.dslash_eo(s, w, parity_out=0)

    from ..ops import eo as eomod
    z = jnp.zeros(lat.vector_shape(), u.dtype)
    example, _ = eomod.pack(z, lat.nd)
    return svd_lanczos(av, ahv, example, n, **kw)


# --- device-resident driver --------------------------------------------------

def svd_lanczos_dev(av: Callable, ahv: Callable, example_v,
                    n: int, *, m: int = 30, max_restarts: int = 100,
                    tol: float = 1e-8, which: str = "smallest",
                    seed: int = 0, op_args=()):
    """Device-resident thick-restart GKL: one jit per restart cycle,
    one real-scalar fetch per cycle (tunnel discipline).

    State per cycle: Ub (m, *range), Vb (m+1, *domain), B (m, m).
    Masked classical Gram-Schmidt keeps shapes static inside the
    fori_loop; the small SVD runs on device (jnp.linalg.svd of the
    m x m projected matrix -- NOT a batched-over-sites call, so the
    (8,128) tile padding caveat does not apply).
    """
    if m < n + 3:
        raise ValueError(f"m={m} too small for n={n}")
    desc = which == "largest"
    vshape = tuple(example_v.shape)
    dtype = example_v.dtype
    rdt = jnp.finfo(dtype).dtype
    k = min(n + max(3, n // 2), m - 3)

    def _mgs(w, basis, nfill):
        """Project w out of basis rows [0, nfill) (masked, static)."""
        idx = jnp.arange(basis.shape[0])
        mask = (idx < nfill).astype(w.real.dtype)

        def pass_(w):
            c = jnp.sum(jnp.conj(basis) * w,
                        axis=tuple(range(1, basis.ndim)))
            c = c * mask.astype(c.dtype)
            return w - jnp.tensordot(c, basis, axes=1)

        return pass_(pass_(w))

    def extend(Ub, Vb, B, k0, args):
        def body(j, st_):
            Ub, Vb, B = st_
            w = ahv(Ub[j - 1], *args)
            w = _mgs(w, Vb, j)
            b = _norm(w)
            v_j = w / jnp.maximum(b, 1e-30).astype(dtype)
            Vb = Vb.at[j].set(v_j)
            uw = av(v_j, *args)
            uw = _mgs(uw, Ub, j)
            a = _norm(uw)
            Ub = Ub.at[j].set(uw / jnp.maximum(a, 1e-30).astype(dtype))
            B = B.at[j - 1, j].set(b.astype(B.dtype))
            B = B.at[j, j].set(a.astype(B.dtype))
            return Ub, Vb, B

        return jax.lax.fori_loop(k0, m, body, (Ub, Vb, B))

    def finish(Ub, Vb, B, args):
        P, S, Qt = jnp.linalg.svd(B)
        if not desc:
            P, S, Qt = P[:, ::-1], S[::-1], Qt[::-1, :]
        # next coupling: beta_m from one extra half step
        w = ahv(Ub[m - 1], *args)
        w = _mgs(w, Vb, m)
        beta_m = _norm(w)
        res = jnp.abs(beta_m * P[m - 1, :n])
        scale = jnp.maximum(jnp.maximum(S[0], S[-1]), 1e-30)
        sig = S[:n]
        Ur = jnp.einsum("k...,ki->i...", Ub,
                        P[:, :n].astype(dtype))
        Vr = jnp.einsum("k...,ki->i...", Vb[:m],
                        Qt.T[:, :n].astype(dtype))
        # restart state
        Uk = jnp.einsum("k...,ki->i...", Ub, P[:, :k].astype(dtype))
        Vk = jnp.einsum("k...,ki->i...", Vb[:m],
                        Qt.T[:, :k].astype(dtype))
        v_res = w / jnp.maximum(beta_m, 1e-30).astype(dtype)
        rho = (beta_m * P[m - 1, :k]).astype(B.dtype)
        Ub2 = jnp.zeros_like(Ub).at[:k].set(Uk)
        Vb2 = jnp.zeros_like(Vb).at[:k].set(Vk).at[k].set(v_res)
        uw = av(v_res, *args)
        uw = _mgs(uw, Ub2, k)
        a = _norm(uw)
        Ub2 = Ub2.at[k].set(uw / jnp.maximum(a, 1e-30).astype(dtype))
        B2 = jnp.zeros_like(B)
        B2 = B2.at[jnp.arange(k), jnp.arange(k)].set(
            S[:k].astype(B.dtype))
        B2 = B2.at[:k, k].set(rho)
        B2 = B2.at[k, k].set(a.astype(B.dtype))
        relres = (jnp.max(res) / scale).astype(jnp.float32)
        resabs = jnp.max(res).astype(jnp.float32)
        return Ub2, Vb2, B2, sig, Ur, Vr, relres, resabs

    @partial(jax.jit, static_argnums=(3,))
    def cycle(Ub, Vb, B, k0, *args):
        Ub, Vb, B = extend(Ub, Vb, B, k0, args)
        return finish(Ub, Vb, B, args)

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def init(*args):
        v = (jax.random.normal(key, vshape, rdt)
             + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                      vshape, rdt)).astype(dtype)
        v = v / _norm(v).astype(dtype)
        u0 = av(v, *args)
        a0 = _norm(u0)
        Ub = jnp.zeros((m,) + u0.shape, dtype).at[0].set(
            u0 / jnp.maximum(a0, 1e-30).astype(dtype))
        Vb = jnp.zeros((m + 1,) + vshape, dtype).at[0].set(v)
        B = jnp.zeros((m, m), rdt).at[0, 0].set(a0.astype(rdt))
        return Ub, Vb, B

    if max_restarts < 1:
        raise ValueError(f"max_restarts must be >= 1, got {max_restarts}")
    Ub, Vb, B = init(*op_args)
    info = {"cycles": 0, "matvecs": 1}
    pick = jax.jit(lambda a, i: a[i])
    relres = None
    k0 = 1
    for cycle_i in range(max_restarts):
        Ub, Vb, B, sig, Ur, Vr, rr, ra = cycle(Ub, Vb, B, k0, *op_args)
        info["matvecs"] += 2 * (m - k0) + 2
        info["cycles"] = cycle_i + 1
        relres = float(rr)           # ONE scalar fetch per cycle
        k0 = k + 1
        if relres <= tol:
            break
    info["residual"] = float(ra)
    info["relative_residual"] = relres
    info["converged"] = bool(relres <= tol)
    svals = np.array([float(pick(sig, i)) for i in range(n)])
    return svals, Ur, Vr, info
