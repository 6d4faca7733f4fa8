"""Production staggered eigensolver driver.

TPU-native replacement for the reference's ``hisqev.nim`` (753 LoC
staggered eigensolver driver: lowest-N eigenpairs of the even-odd
normal operator with residual reporting) and its PRIMME hookup
(qexPrimme.nim:59).  The engine is Chebyshev-filtered thick-restart
Lanczos (qex_tpu.eigens.chebyshev); this module provides the
lattice-facing composition: operator construction from a gauge field
(plain or fat+naik), spectral-window auto-calibration, the Dslash
singular values lambda_i = sqrt(eig_i), and grep-able EIGEN report
lines in the style of the reference's output.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..physics import staggered as st
from .chebyshev import eigs_filtered, estimate_spectral_range


@dataclasses.dataclass(frozen=True)
class EigResult:
    """Lowest-n spectrum of A = -D_eo D_oe (+ m^2 shift applied by the
    caller when needed): eigenvalues, Dslash singular values, true
    residuals, and solver statistics."""

    evals: np.ndarray        # eigenvalues of the mass-free normal op
    svals: np.ndarray        # sqrt(evals): |Dslash| singular values
    vecs: jax.Array          # (n, nc, *dims_h) even-site eigenvectors
    resids: np.ndarray       # true residuals |A v - theta v|
    info: dict


def _normal_op(lat: Lattice, u: jax.Array, bc: str, naik: bool,
               links=None) -> tuple[Callable, jax.Array, tuple]:
    """``links``: optional precomputed (fat, long) pair -- lets large
    volumes reuse gauge.fat7.hisq_links_lowmem output (the fused
    fattening exceeds one chip's HBM at 24^3x48+) and implies naik.

    Returns (op, example, op_args): the operator is called as
    ``op(v, *op_args)`` with the LINK ARRAYS as explicit arguments --
    on the tunneled TPU a closed-over array becomes a compile-time
    constant serialized into the remote-compile request (observed as
    HTTP 413 at 24^3x48); the eigensolver jits thread op_args through.
    """
    if links is not None:
        fat, long = links
        if jax.default_backend() != "cpu":
            # production fast/fused operator (stag_hmc routing: the
            # 16-term Pallas stencil on TPU), built INSIDE the jit
            # from the passed links, bracketed by layout converters so
            # callers keep the canonical eo layout
            from ..physics import stag_fast as sf
            from ..physics.stag_hmc import _fast3_ops

            def op(v, fat, long):
                s3 = st.new_stag3_eo(lat, fat, long)
                f3 = sf.new_fast3(s3)
                _ee, dd = _fast3_ops(f3)
                return sf.from_fast(dd(sf.to_fast(v, lat)), lat)
        else:
            def op(v, fat, long):
                s3 = st.new_stag3_eo(lat, fat, long)
                return st.d2dd3(s3, v, parity=0)
        op_args = (fat, long)
        dtype = fat.dtype
    elif naik:
        from ..gauge.fat7 import hisq_links
        g = st.phase_links(lat, u, bc)
        fat, long = hisq_links(lat, g)

        def op(v, fat, long):
            s3 = st.new_stag3_eo(lat, fat, long)
            return st.d2dd3(s3, v, parity=0)

        op_args = (fat, long)
        dtype = u.dtype
    else:
        def op(v, u):
            s = st.new_stag_eo(lat, u, bc)
            return st.d2dd(s, v, parity=0)

        op_args = (u,)
        dtype = u.dtype
    shape = (lat.nc,) + lat.dims[:-1] + (lat.dims[-1] // 2,)
    # abstract example: a real jnp.zeros here is an EAGER op, which
    # the axon-tunneled TPU cannot dispatch (CLAUDE.md); the solvers
    # only consume .shape/.dtype
    example = jax.ShapeDtypeStruct(shape, dtype)
    return op, example, op_args


def stag_eigs(lat: Lattice, u: jax.Array, n: int, *, bc: str = "pppa",
              naik: bool = False, degree: int = 24,
              tol: float = 1e-8, m: int | None = None,
              max_restarts: int = 60, seed: int = 0,
              links=None, verbose: bool = False,
              refine_iters: int = 0) -> EigResult:
    """Lowest-n eigenpairs of the staggered (or fat+naik HISQ) mass-free
    even-odd normal operator on gauge field ``u``.

    QEX parity: hisqev.nim's driver loop (operator setup, spectral
    bracket, filtered eigensolve, per-pair residual report).

    ``links``: precomputed (fat, long) HISQ links (e.g. from
    gauge.fat7.hisq_links_lowmem at volumes where the fused fattening
    does not fit); ``u`` may then be None.

    ``refine_iters > 0``: follow the Lanczos with that many
    deflated-inverse-iteration polish passes
    (eigens.refine.refine_inverse_dev) -- the tiny clustered Dirac
    low band is exactly the regime where subspace polish stalls and
    inverse iteration with the band Galerkin-deflated pays (the
    reference's PRIMME runs in f64, qexPrimme.nim:59; this is the
    f32-native route to that residual grade).
    """
    op, example, op_args = _normal_op(lat, u, bc, naik, links)
    evals, vecs, info = eigs_filtered(op, example, n, degree=degree,
                                      tol=tol, m=m,
                                      max_restarts=max_restarts,
                                      seed=seed, op_args=op_args)
    resids = info["true_residuals"]
    if refine_iters > 0:
        from .refine import refine_inverse_dev
        evals, vecs, resids, rinfo = refine_inverse_dev(
            op, vecs, op_args=op_args, iters=refine_iters)
        info = dict(info, refine=rinfo,
                    true_residuals=resids)
    svals = np.sqrt(np.maximum(evals, 0.0))
    if verbose:
        for i, (ev, sv, r) in enumerate(zip(evals, svals, resids)):
            print(f"EIGEN {i} ev {ev:.12g} sv {sv:.12g} resid {r:.3e}")
        print(f"EIGENinfo matvecs {info['matvecs_A']} "
              f"cycles {info['cycles']} window {info['window']}")
    return EigResult(evals, svals, vecs, resids, info)


def spectral_range_stag(lat: Lattice, u: jax.Array, mass: float, *,
                        bc: str = "pppa", naik: bool = False,
                        m: int = 30, links=None) -> tuple[float, float]:
    """(lo, hi) bracket of the SHIFTED normal operator m^2 - D_eo D_oe,
    for the rooted fermion's rational approximation interval
    (replacing the loose m^2 + nd^2 bound; QEX parity: hisqev-style
    bounds feeding mcmc/utilities/rational.nim table selection)."""
    op, example, op_args = _normal_op(lat, u, bc, naik, links)
    if jax.default_backend() != "cpu":
        from .chebyshev import estimate_spectral_range_dev
        lo, hi = estimate_spectral_range_dev(op, example, m=m,
                                             op_args=op_args)
    else:
        lo, hi = estimate_spectral_range(
            lambda v: op(v, *op_args), example, m=m)
    mm = mass * mass
    return max(mm, mm + lo), mm + hi


def deflation_basis(res: EigResult, mass: float
                    ) -> tuple[jax.Array, jax.Array]:
    """(evals + m^2, vecs) ready for solvers.deflate.deflated_cg on the
    shifted operator A(m) = m^2 - D_eo D_oe."""
    return (jnp.asarray(res.evals + mass * mass), res.vecs)
