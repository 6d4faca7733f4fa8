"""Lane-packed fast-layout Wilson operator with half-spinor projection.

TPU-performance variant of qex_tpu.physics.wilson's eo operator, the
same two transformations that made the staggered hot path fast:

* **Lane packing** (stag_fast layout): spinors (ns, nc, Th, Z, Y*X),
  minor axis Y*X fills all 128 vector lanes (canonical eo leaves the
  minor axis at Th).
* **Half-spinor projection** (QEX ``spproj/sprecon``,
  src/physics/wilsonD.nim and spinOld.nim): (1 -+ gamma_mu) has rank
  2, so each direction needs only TWO 3x3 color matvecs instead of
  four.  The projector pair is obtained numerically at trace time from
  the exact eigendecomposition (1 -+ g) = B B^dag with B (4, 2) -- no
  hand-coded per-gamma kernels to get wrong; numerically identical to
  the reference's explicit spin projections.

Semantics equal to wilson.wilson_hop_eo / wilson_m_ee (tested in
tests/test_wilson.py).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..ops import linalg
from . import stag_fast as sf
from . import wilson as wl


@lru_cache(maxsize=None)
def _half_basis(mu: int, sign: int) -> np.ndarray:
    """B with (1 - sign*gamma_mu) = B @ B^dag, B shape (4, 2)."""
    g = wl.gamma_matrices()[mu]
    a = np.eye(4, dtype=complex) - sign * np.asarray(g)
    w, v = np.linalg.eigh(a)
    cols = np.argsort(w)[-2:]          # the two eigenvalue-2 directions
    return v[:, cols] * np.sqrt(w[cols])[None, :]


@dataclasses.dataclass(frozen=True)
class FastWilsonEO:
    """Fast-layout eo Wilson operator (links per parity, diag a=nd+m)."""

    lat: Lattice
    g_e: jax.Array   # (nd, nc, nc, Th, Z, Y*X)
    g_o: jax.Array
    m: float

    @property
    def a(self) -> float:
        return self.lat.nd + self.m


def new_fast_wilson(w: wl.WilsonEO) -> FastWilsonEO:
    if w.lat.nd != 4:
        raise ValueError("fast path requires nd=4")
    return FastWilsonEO(w.lat, sf.to_fast(w.g_e, w.lat),
                        sf.to_fast(w.g_o, w.lat), w.m)


def _spin(mat: np.ndarray, psi: jax.Array) -> jax.Array:
    return jnp.einsum("st,tc...->sc...", jnp.asarray(mat, psi.dtype),
                      psi)


def _mv2(g: jax.Array, h: jax.Array) -> jax.Array:
    """Apply the 3x3 color matrix field to a (2, nc, ...) half-spinor
    (loop-expanded on TPU via linalg.mv)."""
    return jnp.stack([linalg.mv(g, h[0]), linalg.mv(g, h[1])])


def _mv2_an(g: jax.Array, h: jax.Array) -> jax.Array:
    return jnp.stack([linalg.mv_an(g, h[0]), linalg.mv_an(g, h[1])])


def hop_fast(w: FastWilsonEO, psi_src: jax.Array, parity_out: int
             ) -> jax.Array:
    """Hopping term onto ``parity_out`` in the fast layout:
    1/2 sum_mu [(1-g_mu) U psi(x+mu) + (1+g_mu) U(x-mu)^dag psi(x-mu)]
    computed through rank-2 half-spinors."""
    lat = w.lat
    g_out = w.g_e if parity_out == 0 else w.g_o
    g_src = w.g_o if parity_out == 0 else w.g_e
    out = None
    for mu in range(4):
        bf = _half_basis(mu, +1)       # (1 - g) = bf bf^dag
        bb = _half_basis(mu, -1)       # (1 + g) = bb bb^dag
        # forward: bf (U_mu(x) (bf^dag psi)(x+mu))
        h = _spin(bf.conj().T, sf.shift_fast(psi_src, mu, +1,
                                             parity_out, lat))
        fwd = _spin(bf, _mv2(g_out[mu], h))
        # backward: bb (U_mu(x-mu)^dag (bb^dag psi)(x-mu))
        t = _mv2_an(g_src[mu], _spin(bb.conj().T, psi_src))
        bwd = _spin(bb, sf.shift_fast(t, mu, -1, parity_out, lat))
        term = fwd + bwd
        out = term if out is None else out + term
    return 0.5 * out


def m_ee_fast(w: FastWilsonEO, x_e: jax.Array) -> jax.Array:
    """Schur complement M = a - H_eo H_oe / a (wilson.wilson_m_ee)."""
    t = hop_fast(w, x_e, parity_out=1)
    return w.a * x_e - hop_fast(w, t, parity_out=0) / w.a


def m_ee_dag_fast(w: FastWilsonEO, x_e: jax.Array) -> jax.Array:
    g5 = wl.gamma_matrices()[4]
    return _spin(g5, m_ee_fast(w, _spin(g5, x_e)))
