"""Chiral condensate / scalar trace with noise sources and dilution.

TPU-native replacement for QEX's src/observables/scalarTrace.nim
(:48-165 -- disconnected scalar trace with Z4/Z2/U1/Gauss noise and
dilution) and src/algorithms/dilution.nim (:1-45 even-odd / corner
dilution iterators), plus the per-trajectory pbp measurement of
staghmc_spv_meas.nim.

Estimator: pbp = (1/V) E[ Re eta^dag D^{-1} eta ] over noise eta with
E[eta eta^dag] = I.  Dilution splits eta into orthogonal supports
(projections); solving each part separately removes the off-diagonal
stochastic noise within the diluted subspace.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from ..physics import stag_solve, staggered as st
from ..rng import gaussian_complex, u1_noise, z2_noise, z4_noise
from ..solvers.base import SolverParams

NOISES = {
    "z4": z4_noise,
    "z2": z2_noise,
    "u1": u1_noise,
    "gauss": lambda k, s, d: gaussian_complex(k, s, d)
             * 0.7071067811865476,
}


def dilution_masks(lat: Lattice, kind: str) -> list[jax.Array]:
    """Real 0/1 masks partitioning the lattice (sum of masks == 1).

    kinds: "none", "eo" (site parity), "corner3d" (8 spatial corners),
    "time" (per t-slice is intentionally NOT included -- use
    timeslices directly).  QEX parity: dilution.nim:1-45.
    """
    if kind == "none":
        return [jnp.ones(lat.dims, jnp.float32)]
    coords = []
    for mu in range(lat.nd):
        shape = [1] * lat.nd
        shape[mu] = lat.dims[mu]
        coords.append(jax.lax.broadcasted_iota(jnp.int32, tuple(shape), mu))
    if kind == "eo":
        par = sum(coords) % 2
        return [jnp.broadcast_to((par == p), lat.dims).astype(jnp.float32)
                for p in range(2)]
    if kind == "corner3d":
        masks = []
        for cx in range(2):
            for cy in range(2):
                for cz in range(2):
                    m = ((coords[0] % 2 == cx) & (coords[1] % 2 == cy)
                         & (coords[2] % 2 == cz))
                    masks.append(jnp.broadcast_to(m, lat.dims)
                                 .astype(jnp.float32))
        return masks
    raise ValueError(f"unknown dilution {kind!r}")


def pbp_staggered(key: jax.Array, lat: Lattice, u: jax.Array, m: float,
                  bc: str = "pppa", noise: str = "z4",
                  n_noise: int = 1, dilution: str = "none",
                  params: SolverParams = SolverParams()
                  ) -> jax.Array:
    """Stochastic psi-bar-psi = (1/V) tr D^{-1} for staggered D(m).

    QEX parity: staghmc_spv_meas pbp + scalarTrace options.  Returns
    the noise-averaged real estimate (per site, matching MEASpbp
    normalization up to the reference's flavor factors).
    """
    s = st.new_stag_eo(lat, u, bc)
    masks = dilution_masks(lat, dilution)
    total = 0.0
    for n in range(n_noise):
        eta = NOISES[noise](jax.random.fold_in(key, n),
                            lat.vector_shape(), u.dtype)
        for msk in masks:
            eta_d = eta * msk
            x, _ = stag_solve.solve(s, eta_d, m, params)
            total = total + jnp.real(linalg.dot(eta_d, x))
    return total / (n_noise * lat.volume)
