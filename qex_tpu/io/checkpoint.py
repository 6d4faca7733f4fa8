"""Tri-part HMC checkpoint: gauge field + RNG state + chain state.

TPU-native replacement for QEX's checkpoint trio
(src/stagg_pv_hmc/staghmc_spv_init_and_io.nim:325-410: SciDAC gauge
file + per-site RNG field via QIO + serial-RNG binary stream; also
src/mcmc/utilities/readWrite.nim:13-46).

JAX's counter-based RNG collapses the "RNG field" to (seed, counter)
scalars (see qex_tpu.rng), so one .npz holds everything needed for an
EXACT Markov-chain resume.  SciDAC/LIME interchange with reference
files lives in qex_tpu.io.lime.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice

FORMAT_VERSION = 1


def save_checkpoint(path: str, u: jax.Array, rng_state: dict,
                    traj: int) -> None:
    """Write gauge + RNG + chain position; atomic rename."""
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        gauge=np.asarray(u),
        rng_state=json.dumps(rng_state),
        traj=np.int64(traj),
        version=np.int64(FORMAT_VERSION),
    )
    os.replace(tmp, path if path.endswith(".npz") else path + ".npz")


def load_checkpoint(path: str, lat: Lattice, dtype
                    ) -> tuple[jax.Array, dict, int]:
    """Read a checkpoint; returns (gauge, rng_state, traj)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        g = z["gauge"]
        if tuple(g.shape) != lat.gauge_shape():
            raise ValueError(
                f"checkpoint gauge shape {g.shape} != lattice "
                f"{lat.gauge_shape()}")
        rng_state = json.loads(str(z["rng_state"]))
        traj = int(z["traj"])
    return jnp.asarray(g, dtype), rng_state, traj
