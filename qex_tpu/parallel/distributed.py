"""Multi-process (multi-host) bootstrap + per-process shard IO.

TPU-native replacement for QEX's process bring-up and parallel file IO:
``QMP_init_msg_passing`` (reference src/comms/qmp.nim:40,
src/comms/commsQmp.nim:5-28) and the MPI parallel reader/writer
(src/comms/mpi.nim, src/io/parallelIo.nim).

On TPU pods each host runs one process owning its local chips;
``jax.distributed.initialize`` wires them into one global runtime so
``jax.devices()`` is the full pod and collectives ride ICI/DCN.  The
same code path runs multi-process on CPU (gRPC collectives), which is
how the smoke test exercises it (tests/test_distributed.py, the analog
of the reference CI's ``mpiexec -n 2``).

Checkpoint story: every process writes only its *addressable* shards
(`save_shards`) and reads them back by global slice key (`load_shards`),
so no host ever materializes the full array -- the analog of QIO
partfile IO (src/io/parallelIo.nim:15-42).
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding

from ..lattice import Lattice
from .mesh import LatticeMesh, make_lattice_mesh, field_spec


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids: Sequence[int] | None = None) -> None:
    """Bring up the global JAX runtime across processes.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) -- on Cloud TPU pods they are
    auto-detected and ``initialize()`` needs no arguments at all.
    QEX parity: qexInit -> QMP_init_msg_passing (qmp.nim:40).
    """
    kwargs = {}
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None:
        v = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(v) if v else None
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None:
        v = os.environ.get("JAX_PROCESS_ID")
        process_id = int(v) if v else None
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_mesh(lat: Lattice, rank_geom: Sequence[int] | None = None
                ) -> LatticeMesh:
    """LatticeMesh over ALL devices in the (possibly multi-process)
    runtime.  Same greedy rank split / ``-rankgeom:`` override as the
    single-process path."""
    return make_lattice_mesh(lat, devices=jax.devices(),
                             rank_geom=rank_geom)


def make_global_field(lm: LatticeMesh, fill, n_site_axes: int,
                      global_shape: tuple[int, ...],
                      dtype=jnp.complex64, spec=None) -> jax.Array:
    """Build a sharded global array from a callback.

    ``fill(index: tuple[slice,...]) -> np.ndarray`` returns the data of
    one global slice; each process only materializes its addressable
    shards.  This is the sharded-load analog of QIO's per-rank reads
    (src/io/parallelIo.nim).  ``spec`` overrides the canonical field
    PartitionSpec (e.g. stag_shard.links_spec for kernel link arrays).
    """
    sh = NamedSharding(lm.mesh, spec if spec is not None
                       else field_spec(lm, n_site_axes))
    return jax.make_array_from_callback(global_shape, sh,
                                        lambda idx: np.asarray(
                                            fill(idx), dtype=dtype))


def _slice_key(index: tuple, shape: tuple[int, ...]) -> str:
    """Stable filename key for a global index tuple."""
    parts = []
    for sl, n in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = n if sl.stop is None else int(sl.stop)
        parts.append(f"{start}-{stop}")
    return "_".join(parts)


def save_shards(path: str | os.PathLike, arr: jax.Array) -> None:
    """Write this process's addressable shards of ``arr`` to ``path``/.

    Layout: ``<path>/meta.json`` (shape/dtype, written by process 0) +
    one ``shard_<slicekey>.npy`` per distinct global slice.  Replicated
    shards are written once (by the first addressable device holding
    them on the lowest process)."""
    path = pathlib.Path(path)
    path.mkdir(parents=True, exist_ok=True)
    if jax.process_index() == 0:
        meta = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        (path / "meta.json").write_text(json.dumps(meta))
    seen = set()
    # devices_indices_map gives every device's slice; write only slices
    # whose OWNER (lowest device id holding it) is addressable here.
    dmap = arr.sharding.devices_indices_map(arr.shape)
    owner: dict[str, int] = {}
    for d in sorted(dmap, key=lambda d: d.id):
        key = _slice_key(dmap[d], arr.shape)
        owner.setdefault(key, d.id)
    for shard in arr.addressable_shards:
        key = _slice_key(shard.index, arr.shape)
        if owner[key] != shard.device.id or key in seen:
            continue
        seen.add(key)
        np.save(path / f"shard_{key}.npy", np.asarray(shard.data))


def load_shards(path: str | os.PathLike, lm: LatticeMesh,
                n_site_axes: int) -> jax.Array:
    """Read a `save_shards` checkpoint into the canonical sharding.

    Each process reads only the slices its devices need; re-sharding on
    load (different process/device count than at save) works as long as
    the requested slices are unions of saved ones -- the common case of
    SAME slicing is a direct per-file read, otherwise slices are
    assembled from the saved tiles."""
    path = pathlib.Path(path)
    meta = json.loads((path / "meta.json").read_text())
    shape = tuple(meta["shape"])
    dtype = np.dtype(meta["dtype"])
    files = {}
    for f in path.glob("shard_*.npy"):
        files[f.stem[len("shard_"):]] = f

    def fill(index):
        key = _slice_key(index, shape)
        if key in files:
            return np.load(files[key])
        # assemble from saved tiles covering this slice
        out = np.empty([sl.stop - sl.start for sl in
                        _norm_index(index, shape)], dtype)
        want = _norm_index(index, shape)
        for k, f in files.items():
            tile_slices = [tuple(map(int, p.split("-"))) for
                           p in k.split("_")]
            inter = []
            ok = True
            for (a, b), w in zip(tile_slices, want):
                lo, hi = max(a, w.start), min(b, w.stop)
                if lo >= hi:
                    ok = False
                    break
                inter.append((lo, hi, a, w.start))
            if not ok:
                continue
            data = np.load(f)
            src = tuple(slice(lo - a, hi - a)
                        for (lo, hi, a, _) in inter)
            dst = tuple(slice(lo - ws, hi - ws)
                        for (lo, hi, _, ws) in inter)
            out[dst] = data[src]
        return out

    sh = NamedSharding(lm.mesh, field_spec(lm, n_site_axes))
    return jax.make_array_from_callback(shape, sh, fill)


def _norm_index(index: tuple, shape: tuple[int, ...]) -> list[slice]:
    return [slice(0 if sl.start is None else int(sl.start),
                  n if sl.stop is None else int(sl.stop))
            for sl, n in zip(index, shape)]
