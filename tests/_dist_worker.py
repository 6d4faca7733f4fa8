"""Worker for tests/test_distributed.py: one of N processes in a
multi-process CPU runtime (the reference CI's ``mpiexec -n 2`` analog,
reference runtests.sh:3-5)."""

import os
import sys

PID, NPROC, PORT, TMP, REPO = (int(sys.argv[1]), int(sys.argv[2]),
                               sys.argv[3], sys.argv[4], sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from qex_tpu.lattice import Lattice  # noqa: E402
from qex_tpu.parallel import distributed as dist  # noqa: E402
from qex_tpu.parallel.halo import norm2_sharded  # noqa: E402

dist.initialize(coordinator_address=f"localhost:{PORT}",
                num_processes=NPROC, process_id=PID)
assert jax.process_count() == NPROC, jax.process_count()
assert len(jax.devices()) == 4 * NPROC, jax.devices()
assert dist.is_distributed()

lat = Lattice((8, 8, 8, 8))
lm = dist.global_mesh(lat)

# deterministic global data, identical on every process
rng = np.random.default_rng(42)
full = (rng.normal(size=(3,) + lat.dims)
        + 1j * rng.normal(size=(3,) + lat.dims))
x = dist.make_global_field(lm, lambda idx: full[idx], 1, full.shape,
                           np.complex128)

# cross-process global reduction (psum over gRPC collectives)
got = float(norm2_sharded(lm, x))
ref = float(np.sum(np.abs(full) ** 2))
assert abs(got - ref) < 1e-9 * ref, (got, ref)

# per-process shard checkpoint round-trip
ckpt = os.path.join(TMP, "ckpt")
dist.save_shards(ckpt, x)
multihost_utils.sync_global_devices("ckpt_written")
y = dist.load_shards(ckpt, lm, 1)
diff = float(norm2_sharded(lm, jax.jit(lambda a, b: a - b)(y, x)))
assert diff == 0.0, diff

print(f"dist worker {PID}/{NPROC} ok: norm2={got:.6e}", flush=True)
