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

# the shard_map kernel path ACROSS PROCESSES: ppermute halos ride the
# gRPC cross-process collectives (the multi-host analog of the
# reference's QMP halo channels, src/layout/shifts.nim:67-286)
import jax.numpy as jnp  # noqa: E402

from qex_tpu.ops import group, linalg  # noqa: E402
from qex_tpu.physics import stag_fast as sfst  # noqa: E402
from qex_tpu.physics import stag_pallas_hisq as sp3  # noqa: E402
from qex_tpu.physics import stag_shard as shrd  # noqa: E402
from qex_tpu.physics import staggered as stg  # noqa: E402

lm2 = dist.global_mesh(lat, rank_geom=(1, 1, 2, NPROC * 4 // 2))
key = jax.random.PRNGKey(7)  # identical links on every process
u = jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                               lat.nc, jnp.complex128)
               for i in range(lat.nd)])
s = stg.new_stag_eo(lat, u)
fs = sfst.new_fast(s)
ps = sp3.new_pallas_stag8(fs, links_dtype=jnp.float64)
le, lo = np.asarray(ps.l_e), np.asarray(ps.l_o)
xs_np = rng.normal(size=(2, 3, lat.dims[3] // 2, lat.dims[2],
                         lat.dims[1] * lat.dims[0]))

le_g = dist.make_global_field(lm2, lambda i: le[i], 0, le.shape,
                              np.float64, spec=shrd.links_spec(lm2))
lo_g = dist.make_global_field(lm2, lambda i: lo[i], 0, lo.shape,
                              np.float64, spec=shrd.links_spec(lm2))
xs_g = dist.make_global_field(lm2, lambda i: xs_np[i], 0, xs_np.shape,
                              np.float64, spec=shrd.vec_spec(lm2))
# multi-process rule: global arrays must be jit ARGUMENTS (a captured
# constant would need the full value on every process)
got_v = jax.jit(lambda a, b, v: shrd.d2ee_sharded(
    lm2, sp3.PallasStag3EO(lat, a, b), v, 0.1))(le_g, lo_g, xs_g)
# reference on process-local replicated arrays, then compare globally
xc = jnp.asarray(xs_np[0] + 1j * xs_np[1])
ref = sfst.d2ee_fast(fs, xc, 0.1)
ref_np = np.asarray(jnp.stack([jnp.real(ref), jnp.imag(ref)]))
ref_g = dist.make_global_field(lm2, lambda i: ref_np[i], 0,
                               ref_np.shape, np.float64,
                               spec=shrd.vec_spec(lm2))
dev = float(jax.jit(lambda a, b: linalg.norm2(a - b)
                    / linalg.norm2(b))(got_v, ref_g))
assert dev < 1e-28, dev
print(f"dist worker {PID}/{NPROC} stencil ok: dev={dev:.3e}", flush=True)

# cooperative single-file SciDAC IO (io/pario.py): 2 processes write
# ONE LIME file byte-identical to the single-process save_gauge, then
# read it back sharded with distributed checksum verification
# (reference src/io/parallelIo.nim:1-555)
from qex_tpu.io import lime, pario  # noqa: E402

u_np = np.asarray(u)  # (nd, nc, nc, *dims) complex128, same everywhere
lmio = dist.global_mesh(lat)
g_par = dist.make_global_field(lmio, lambda i: u_np[i], 3, u_np.shape,
                               np.complex128)
f_par = os.path.join(TMP, "par.lime")
pario.save_gauge_parallel(f_par, lat, g_par, precision="D")
multihost_utils.sync_global_devices("pario_saved")
if PID == 0:
    f_ser = os.path.join(TMP, "ser.lime")
    lime.save_gauge(f_ser, lat, u_np, precision="D")
    b_par = open(f_par, "rb").read()
    b_ser = open(f_ser, "rb").read()
    assert b_par == b_ser, (len(b_par), len(b_ser))
multihost_utils.sync_global_devices("pario_compared")
g_rt = pario.load_gauge_parallel(f_par, lat, lmio, dtype=np.complex128)
io_diff = float(norm2_sharded(lmio, jax.jit(lambda a, b: a - b)(
    g_rt, g_par)))
assert io_diff == 0.0, io_diff
print(f"dist worker {PID}/{NPROC} pario ok", flush=True)

print(f"dist worker {PID}/{NPROC} ok: norm2={got:.6e}", flush=True)
