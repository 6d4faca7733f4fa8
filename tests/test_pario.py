"""Single-process checks of the cooperative single-file SciDAC IO
(io/pario.py): byte-identity with lime.save_gauge over the virtual
8-device mesh, sharded read-back, and checksum verification.  The
REAL 2-OS-process cooperative write/read is exercised by
tests/test_distributed.py (_dist_worker.py pario section).

Reference parity: src/io/parallelIo.nim:1-555, iocommon.nim:3-40.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.io import lime, pario
from qex_tpu.lattice import Lattice
from qex_tpu.ops import group, linalg
from qex_tpu.parallel import distributed as dist
from qex_tpu.parallel.mesh import make_lattice_mesh


@pytest.fixture
def system():
    lat = Lattice((4, 4, 4, 8))
    key = jax.random.PRNGKey(3)
    u = jnp.stack([group.random_unitary(jax.random.fold_in(key, i),
                                        lat.dims, lat.nc,
                                        jnp.complex128)
                   for i in range(lat.nd)])
    lm = make_lattice_mesh(lat)
    u_np = np.asarray(u)
    garr = dist.make_global_field(lm, lambda i: u_np[i], 3, u_np.shape,
                                  np.complex128)
    return lat, lm, u_np, garr


@pytest.mark.parametrize("precision", ["F", "D"])
def test_parallel_write_matches_serial(tmp_path, system, precision):
    lat, lm, u_np, garr = system
    f_par = str(tmp_path / "par.lime")
    f_ser = str(tmp_path / "ser.lime")
    pario.save_gauge_parallel(f_par, lat, garr, precision=precision)
    lime.save_gauge(f_ser, lat, u_np, precision=precision)
    assert open(f_par, "rb").read() == open(f_ser, "rb").read()
    # and the ordinary reader accepts it (checksum verified inside)
    back = lime.load_gauge(f_par, lat, dtype=np.complex128)
    tol = 0.0 if precision == "D" else 1e-7
    assert float(np.max(np.abs(back - u_np))) <= tol


def test_parallel_read_roundtrip(tmp_path, system):
    lat, lm, u_np, garr = system
    f = str(tmp_path / "g.lime")
    pario.save_gauge_parallel(f, lat, garr, precision="D")
    g2 = pario.load_gauge_parallel(f, lat, lm, dtype=np.complex128)
    assert g2.sharding == garr.sharding
    diff = float(jax.jit(lambda a, b: linalg.norm2(a - b))(g2, garr))
    assert diff == 0.0


def test_parallel_read_detects_corruption(tmp_path, system):
    lat, lm, u_np, garr = system
    f = str(tmp_path / "g.lime")
    pario.save_gauge_parallel(f, lat, garr, precision="D")
    recs = pario._scan_records(f)
    off = dict((t, o) for t, o, n in recs)["scidac-binary-data"]
    with open(f, "r+b") as fh:
        fh.seek(off + 123)
        b = fh.read(1)
        fh.seek(off + 123)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        pario.load_gauge_parallel(f, lat, lm)


def test_parallel_reads_reference_style_file(tmp_path, system):
    """A file written by the serial writer loads through the parallel
    reader (sharded) with identical data."""
    lat, lm, u_np, garr = system
    f = str(tmp_path / "ser.lime")
    lime.save_gauge(f, lat, u_np, precision="D")
    g2 = pario.load_gauge_parallel(f, lat, lm, dtype=np.complex128)
    diff = float(jax.jit(lambda a, b: linalg.norm2(a - b))(g2, garr))
    assert diff == 0.0
