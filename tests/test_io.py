"""I/O tests: LIME record round-trips, SciDAC gauge round-trips with
checksum verification, checkpoint resume.

Mirrors the reference's tgaugeio/tfieldio tests (SURVEY.md §4.1).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qex_tpu.lattice import Lattice
from qex_tpu.io import checkpoint as ckpt
from qex_tpu.io import lime
from qex_tpu.ops import group, linalg


@pytest.fixture
def lat():
    return Lattice((4, 4, 2, 6))


@pytest.fixture
def u(lat):
    key = jax.random.PRNGKey(51)
    return jnp.stack([group.random_su(jax.random.fold_in(key, i), lat.dims,
                                      lat.nc, jnp.complex128)
                      for i in range(lat.nd)])


def test_lime_roundtrip(tmp_path):
    p = str(tmp_path / "t.lime")
    recs = [lime.LimeRecord("first-rec", b"hello world"),
            lime.LimeRecord("second-rec", b"x" * 137),
            lime.LimeRecord("third-rec", b"")]
    lime.write_lime(p, recs)
    back = lime.read_lime(p)
    assert [r.type for r in back] == [r.type for r in recs]
    assert [r.data for r in back] == [r.data for r in recs]
    assert back[0].mb and back[-1].me
    # header size + padding discipline: file size is a multiple of 8
    assert os.path.getsize(p) % 8 == 0


def test_scidac_gauge_roundtrip_f64(tmp_path, lat, u):
    p = str(tmp_path / "gauge.scidac")
    lime.save_gauge(p, lat, u, precision="D")
    back = lime.load_gauge(p, lat)
    assert back.shape == lat.gauge_shape()
    assert np.abs(back - np.asarray(u)).max() < 1e-15


def test_scidac_gauge_roundtrip_f32(tmp_path, lat, u):
    p = str(tmp_path / "gauge32.scidac")
    lime.save_gauge(p, lat, u, precision="F")
    back = lime.load_gauge(p, lat)
    assert np.abs(back - np.asarray(u)).max() < 1e-6


def test_scidac_checksum_detects_corruption(tmp_path, lat, u):
    p = str(tmp_path / "gauge.scidac")
    lime.save_gauge(p, lat, u, precision="D")
    raw = bytearray(open(p, "rb").read())
    # flip one byte inside the binary payload (beyond the XML records)
    raw[len(raw) // 2] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic"):
        lime.load_gauge(p, lat)


def test_scidac_wrong_lattice_rejected(tmp_path, lat, u):
    p = str(tmp_path / "gauge.scidac")
    lime.save_gauge(p, lat, u, precision="D")
    with pytest.raises(ValueError, match="does not match"):
        lime.load_gauge(p, Lattice((4, 4, 4, 4)))


def test_lex_order_convention(tmp_path):
    """The binary site order must be x-fastest: site (1,0,0,0) is the
    second site record."""
    lat = Lattice((2, 2, 2, 2))
    nd, nc = lat.nd, lat.nc
    u = np.zeros(lat.gauge_shape(), np.complex128)
    # tag each site with its lex rank in the (0,0) matrix entry of mu=0
    for t in range(2):
        for z in range(2):
            for y in range(2):
                for x in range(2):
                    r = x + 2 * (y + 2 * (z + 2 * t))
                    u[0, 0, 0, x, y, z, t] = r
    p = str(tmp_path / "order.scidac")
    lime.save_gauge(p, lat, jnp.asarray(u), precision="D")
    recs = {r.type: r for r in lime.read_lime(p)}
    sites = np.frombuffer(recs["scidac-binary-data"].data,
                          ">c16").reshape(lat.volume, nd, nc, nc)
    tags = sites[:, 0, 0, 0].real.astype(int)
    assert list(tags) == list(range(lat.volume))


def test_checkpoint_roundtrip(tmp_path, lat, u):
    p = str(tmp_path / "ck")
    ckpt.save_checkpoint(p, u, {"seed": 7, "counter": 42}, traj=13)
    g, rng, traj = ckpt.load_checkpoint(p, lat, jnp.complex128)
    assert traj == 13
    assert rng == {"seed": 7, "counter": 42}
    assert float(linalg.norm2(g - u)) == 0.0


def test_modfile_roundtrip(tmp_path, lat, u):
    from qex_tpu.io import modfile
    p = str(tmp_path / "eigs.mod")
    w = modfile.ModFileWriter(p, userdata="<info>eigvecs</info>")
    vec = np.asarray(u[0])  # (nc, nc, *dims) as a stand-in field
    w.add_field(modfile.pack_key((0, 3)), lat, vec, precision="D")
    w.add(b"rawkey", b"hello-payload")
    w.close()
    r = modfile.ModFileReader(p)
    assert r.userdata == "<info>eigvecs</info>"
    assert modfile.unpack_key(modfile.pack_key((0, 3))) == (0, 3)
    back = r.read_field(modfile.pack_key((0, 3)), lat, (3, 3),
                        precision="D")
    assert np.abs(back - vec).max() < 1e-15
    assert r.read(b"rawkey", 13) == b"hello-payload"
    r.close()


def test_modfile_checksum_detects_corruption(tmp_path, lat, u):
    from qex_tpu.io import modfile
    p = str(tmp_path / "bad.mod")
    w = modfile.ModFileWriter(p)
    w.add(b"k", b"x" * 64)
    w.close()
    raw = bytearray(open(p, "rb").read())
    raw[-6] ^= 0xFF  # corrupt inside the map body
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="checksum|magic"):
        modfile.ModFileReader(p)


def test_timeslice_roundtrip(tmp_path, lat, u):
    from qex_tpu.io import timeslice
    p = str(tmp_path / "ts.bin")
    arr = np.asarray(u[1])  # (nc, nc, *dims)
    timeslice.write_timeslices(p, lat, arr, precision="D")
    for t in (0, lat.dims[-1] - 1):
        back = timeslice.read_timeslice(p, lat, (3, 3), t,
                                        precision="D")
        assert np.abs(back[..., 0] - arr[..., t]).max() < 1e-15


def test_file_lattice_and_lat_util(tmp_path):
    """file_lattice (getFileLattice role) + the checklat/fieldCmp
    utility app surface."""
    import jax.numpy as jnp

    from qex_tpu.apps import lat_util
    from qex_tpu.io import lime
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group

    lat = Lattice((4, 4, 4, 8))
    u = group.unit_gauge(lat, jnp.complex64)
    f1 = str(tmp_path / "a.lime")
    f2 = str(tmp_path / "b.lime")
    lime.save_gauge(f1, lat, u)
    lime.save_gauge(f2, lat, u + 1e-3 * jnp.ones_like(u))
    assert lime.file_lattice(f1) == (4, 4, 4, 8)
    assert lat_util.main(["check", f1]) == 0
    assert lat_util.main(["cmp", f1, f1]) == 0
    assert lat_util.main(["cmp", f1, f2]) == 1


def test_milc_roundtrip(tmp_path):
    """MILC single-file codec (src/new/milcIO.nim roles): round-trip,
    header dims, rotated-xor checksum detects corruption."""
    import jax

    from qex_tpu.io import milc
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group

    lat = Lattice((4, 4, 4, 8))
    u = np.asarray(jnp.stack([
        group.random_su(jax.random.PRNGKey(i), lat.dims, lat.nc,
                        jnp.complex64) for i in range(4)]))
    fn = str(tmp_path / "lat.milc")
    milc.save_milc(fn, lat, u, timestamp="Tue Aug 18 00:00:00 2026")
    arr, ts = milc.load_milc(fn)
    assert ts == "Tue Aug 18 00:00:00 2026"
    np.testing.assert_allclose(arr, u, atol=1e-7)
    # header-declared dims win
    assert milc.load_milc(fn, Lattice((4, 4, 4, 8)))[0].shape \
        == u.shape
    # corrupt one payload byte -> checksum must catch it
    blob = bytearray(open(fn, "rb").read())
    blob[200] ^= 0xFF
    fn2 = str(tmp_path / "bad.milc")
    open(fn2, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        milc.load_milc(fn2)
