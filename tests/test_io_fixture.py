"""Cross-implementation SciDAC/LIME proof (VERDICT.md item 9).

The file under test is constructed BY HAND here, straight from the
c-lime / QIO wire spec (reference src/io/qio.nim:89-132,
src/io/parallelIo.nim:15-42) with an INDEPENDENT checksum
implementation -- no qex_tpu.io code is used on the write side -- so
reading it with io/lime.py proves wire-format interchange, not
self-consistency.
"""

import struct
import zlib

import numpy as np
import pytest

from qex_tpu.io import lime
from qex_tpu.lattice import Lattice

DIMS = (4, 2, 2, 2)   # x, y, z, t


def _hand_record(rtype: bytes, payload: bytes, mb: int, me: int) -> bytes:
    # 144-byte header: >i magic, >H version, >H flags(MB<<15|ME<<14),
    # >Q length, 128-byte null-padded type (c-lime spec)
    hdr = struct.pack(">iHHQ", 0x456789AB - (1 << 32)
                      if 0x456789AB > 0x7FFFFFFF else 0x456789AB,
                      1, (mb << 15) | (me << 14), len(payload))
    hdr += rtype.ljust(128, b"\0")
    pad = (8 - len(payload) % 8) % 8
    return hdr + payload + b"\0" * pad


def _hand_checksum(payload: bytes, volume: int) -> tuple[int, int]:
    """Independent DML checksum: per-site crc32, xor of left-rotations
    by rank%29 / rank%31 (QIO DML spec)."""
    per = len(payload) // volume
    suma = sumb = 0
    for r in range(volume):
        crc = zlib.crc32(payload[r * per:(r + 1) * per]) & 0xFFFFFFFF
        ra, rb = r % 29, r % 31
        rota = ((crc << ra) | (crc >> (32 - ra))) & 0xFFFFFFFF if ra \
            else crc
        rotb = ((crc << rb) | (crc >> (32 - rb))) & 0xFFFFFFFF if rb \
            else crc
        suma ^= rota
        sumb ^= rotb
    return suma, sumb


def _build_file(path, corrupt: bool = False) -> np.ndarray:
    """Hand-write a SINGLEFILE SciDAC gauge config; returns the field
    in (nd, nc, nc, x, y, z, t) convention for comparison."""
    nd, nc = 4, 3
    X, Y, Z, T = DIMS
    vol = X * Y * Z * T
    # site-dependent, analytically known matrices:
    # U_mu(x,y,z,t)[a,b] = (site + 0.5 mu) + i (3a + b)
    field = np.zeros((nd, nc, nc) + DIMS, np.complex128)
    payload = bytearray()
    for t in range(T):
        for z in range(Z):
            for y in range(Y):
                for x in range(X):     # x fastest (QIO lex order)
                    site = x + X * (y + Y * (z + Z * t))
                    for mu in range(nd):
                        for a in range(nc):
                            for b in range(nc):
                                val = complex(site + 0.5 * mu,
                                              3 * a + b)
                                field[mu, a, b, x, y, z, t] = val
                                payload += struct.pack(">ff", val.real,
                                                       val.imag)
    payload = bytes(payload)
    suma, sumb = _hand_checksum(payload, vol)
    if corrupt:
        payload = payload[:100] + bytes([payload[100] ^ 0xFF]) \
            + payload[101:]
    ck = (f'<?xml version="1.0"?><scidacChecksum><version>1.0'
          f"</version><suma>{suma:x}</suma><sumb>{sumb:x}</sumb>"
          "</scidacChecksum>").encode()
    pf = (f'<?xml version="1.0"?><scidacFile><version>1.1</version>'
          f"<spacetime>4</spacetime><dims>{X} {Y} {Z} {T} </dims>"
          "<volfmt>0</volfmt></scidacFile>").encode()
    with open(path, "wb") as f:
        f.write(_hand_record(b"scidac-private-file-xml", pf, 1, 0))
        f.write(_hand_record(b"scidac-file-xml", b"<title>t</title>",
                             0, 0))
        f.write(_hand_record(b"scidac-binary-data", payload, 0, 0))
        f.write(_hand_record(b"scidac-checksum", ck, 0, 1))
    return field


def test_read_hand_built_scidac(tmp_path):
    fn = str(tmp_path / "hand.lime")
    ref = _build_file(fn)
    lat = Lattice(DIMS)
    got = lime.load_gauge(fn, lat, dtype=np.complex128)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-6)


def test_checksum_rejects_corruption(tmp_path):
    fn = str(tmp_path / "bad.lime")
    _build_file(fn, corrupt=True)
    lat = Lattice(DIMS)
    with pytest.raises(ValueError, match="checksum"):
        lime.load_gauge(fn, lat)


def test_writer_checksum_matches_independent(tmp_path):
    """save_gauge's DML checksum (incl. the native C++ fast path)
    agrees with the independent per-site implementation here."""
    import re
    rng = np.random.default_rng(7)
    lat = Lattice(DIMS)
    u = (rng.normal(size=lat.gauge_shape())
         + 1j * rng.normal(size=lat.gauge_shape()))
    fn = str(tmp_path / "ours.lime")
    lime.save_gauge(fn, lat, u, precision="D")
    recs = {r.type: r for r in lime.read_lime(fn)}
    payload = recs["scidac-binary-data"].data
    suma, sumb = _hand_checksum(payload, lat.volume)
    m = re.search(rb"<suma>([0-9a-f]+)</suma>",
                  recs["scidac-checksum"].data)
    m2 = re.search(rb"<sumb>([0-9a-f]+)</sumb>",
                   recs["scidac-checksum"].data)
    assert int(m.group(1), 16) == suma
    assert int(m2.group(1), 16) == sumb
