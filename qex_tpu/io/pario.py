"""Cooperative single-file SciDAC parallel IO.

TPU-native replacement for QEX's parallelIo.nim:1-555 + iocommon.nim:
3-40: N processes cooperatively write/read ONE SciDAC-LIME file.  The
reference selects IO ranks and funnels data over QMP; here every
process writes its owned shard hyperrectangles directly into the
shared file at their lexicographic byte offsets (POSIX concurrent
non-overlapping writes via numpy memmaps), and the DML checksum -- an
XOR of per-site rotated CRCs, hence associative and partitionable --
is combined from per-process partials exactly as QIO's
DML_checksum_combine does.

Produces bytes IDENTICAL to the single-process ``lime.save_gauge``
(asserted by tests/test_pario.py with 2 OS processes), so files
interchange with the reference regardless of how many processes wrote
them.

Coordination uses ``multihost_utils.sync_global_devices`` barriers +
tiny per-process sidecar files for the checksum partials (gRPC
collectives carry no host bytes; the sidecars ride the shared
filesystem the single output file already requires).
"""

from __future__ import annotations

import os
import pathlib

import jax
import numpy as np

from ..lattice import Lattice
from .lime import (LIME_MAGIC, _CKSUM_XML, _HDR, _PRIV_FILE_XML,
                   _PRIV_REC_XML, _pad8, _rotl32)


def _pack_rec(rtype: str, data: bytes, mb: bool, me: bool) -> bytes:
    flags = ((1 if mb else 0) << 15) | ((1 if me else 0) << 14)
    return (_HDR.pack(LIME_MAGIC, 1, flags, len(data), rtype.encode())
            + data + b"\0" * _pad8(len(data)))


def _site_crcs(site_bytes: np.ndarray) -> np.ndarray:
    """Per-site crc32 of (n, bytes_per_site) uint8 rows."""
    from .native import _load
    import ctypes
    data = np.ascontiguousarray(site_bytes, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(data.shape[0], np.uint32)
        lib.site_crc32(data.ctypes.data_as(ctypes.c_void_p),
                       ctypes.c_uint64(data.shape[0]),
                       ctypes.c_uint64(data.shape[1]),
                       out.ctypes.data_as(
                           ctypes.POINTER(ctypes.c_uint32)))
        return out
    import zlib
    return np.array([zlib.crc32(r.tobytes()) & 0xFFFFFFFF
                     for r in data], np.uint32)


def _partial_checksum(site_bytes: np.ndarray, ranks: np.ndarray
                      ) -> tuple[int, int]:
    """DML partial over sites with explicit GLOBAL lexicographic ranks
    (QIO DML_checksum accumulation, parallelIo.nim crc machinery)."""
    crcs = _site_crcs(site_bytes)
    ranks = ranks.astype(np.uint32)
    suma = np.bitwise_xor.reduce(_rotl32(crcs, ranks % 29)) \
        if len(crcs) else np.uint32(0)
    sumb = np.bitwise_xor.reduce(_rotl32(crcs, ranks % 31)) \
        if len(crcs) else np.uint32(0)
    return int(suma), int(sumb)


def _barrier(tag: str) -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(f"qex_pario_{tag}")


def _combine_xor(path: str, tag: str, suma: int, sumb: int,
                 nonce: int = 0) -> tuple[int, int]:
    """All-process XOR of checksum partials via sidecar files + two
    barriers (QIO DML_checksum_combine role).

    ``nonce`` is any value all processes agree on BEFORE the barrier
    (the payload byte offset works) -- it keys the sidecar names so a
    crashed earlier call's stale sidecars can never be read by a later
    call on the same path; each process also removes its own sidecar
    in a finally (ADVICE r4)."""
    pid, nproc = jax.process_index(), jax.process_count()
    if nproc == 1:
        return suma, sumb
    stem = f"{path}.qexck_{tag}{nonce:x}_"
    side = pathlib.Path(f"{stem}{pid}")
    try:
        side.write_text(f"{suma:x} {sumb:x}")
        _barrier(f"{tag}_written")
        ga = gb = 0
        for r in range(nproc):
            a, b = pathlib.Path(f"{stem}{r}").read_text().split()
            ga ^= int(a, 16)
            gb ^= int(b, 16)
        _barrier(f"{tag}_read")
    finally:
        try:
            os.remove(side)
        except OSError:
            pass
    return ga, gb


def _norm_index(index, shape):
    return [slice(0 if sl.start is None else int(sl.start),
                  n if sl.stop is None else int(sl.stop))
            for sl, n in zip(index, shape)]


def _owned_shards(garr):
    """Addressable shards deduplicated by owner (lowest device id
    holding each distinct global slice) -- replicated slices are
    written/verified exactly once across the whole job."""
    shape = garr.shape
    dmap = garr.sharding.devices_indices_map(shape)
    key = lambda idx: tuple((s.start, s.stop)
                            for s in _norm_index(idx, shape))
    owner = {}
    for d in sorted(dmap, key=lambda d: d.id):
        owner.setdefault(key(dmap[d]), d.id)
    seen = set()
    for shard in garr.addressable_shards:
        k = key(shard.index)
        if owner[k] != shard.device.id or k in seen:
            continue
        seen.add(k)
        yield shard


def _block_ranks(lat: Lattice, lat_slices) -> np.ndarray:
    """Global lexicographic site ranks (x fastest) of a hyperrectangle,
    flattened in C order over (t, z, y, x) -- matching the row order
    of the block payload."""
    sx, sy, sz, st = lat_slices
    Lx, Ly, Lz, _ = lat.dims
    xs = np.arange(sx.start, sx.stop, dtype=np.int64)
    ys = np.arange(sy.start, sy.stop, dtype=np.int64)
    zs = np.arange(sz.start, sz.stop, dtype=np.int64)
    ts = np.arange(st.start, st.stop, dtype=np.int64)
    r = (((ts[:, None, None, None] * Lz + zs[None, :, None, None])
          * Ly + ys[None, None, :, None]) * Lx
         + xs[None, None, None, :])
    return r.ravel()


def _block_to_tzyx(data: np.ndarray, nd: int) -> np.ndarray:
    """(lead..., X, Y, Z, T) shard block -> (T, Z, Y, X, lead...)."""
    ndim = data.ndim
    lat_axes = list(range(ndim - nd, ndim))
    a = np.moveaxis(data, lat_axes, list(range(nd)))       # (x,y,z,t, lead)
    return np.transpose(a, axes=list(range(nd))[::-1]
                        + list(range(nd, ndim)))           # (t,z,y,x, lead)


def _gauge_layout(lat: Lattice, precision: str, file_xml: str,
                  record_xml: str, date: str):
    """Deterministic byte layout of the SciDAC gauge file: preamble
    records (identical to lime.save_gauge's), binary-record header,
    payload offset/length, checksum-record offset."""
    nd, nc = lat.nd, lat.nc
    esize = 8 if precision == "F" else 16
    bps = nd * nc * nc * esize
    typesize = nc * nc * esize
    pre = [
        ("scidac-private-file-xml", _PRIV_FILE_XML.format(
            nd=nd, dims=" ".join(str(d) for d in lat.dims)).encode()),
        ("scidac-file-xml", file_xml.encode()),
        ("scidac-private-record-xml", _PRIV_REC_XML.format(
            date=date, datatype=f"QDP_{precision}{nc}_ColorMatrix",
            prec=precision, nc=nc, typesize=typesize,
            count=nd).encode()),
        ("scidac-record-xml", record_xml.encode()),
    ]
    preamble = b"".join(_pack_rec(t, d, mb=(i == 0), me=False)
                        for i, (t, d) in enumerate(pre))
    payload_len = lat.volume * bps
    bin_hdr = _HDR.pack(LIME_MAGIC, 1, 0, payload_len,
                        b"scidac-binary-data")
    payload_off = len(preamble) + len(bin_hdr)
    cksum_off = payload_off + payload_len + _pad8(payload_len)
    return preamble, bin_hdr, payload_off, payload_len, cksum_off, bps


def save_gauge_parallel(path: str, lat: Lattice, garr,
                        precision: str = "F",
                        file_xml: str = "<title>qex_tpu gauge</title>",
                        record_xml: str = "<info>qex_tpu</info>",
                        date: str = "now") -> None:
    """All processes cooperatively write ONE SciDAC gauge file from a
    sharded global array (QEX parallelIo.nim single-file write).

    ``garr``: jax.Array of lat.gauge_shape(), sharded over lattice
    axes only (the canonical field sharding).  Byte-identical to
    ``lime.save_gauge`` of the gathered field.
    """
    nd, nc = lat.nd, lat.nc
    if nd != 4:
        raise ValueError("pario supports 4D lattices only "
                         f"(got nd={nd})")
    if tuple(garr.shape) != tuple(lat.gauge_shape()):
        raise ValueError(f"gauge shape {garr.shape} != "
                         f"{lat.gauge_shape()}")
    fdtype = ">c8" if precision == "F" else ">c16"
    (preamble, bin_hdr, payload_off, payload_len, cksum_off,
     bps) = _gauge_layout(lat, precision, file_xml, record_xml, date)
    if jax.process_index() == 0:
        with open(path, "wb") as f:
            f.write(preamble)
            f.write(bin_hdr)
            f.truncate(cksum_off)
    _barrier("save_pre")

    dims_rev = tuple(reversed(lat.dims))
    view = np.memmap(path, dtype=fdtype, mode="r+", offset=payload_off,
                     shape=dims_rev + (nd, nc, nc))
    suma = sumb = 0
    for shard in _owned_shards(garr):
        idx = _norm_index(shard.index, garr.shape)
        lead, lat_sl = idx[:-nd], idx[-nd:]
        if any(s.start != 0 or s.stop != n for s, n in
               zip(lead, garr.shape[:-nd])):
            raise ValueError("site-tensor (leading) axes must be "
                             "unsharded for single-file IO")
        blk = _block_to_tzyx(np.asarray(shard.data), nd)
        sx, sy, sz, st = lat_sl
        view[st, sz, sy, sx] = blk
        be = np.ascontiguousarray(blk.astype(fdtype))
        rows = be.view(np.uint8).reshape(-1, bps)
        a, b = _partial_checksum(rows, _block_ranks(lat, lat_sl))
        suma ^= a
        sumb ^= b
    view.flush()
    del view
    _barrier("save_payload")

    suma, sumb = _combine_xor(path, "save", suma, sumb,
                              nonce=payload_off)
    if jax.process_index() == 0:
        with open(path, "r+b") as f:
            f.seek(cksum_off)
            f.write(_pack_rec("scidac-checksum", _CKSUM_XML.format(
                suma=suma, sumb=sumb).encode(), mb=False, me=True))
    _barrier("save_done")


def _scan_records(path: str):
    """Header-only LIME scan: [(type, data_offset, length)] without
    reading payloads (the whole point of parallel reads)."""
    out = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        off = 0
        while off + 144 <= size:
            f.seek(off)
            hdr = f.read(144)
            magic, _ver, _flags, length, rtype = _HDR.unpack(hdr)
            if magic & 0xFFFFFFFF != LIME_MAGIC:
                raise ValueError(f"bad LIME magic at {off} in {path}")
            out.append((rtype.split(b"\0")[0].decode(), off + 144,
                        length))
            off += 144 + length + _pad8(length)
    return out


def load_gauge_parallel(path: str, lat: Lattice, lm,
                        dtype=None, verify: bool = True):
    """All processes cooperatively read ONE SciDAC gauge file into the
    canonical sharded global array (QEX parallelIo.nim single-file
    read): each process memmap-reads only the hyperrectangles its
    devices own, and the DML checksum is verified from per-process
    partials over the owner-deduplicated site partition.

    Returns a sharded jax.Array of lat.gauge_shape().
    """
    from ..parallel import distributed as dist

    nd, nc = lat.nd, lat.nc
    if nd != 4:
        raise ValueError("pario supports 4D lattices only "
                         f"(got nd={nd})")
    recs = _scan_records(path)
    by_type = {t: (o, n) for t, o, n in recs}
    bin_ = by_type.get("scidac-binary-data") \
        or by_type.get("ildg-binary-data")
    if bin_ is None:
        raise ValueError(f"no binary data record in {path}")
    off, nbytes = bin_
    n_elems = lat.volume * nd * nc * nc
    if nbytes == n_elems * 8:
        fdtype = ">c8"
    elif nbytes == n_elems * 16:
        fdtype = ">c16"
    else:
        raise ValueError(f"binary size {nbytes} does not match "
                         f"lattice {lat.dims}")
    bps = nbytes // lat.volume
    dims_rev = tuple(reversed(lat.dims))
    view = np.memmap(path, dtype=fdtype, mode="r", offset=off,
                     shape=dims_rev + (nd, nc, nc))
    out_dtype = dtype if dtype is not None else (
        "c8" if fdtype == ">c8" else "c16")

    def fill(index):
        idx = _norm_index(index, lat.gauge_shape())
        lead, lat_sl = idx[:-nd], idx[-nd:]
        sx, sy, sz, st = lat_sl
        sub = view[st, sz, sy, sx]                # (T,Z,Y,X,nd,nc,nc)
        a = np.transpose(sub, axes=(3, 2, 1, 0, 4, 5, 6))
        a = np.moveaxis(a, (4, 5, 6), (0, 1, 2))  # (nd,nc,nc,X,Y,Z,T)
        return a[tuple(lead)].astype(out_dtype)

    garr = dist.make_global_field(lm, fill, 3, lat.gauge_shape(),
                                  out_dtype)

    if verify and "scidac-checksum" in by_type:
        co, cn = by_type["scidac-checksum"]
        with open(path, "rb") as f:
            f.seek(co)
            ck = f.read(cn)
        import re
        m = re.search(rb"<suma>([0-9a-fA-F]+)</suma>", ck)
        m2 = re.search(rb"<sumb>([0-9a-fA-F]+)</sumb>", ck)
        if m and m2:
            suma = sumb = 0
            for shard in _owned_shards(garr):
                idx = _norm_index(shard.index, garr.shape)
                sx, sy, sz, st = idx[-nd:]
                # verify against the RAW file bytes of this shard's
                # region (independent of any dtype conversion above)
                sub = np.ascontiguousarray(view[st, sz, sy, sx])
                rows = sub.view(np.uint8).reshape(-1, bps)
                a, b = _partial_checksum(rows,
                                         _block_ranks(lat, idx[-nd:]))
                suma ^= a
                sumb ^= b
            suma, sumb = _combine_xor(path, "load", suma, sumb,
                                      nonce=off)
            want = (int(m.group(1), 16), int(m2.group(1), 16))
            if want != (suma, sumb):
                raise ValueError(
                    f"checksum mismatch in {path}: file "
                    f"({want[0]:#x}, {want[1]:#x}), computed "
                    f"({suma:#x}, {sumb:#x})")
    return garr
