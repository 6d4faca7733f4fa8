"""Sharded (multi-chip) staggered hot path: shard_map + halo fixups
around the fused Pallas kernel.

Why this module exists: the GSPMD path (qex_tpu.parallel.mesh) shards
the XLA fast-layout operator automatically, but a ``pl.pallas_call`` is
an opaque custom call XLA cannot partition -- the production v3 kernel
(qex_tpu.physics.stag_pallas3) only runs multi-chip under an explicit
``shard_map``.  This module is that path.

The v3 kernel computes one parity hop with LOCAL-periodic psi rolls;
its pre-shifted links are plain site-local fields built once by global
shifts (GSPMD makes those boundary-correct at setup).  So the ONLY
error of running the kernel per shard is the wrapped psi plane at each
local z/t boundary, and the exact surface correction is

    hop_true(x) = hop_local(x)
                + sum_{sharded mu} link_mu * (psi_halo - psi_wrap) |_{boundary planes}

one ``lax.ppermute`` per (direction, sign) carrying a single
(3, *, YX) plane.  This is the TPU-native analog of the reference's
start -> interior -> boundary ShiftB pipeline
(/root/reference/src/physics/stagD.nim:349-396): XLA overlaps the
ppermute with the kernel's DMA-bound interior, and the fixup touches
only surface sites (~2/L of the volume per sharded direction).

Layout/mesh contract (documented; asserted):
* fast layout (2, 3, Th, Z, Y*X): x and y live in the merged minor
  axis, so the rank geometry must leave them UNSHARDED -- shard z
  (mesh axis ax2) and t (ax3) only.  Use
  ``make_lattice_mesh(lat, rank_geom=(1, 1, gz, gt))``.
* local Z extent even (parity safety of the kernel's in-block
  (x+y+z) masks; guaranteed by parallel.mesh.partition_geom).

The local single-hop implementation is pluggable: the Pallas kernel on
TPU (or interpret mode), and an exact jnp mirror everywhere (used by
the CPU test mesh and as executable documentation of the kernel's
semantics).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..lattice import Lattice
from ..parallel.mesh import LatticeMesh
from . import stag_fast as sf
from . import stag_pallas_hisq as sph
from .stag_pallas import _join, _split


def _mesh_info(lm: LatticeMesh):
    names = lm.mesh.axis_names
    sizes = [lm.mesh.shape[a] for a in names]
    if len(names) != 4:
        raise ValueError("sharded fast path requires a 4D lattice mesh")
    if sizes[0] != 1 or sizes[1] != 1:
        raise ValueError(
            f"rank geometry {tuple(sizes)} shards x/y; the fast layout's"
            " minor axis is merged Y*X -- use rank_geom=(1,1,gz,gt)")
    return names, sizes


def local_lattice(lat: Lattice, sizes) -> Lattice:
    X, Y, Z, T = lat.dims
    if (Z // sizes[2]) % 2 != 0:
        raise ValueError("local Z extent must be even")
    return Lattice((X, Y, Z // sizes[2], T // sizes[3]))


# --- link/vector shardings ---------------------------------------------------

def links_spec(lm: LatticeMesh) -> P:
    """PartitionSpec of the term-major s8 link array
    (8, 2, 3, 3, Th, Z, YX): Th rides ax3, Z rides ax2 (ax0/ax1 are
    size 1 and folded in to keep every mesh axis accounted for) --
    the same layout as the 16-term HISQ array (links3_spec)."""
    n = lm.mesh.axis_names
    return P(None, None, None, None, (n[3],), (n[2], n[1], n[0]), None)


def vec_spec(lm: LatticeMesh) -> P:
    """PartitionSpec of a split-real fast vector (2, 3, Th, Z, YX)."""
    n = lm.mesh.axis_names
    return P(None, None, (n[3],), (n[2], n[1], n[0]), None)


def shard_links(lm: LatticeMesh, l: jax.Array) -> jax.Array:
    return jax.device_put(l, NamedSharding(lm.mesh, links_spec(lm)))


def shard_vec(lm: LatticeMesh, v: jax.Array) -> jax.Array:
    return jax.device_put(v, NamedSharding(lm.mesh, vec_spec(lm)))


# --- local single-hop implementations ---------------------------------------
#
# One generic set serves both the 8-term (s8, plain staggered) and the
# 16-term (HISQ fat+naik) kernels: the term count is inferred from the
# link array's leading axis, exactly as stag_pallas_hisq does.

# --- the surface fixup -------------------------------------------------------

def _pshift(a: jax.Array, axis_name, from_next: bool, n: int) -> jax.Array:
    """Receive a's value from the next (+1) or previous (-1) shard."""
    if from_next:
        perm = [(i, (i - 1) % n) for i in range(n)]
    else:
        perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.lax.ppermute(a, axis_name, perm)


# --- sharded operators -------------------------------------------------------

def d2ee_sharded(lm: LatticeMesh, ps, x_split: jax.Array, m: float,
                 use_pallas=None, interpret: bool = False) -> jax.Array:
    """(m^2 - D_eo D_oe) x on the sharded mesh via two corrected hops.

    ``ps`` holds GLOBAL term-major s8 links (build with
    stag_pallas_hisq.new_pallas_stag8 under jit on sharded inputs);
    x_split is a split-real fast vector.  Jit the caller; arrays should
    carry links_spec/vec_spec shardings.
    """
    names, sizes = _mesh_info(lm)
    lat_l = local_lattice(lm.lat, sizes)
    impl = _pick_impl3(use_pallas, interpret, lat_l)

    def body(l_e, l_o, x):
        t = _hop3_body(lat_l, names, sizes, impl, l_o, x, 1)
        y = _hop3_body(lat_l, names, sizes, impl, l_e, t, 0)
        return (m * m) * x - y

    fn = shard_map(body, mesh=lm.mesh,
                   in_specs=(links_spec(lm), links_spec(lm), vec_spec(lm)),
                   out_specs=vec_spec(lm),
                   check_vma=False)
    return fn(ps.l_e, ps.l_o, x_split)


def d2dd_sharded(lm: LatticeMesh, ps, x_split: jax.Array,
                 parity: int = 0, use_pallas=None,
                 interpret: bool = False) -> jax.Array:
    """Mass-free normal operator -D D on the sharded mesh
    (multishift base)."""
    names, sizes = _mesh_info(lm)
    lat_l = local_lattice(lm.lat, sizes)
    impl = _pick_impl3(use_pallas, interpret, lat_l)

    def body(l_e, l_o, x):
        lo_first = l_o if parity == 0 else l_e
        lo_second = l_e if parity == 0 else l_o
        t = _hop3_body(lat_l, names, sizes, impl, lo_first, x, 1 - parity)
        return -_hop3_body(lat_l, names, sizes, impl, lo_second, t, parity)

    fn = shard_map(body, mesh=lm.mesh,
                   in_specs=(links_spec(lm), links_spec(lm), vec_spec(lm)),
                   out_specs=vec_spec(lm),
                   check_vma=False)
    return fn(ps.l_e, ps.l_o, x_split)


# --- complex-vector op factories (the _fast_ops analog for a mesh) ----------

def _rdt(v):
    return jnp.finfo(v.dtype).dtype


def mesh_usable(lm: LatticeMesh | None, lat: Lattice,
                naik: bool = False) -> bool:
    """True when the shard_map kernel path supports this mesh/lattice:
    x/y unsharded, even local Z, packed-t divisible; dist-3 (naik)
    additionally needs local Z >= 3 and local Th >= 2."""
    if lm is None or lat.nd != 4:
        return False
    sizes = [lm.mesh.shape[a] for a in lm.mesh.axis_names]
    if sizes[0] != 1 or sizes[1] != 1:
        return False
    if lat.dims[2] % sizes[2] or (lat.dims[2] // sizes[2]) % 2:
        return False
    if (lat.dims[3] // 2) % sizes[3]:
        return False
    if naik:
        if lat.dims[2] // sizes[2] < 3:
            return False
        if (lat.dims[3] // 2) // sizes[3] < 2:
            return False
    return True


def ops8(lm: LatticeMesh, fs, links_dtype=None, use_pallas=None,
         interpret: bool = False):
    """(d2ee(v, m), d2dd(v)) on COMPLEX fast-layout vectors through the
    shard_map kernel path -- drop-in for the single-device operator
    callables in the solve drivers (stag_hmc._fast_ops role)."""
    if links_dtype is None:
        links_dtype = (jnp.float32 if jax.default_backend() == "tpu"
                       else None)
    lat = fs.lat

    def mk(ld):
        p = sph.new_pallas_stag8(fs, links_dtype=ld)
        return sph.PallasStag3EO(lat, shard_links(lm, p.l_e),
                                 shard_links(lm, p.l_o))

    ps = mk(links_dtype if links_dtype is not None else jnp.float64)

    def ee(v, m):
        y = d2ee_sharded(lm, ps, _split(v, _rdt(v)), m,
                         use_pallas=use_pallas, interpret=interpret)
        return (y[0] + 1j * y[1]).astype(v.dtype)

    def dd(v):
        y = d2dd_sharded(lm, ps, _split(v, _rdt(v)), 0,
                         use_pallas=use_pallas, interpret=interpret)
        return (y[0] + 1j * y[1]).astype(v.dtype)

    return ee, dd


def ops16(lm: LatticeMesh, f3, links_dtype=None, use_pallas=None,
          interpret: bool = False):
    """(d2ee3(v, m), d2dd3(v)) on COMPLEX fast-layout vectors through
    the sharded 16-term HISQ kernel (stag_hmc._fast3_ops role)."""
    from . import stag_pallas_hisq as sph

    if links_dtype is None:
        links_dtype = (jnp.float32 if jax.default_backend() == "tpu"
                       else None)
    lat = f3.lat
    p = sph.new_pallas_hisq(
        f3, links_dtype=(links_dtype if links_dtype is not None
                         else jnp.float64))
    ps = sph.PallasStag3EO(lat, shard_links3(lm, p.l_e),
                           shard_links3(lm, p.l_o))

    def ee(v, m):
        y = d2ee3_sharded(lm, ps, _split(v, _rdt(v)), m,
                          use_pallas=use_pallas, interpret=interpret)
        return (y[0] + 1j * y[1]).astype(v.dtype)

    def dd(v):
        y = d2dd3_sharded(lm, ps, _split(v, _rdt(v)), 0,
                          use_pallas=use_pallas, interpret=interpret)
        return (y[0] + 1j * y[1]).astype(v.dtype)

    return ee, dd


# --- fat + naik (HISQ) 16-term sharded operator ------------------------------
#
# Same structure for the stag_pallas_hisq kernel: local-periodic 16-term
# hop + surface fixups.  dist-3 hops need 3-plane z halos and 2-plane
# packed-t halos, so the local extents must satisfy Z_local >= 3 (even,
# so effectively >= 4) and Th_local >= 2 -- asserted here; these match
# the kernel's own geometry constraints (stag_pallas_hisq.fits).

def _check_local3(lat_l: Lattice):
    if lat_l.dims[2] < 3:
        raise ValueError("sharded HISQ path needs local Z extent >= 3")
    if lat_l.dims[3] < 4:
        raise ValueError("sharded HISQ path needs local Th extent >= 2")


def hop3_ref(lat_l: Lattice, l: jax.Array, x_split: jax.Array,
             parity_out: int) -> jax.Array:
    """jnp mirror of stag_pallas_hisq._hisq_kernel on one local block.

    l: (nterms, 2, 3, 3, Th, Z, YX) term-major links, term =
    kind*4 + mu with kind 0/1 = fat fwd/bwd (dist 1), 2/3 = long
    fwd/bwd (dist 3); nterms = 8 is the plain staggered (s8) operator.
    """
    xc = (x_split[0] + 1j * x_split[1])
    out = None
    for term in range(l.shape[0]):
        kind, mu = divmod(term, 4)
        sgn = +1 if kind in (0, 2) else -1
        d = 1 if kind < 2 else 3
        lk = (l[term, 0] + 1j * l[term, 1]).astype(xc.dtype)
        xs = sf.shift_fast(xc, mu, sgn, parity_out, lat_l, dist=d)
        t = jnp.einsum("abtzk,btzk->atzk", lk, xs)
        out = t if out is None else out + t
    return jnp.stack([jnp.real(out), jnp.imag(out)]).astype(x_split.dtype)


def _hop3_pallas(lat_l: Lattice, l: jax.Array, x_split: jax.Array,
                 parity_out: int, interpret: bool) -> jax.Array:
    from . import stag_pallas_hisq as sph
    ps = sph.PallasStag3EO(lat_l, l, l)
    return sph.dslash_pallas_hisq(ps, x_split.astype(jnp.float32),
                                  parity_out, interpret=interpret)


def hop3_fix(lat_l: Lattice, l: jax.Array, x_split: jax.Array,
             parity_out: int, out: jax.Array, names, sizes) -> jax.Array:
    """Exact boundary correction for the local-periodic 16-term hop.

    Fixes terms 2/6 (fat z), 10/14 (long z, 3-plane halos), 3/7
    (fat t), 11/15 (long t: packed th moves by 1 or 2 under the eo
    parity select, stag_fast.shift_fast dist=3 logic).  With an 8-term
    (s8) link array only the fat terms exist and the halo slabs are a
    single plane.
    """
    naik = l.shape[0] == 16
    zs = 3 if naik else 1      # z slab depth
    ts = 2 if naik else 1      # packed-t slab depth
    X = lat_l.dims[0]
    Zl = x_split.shape[-2]
    Thl = x_split.shape[-3]
    xc = (x_split[0] + 1j * x_split[1])          # (3, Th, Z, YX)
    cdt = xc.dtype

    def lkc(term, *idx):
        v = l[(term, slice(None)) + idx]          # (2, 3, 3, ...)
        return (v[0] + 1j * v[1]).astype(cdt)

    def addc(o, idx, val):
        return o.at[(0,) + idx].add(jnp.real(val).astype(o.dtype)) \
                .at[(1,) + idx].add(jnp.imag(val).astype(o.dtype))

    if sizes[2] > 1:
        # one zs-plane slab each way serves dist 1 (and dist 3)
        lo = xc[:, :, 0:zs]                       # (3, Th, zs, YX)
        hi = xc[:, :, Zl - zs:Zl]
        d_lo = _pshift(lo, names[2], True, sizes[2]) - lo
        d_hi = _pshift(hi, names[2], False, sizes[2]) - hi
        # fat z fwd (term 2) at plane Zl-1 <- delta plane 0
        out = addc(out, (slice(None), slice(None), Zl - 1),
                   jnp.einsum("abtk,btk->atk",
                              lkc(2, slice(None), slice(None),
                                  slice(None), Zl - 1), d_lo[:, :, 0]))
        # fat z bwd (term 6) at plane 0 <- delta plane Zl-1
        out = addc(out, (slice(None), slice(None), 0),
                   jnp.einsum("abtk,btk->atk",
                              lkc(6, slice(None), slice(None),
                                  slice(None), 0), d_hi[:, :, zs - 1]))
        if naik:
            # long z fwd (term 10): planes Zl-3..Zl-1 <- deltas 0..2
            out = addc(out, (slice(None), slice(None), slice(Zl - 3, Zl)),
                       jnp.einsum("abtzk,btzk->atzk",
                                  lkc(10, slice(None), slice(None),
                                      slice(None), slice(Zl - 3, Zl)),
                                  d_lo))
            # long z bwd (term 14): planes 0..2 <- deltas Zl-3..Zl-1
            out = addc(out, (slice(None), slice(None), slice(0, 3)),
                       jnp.einsum("abtzk,btzk->atzk",
                                  lkc(14, slice(None), slice(None),
                                      slice(None), slice(0, 3)), d_hi))

    if sizes[3] > 1:
        yx = jax.lax.broadcasted_iota(jnp.int32, (Zl, x_split.shape[-1]), 1)
        zg = jax.lax.broadcasted_iota(jnp.int32, (Zl, x_split.shape[-1]), 0)
        s_par = ((parity_out + yx % X + yx // X + zg) % 2) == 1
        # ts-plane packed-t slabs each way serve dist 1 (and dist 3)
        lo = xc[:, 0:ts]                          # (3, ts, Z, YX)
        hi = xc[:, Thl - ts:Thl]
        d_lo = _pshift(lo, names[3], True, sizes[3]) - lo
        d_hi = _pshift(hi, names[3], False, sizes[3]) - hi
        z = jnp.zeros_like(d_lo[:, 0])

        def fix_t(term, th_out, delta):
            return addc(out, (slice(None), th_out),
                        jnp.einsum("abzk,bzk->azk",
                                   lkc(term, slice(None), slice(None),
                                       th_out), delta))

        # fat t fwd (term 3): psi(x+t) = sel(s, psi[th+1], psi[th]);
        # wrapped only at th = Thl-1 where s holds
        out = fix_t(3, Thl - 1, jnp.where(s_par, d_lo[:, 0], z))
        # fat t bwd (term 7): sel(s, psi[th], psi[th-1]); th = 0, !s
        out = fix_t(7, 0, jnp.where(s_par, z, d_hi[:, ts - 1]))
        if naik:
            # long t fwd (term 11): sel(s, psi[th+2], psi[th+1])
            out = fix_t(11, Thl - 1,
                        jnp.where(s_par, d_lo[:, 1], d_lo[:, 0]))
            out = fix_t(11, Thl - 2, jnp.where(s_par, d_lo[:, 0], z))
            # long t bwd (term 15): sel(s, psi[th-1], psi[th-2])
            out = fix_t(15, 0, jnp.where(s_par, d_hi[:, 1], d_hi[:, 0]))
            out = fix_t(15, 1, jnp.where(s_par, z, d_hi[:, 1]))
    return out


def links3_spec(lm: LatticeMesh) -> P:
    """PartitionSpec of the HISQ term-major link array
    (16, 2, 3, 3, Th, Z, YX)."""
    n = lm.mesh.axis_names
    return P(None, None, None, None, (n[3],), (n[2], n[1], n[0]), None)


def shard_links3(lm: LatticeMesh, l: jax.Array) -> jax.Array:
    return jax.device_put(l, NamedSharding(lm.mesh, links3_spec(lm)))


def _pick_impl3(use_pallas, interpret, lat_l=None):
    if use_pallas is None:
        from . import stag_pallas_hisq as sph
        use_pallas = (jax.default_backend() == "tpu"
                      and (lat_l is None or sph.fits(lat_l)))
    if use_pallas:
        return partial(_hop3_pallas, interpret=interpret)
    return hop3_ref


def _hop3_body(lat_l, names, sizes, impl, l, x_split, parity_out):
    y = impl(lat_l, l, x_split, parity_out)
    return hop3_fix(lat_l, l, x_split, parity_out, y, names, sizes)


def d2ee3_sharded(lm: LatticeMesh, ps, x_split: jax.Array, m: float,
                  use_pallas=None, interpret: bool = False) -> jax.Array:
    """(m^2 - D_eo D_oe) for the fat+naik operator on the sharded mesh.

    ``ps`` is a stag_pallas_hisq.PallasStag3EO with global term-major
    links (shard with shard_links3)."""
    names, sizes = _mesh_info(lm)
    lat_l = local_lattice(lm.lat, sizes)
    _check_local3(lat_l)
    impl = _pick_impl3(use_pallas, interpret, lat_l)

    def body(l_e, l_o, x):
        t = _hop3_body(lat_l, names, sizes, impl, l_o, x, 1)
        y = _hop3_body(lat_l, names, sizes, impl, l_e, t, 0)
        return (m * m) * x - y

    fn = shard_map(body, mesh=lm.mesh,
                   in_specs=(links3_spec(lm), links3_spec(lm),
                             vec_spec(lm)),
                   out_specs=vec_spec(lm),
                   check_vma=False)
    return fn(ps.l_e, ps.l_o, x_split)


def d2dd3_sharded(lm: LatticeMesh, ps, x_split: jax.Array,
                  parity: int = 0, use_pallas=None,
                  interpret: bool = False) -> jax.Array:
    """Mass-free fat+naik normal operator on the sharded mesh
    (HISQ multishift base)."""
    names, sizes = _mesh_info(lm)
    lat_l = local_lattice(lm.lat, sizes)
    _check_local3(lat_l)
    impl = _pick_impl3(use_pallas, interpret, lat_l)

    def body(l_e, l_o, x):
        lo_first = l_o if parity == 0 else l_e
        lo_second = l_e if parity == 0 else l_o
        t = _hop3_body(lat_l, names, sizes, impl, lo_first, x, 1 - parity)
        return -_hop3_body(lat_l, names, sizes, impl, lo_second, t, parity)

    fn = shard_map(body, mesh=lm.mesh,
                   in_specs=(links3_spec(lm), links3_spec(lm),
                             vec_spec(lm)),
                   out_specs=vec_spec(lm),
                   check_vma=False)
    return fn(ps.l_e, ps.l_o, x_split)


def solve_multi_sharded(lm: LatticeMesh, s3, b_e: jax.Array,
                        masses, params=None, use_pallas=None,
                        interpret: bool = False, links_dtype=None):
    """Sharded HISQ multi-mass even-site solve (multishift CG on the
    sharded 16-term kernel operator) -- the config-5 hot path
    (BASELINE.md: 32^4x64 HISQ multi-mass CG on a multi-chip mesh).

    ``s3`` is a staggered.Staggered3EO / stag_fast.FastStag3EO with
    global (optionally sharded) links; returns canonical-layout
    solutions."""
    from ..solvers import cgm
    from ..solvers.base import SolverParams
    from . import stag_pallas_hisq as sph

    params = params or SolverParams()
    lat = lm.lat
    if links_dtype is None:
        links_dtype = (jnp.float32 if jax.default_backend() == "tpu"
                       else jnp.finfo(b_e.dtype).dtype)
    ps = sph.new_pallas_hisq(s3, links_dtype=links_dtype)
    ps = sph.PallasStag3EO(lat, shard_links3(lm, ps.l_e),
                           shard_links3(lm, ps.l_o))
    bf = shard_vec(lm, _split(sf.to_fast(b_e, lat),
                              jnp.finfo(b_e.dtype).dtype))
    base = partial(d2dd3_sharded, lm, ps, parity=0,
                   use_pallas=use_pallas, interpret=interpret)
    shifts = [m * m for m in masses]
    xs, stats = cgm.cg_multishift(base, bf, shifts, r2req=params.r2req,
                                  maxits=params.maxits)
    out = [sf.from_fast((x[0] + 1j * x[1]).astype(b_e.dtype), lat)
           for x in xs]
    return out, stats


def solve_ee_sharded(lm: LatticeMesh, s, b_e: jax.Array, m: float,
                     params=None, use_pallas=None, interpret=False,
                     links_dtype=None):
    """Even-site CG solve with the sharded kernel operator.

    ``s`` is a StaggeredEO with (optionally sharded) eo-packed links;
    b_e an eo-packed even rhs.  Returns (x_e, stats) in the canonical
    layout.  The CG level runs at the global-array level (reductions
    become XLA all-reduces); only the operator is shard_mapped.
    """
    from ..solvers import cg
    from ..solvers.base import SolverParams

    params = params or SolverParams()
    lat = lm.lat
    fs = sf.new_fast(s) if not isinstance(s, sf.FastStagEO) else s
    if links_dtype is None:
        # the kernel wants f32; the jnp mirror keeps full precision
        links_dtype = (jnp.float32 if jax.default_backend() == "tpu"
                       else jnp.finfo(b_e.dtype).dtype)
    ps = sph.new_pallas_stag8(fs, links_dtype=links_dtype)
    ps = sph.PallasStag3EO(lat, shard_links(lm, ps.l_e),
                           shard_links(lm, ps.l_o))
    bf = shard_vec(lm, _split(sf.to_fast(b_e, lat),
                              jnp.finfo(b_e.dtype).dtype))
    op = partial(d2ee_sharded, lm, ps, m=m, use_pallas=use_pallas,
                 interpret=interpret)
    xf, stats = cg.cg_solve_restarted(op, bf, r2req=params.r2req,
                                      maxits=params.maxits,
                                      restarts=params.restarts)
    xc = (xf[0] + 1j * xf[1]).astype(b_e.dtype)  # keep full precision
    return sf.from_fast(xc, lat), stats
