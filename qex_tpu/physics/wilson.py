"""Wilson Dirac operator and solver.

TPU-native replacement for QEX's src/physics/wilsonD.nim (699 LoC:
half-spinor projected hopping, eo-preconditioned ``wilsonD2ee`` :212,
``newWilson`` :288) and src/physics/wilsonSolve.nim (CG on the normal
operator).

Conventions
-----------
Euclidean hermitian gamma matrices in the chiral basis,
gamma5 = diag(1,1,-1,-1) = g0 g1 g2 g3; fields have shape
``(4, nc, *dims)`` (spin axis leading, then color).

    D psi(x) = (nd + m) psi(x)
             - 1/2 sum_mu [ (1 - g_mu) U_mu(x) psi(x+mu)
                          + (1 + g_mu) U_mu(x-mu)^dag psi(x-mu) ]

gamma5-hermiticity g5 D g5 = D^dag makes D^dag D hermitian positive
definite -- the CGNE target (QEX wilsonSolve parity).  The half-spinor
flop optimization of the reference (spproj/sprecon) is left to XLA
fusion: (1 +/- g_mu) has rank 2 but the fused elementwise form is
bandwidth-, not flop-, limited on TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lattice import Lattice
from ..ops import linalg
from ..ops.shifts import shift
from ..solvers import cg
from ..solvers.base import SolverParams, SolverStats
from .staggered import bc_signs

NS = 4


def gamma_matrices() -> np.ndarray:
    """(5, 4, 4) complex: g0..g3 (x,y,z,t) and g5, chiral basis."""
    i = 1j
    g0 = np.array([[0, 0, 0, i], [0, 0, i, 0],
                   [0, -i, 0, 0], [-i, 0, 0, 0]])
    g1 = np.array([[0, 0, 0, -1], [0, 0, 1, 0],
                   [0, 1, 0, 0], [-1, 0, 0, 0]])
    g2 = np.array([[0, 0, i, 0], [0, 0, 0, -i],
                   [-i, 0, 0, 0], [0, i, 0, 0]])
    g3 = np.array([[0, 0, 1, 0], [0, 0, 0, 1],
                   [1, 0, 0, 0], [0, 1, 0, 0]])
    g5 = np.diag([1, 1, -1, -1]).astype(complex)
    assert np.allclose(g0 @ g1 @ g2 @ g3, g5)
    return np.stack([g0, g1, g2, g3, g5])


def _spin_mul(mat: np.ndarray, psi: jax.Array) -> jax.Array:
    """Apply a 4x4 spin matrix to the leading spin axis."""
    m = jnp.asarray(mat, psi.dtype)
    return jnp.einsum("st,tc...->sc...", m, psi)


@dataclasses.dataclass(frozen=True)
class WilsonD:
    """Wilson operator data: BC-phased links + mass (QEX newWilson)."""

    lat: Lattice
    g: jax.Array        # (nd, nc, nc, *dims) phased links
    m: float


def new_wilson(lat: Lattice, u: jax.Array, m: float,
               bc: str = "pppa") -> WilsonD:
    rdtype = jnp.finfo(u.dtype).dtype
    sgn = bc_signs(lat, bc, rdtype)
    return WilsonD(lat, u * sgn[:, None, None], m)


def wilson_hop(w: WilsonD, psi: jax.Array) -> jax.Array:
    """The hopping term H psi = 1/2 sum_mu [(1-g)U psi(x+mu) +
    (1+g)U^dag psi(x-mu)] (no diagonal)."""
    lat = w.lat
    nd = lat.nd
    gams = gamma_matrices()
    out = None
    for mu in range(nd):
        fwd = jnp.einsum("ab...,sb...->sa...", w.g[mu],
                         shift(psi, mu, +1, nd))
        fwd = fwd - _spin_mul(gams[mu], fwd)
        tmp = jnp.einsum("ba...,sb...->sa...", jnp.conj(w.g[mu]), psi)
        bwd = shift(tmp, mu, -1, nd)
        bwd = bwd + _spin_mul(gams[mu], bwd)
        term = fwd + bwd
        out = term if out is None else out + term
    return 0.5 * out


def wilson_d(w: WilsonD, psi: jax.Array) -> jax.Array:
    """Full Wilson operator D(m) psi (QEX wilsonD convention: the
    diagonal is (nd + m))."""
    return (w.lat.nd + w.m) * psi - wilson_hop(w, psi)


def wilson_d_dag(w: WilsonD, psi: jax.Array) -> jax.Array:
    """D^dag via gamma5-hermiticity: D^dag = g5 D g5."""
    gams = gamma_matrices()
    return _spin_mul(gams[4], wilson_d(w, _spin_mul(gams[4], psi)))


def wilson_ddagd(w: WilsonD, psi: jax.Array) -> jax.Array:
    """Normal operator D^dag D (hermitian positive definite)."""
    return wilson_d_dag(w, wilson_d(w, psi))


def solve(w: WilsonD, b: jax.Array,
          params: SolverParams = SolverParams()
          ) -> tuple[jax.Array, SolverStats]:
    """Solve D x = b by CGNE: (D^dag D) x = D^dag b.

    QEX parity: wilsonSolve.nim:1-160 (CG on the normal op).
    ``params.backend == "mg"`` routes to the K-cycle-multigrid
    preconditioned GCR instead (QEX SolverParams.backend,
    solverBase.nim:14,50-53 -> mg/wilsonmg.nim:58-104).
    """
    if params.backend == "mg":
        x, stats, _ = solve_mg(w, b, params)
        return x, stats
    rhs = wilson_d_dag(w, b)
    op = partial(wilson_ddagd, w)
    return cg.cg_solve_restarted(op, rhs, r2req=params.r2req,
                                 maxits=params.maxits,
                                 restarts=params.restarts)


def solve_mg(w: WilsonD, b: jax.Array,
             params: SolverParams = SolverParams(),
             hierarchy=None):
    """Solve D x = b by K-cycle-multigrid-preconditioned GCR on D
    itself (no normal operator): the ``backend="mg"`` solve route.

    Returns (x, stats, hierarchy); pass ``hierarchy`` back in to reuse
    the adaptive setup across solves on the same gauge field (the
    reference rebuilds per solve in its prototype,
    mg/wilsonmg.nim:58-104 -- reuse is the production pattern).
    ``params.mg`` (solvers.base.MGParams) sets the cycle shape.
    """
    from ..mg.kcycle import mg_solve_kcycle
    from ..solvers.base import MGParams
    mp = params.mg if params.mg is not None else MGParams()
    op = partial(wilson_d, w)
    return mg_solve_kcycle(
        w.lat, op, b, nlevels=mp.nlevels, nvec=mp.nvec, bs=mp.bs,
        chiral=mp.chiral, r2req=params.r2req, m=mp.m,
        max_restarts=max(1, params.maxits // mp.m), seed=mp.seed,
        hierarchy=hierarchy, relax_iters=mp.relax_iters,
        smooth_iters=mp.smooth_iters, k_m=mp.k_m,
        bottom_iters=mp.bottom_iters, assemble=mp.assemble)


# --- even-odd preconditioning (QEX wilsonD2ee, wilsonD.nim:212) -------------

@dataclasses.dataclass(frozen=True)
class WilsonEO:
    """eo-packed Wilson operator: links per parity + diagonal a=nd+m."""

    lat: Lattice
    g_e: jax.Array
    g_o: jax.Array
    m: float

    @property
    def a(self) -> float:
        return self.lat.nd + self.m


def new_wilson_eo(lat: Lattice, u: jax.Array, m: float,
                  bc: str = "pppa") -> WilsonEO:
    from ..ops import eo as eomod
    w = new_wilson(lat, u, m, bc)
    ge, go = eomod.pack(w.g, lat.nd)
    return WilsonEO(lat, ge, go, m)


def wilson_hop_eo(w: WilsonEO, psi_src: jax.Array, parity_out: int
                  ) -> jax.Array:
    """Hopping term from parity 1-parity_out onto parity_out (packed
    spinors, shape (ns, nc, *dims_h))."""
    from ..ops import eo as eomod
    lat = w.lat
    nd = lat.nd
    gams = gamma_matrices()
    g_out = w.g_e if parity_out == 0 else w.g_o
    g_src = w.g_o if parity_out == 0 else w.g_e
    out = None
    for mu in range(nd):
        fwd = jnp.einsum("ab...,sb...->sa...", g_out[mu],
                         eomod.shift_eo(psi_src, mu, +1, parity_out, nd))
        fwd = fwd - _spin_mul(gams[mu], fwd)
        tmp = jnp.einsum("ba...,sb...->sa...", jnp.conj(g_src[mu]),
                         psi_src)
        bwd = eomod.shift_eo(tmp, mu, -1, parity_out, nd)
        bwd = bwd + _spin_mul(gams[mu], bwd)
        term = fwd + bwd
        out = term if out is None else out + term
    return 0.5 * out


def wilson_m_ee(w: WilsonEO, x_e: jax.Array) -> jax.Array:
    """Schur complement M = a - H_eo H_oe / a on even sites (the
    eo-preconditioned operator, QEX wilsonD2ee analog)."""
    t = wilson_hop_eo(w, x_e, parity_out=1)
    return w.a * x_e - wilson_hop_eo(w, t, parity_out=0) / w.a


def wilson_m_ee_dag(w: WilsonEO, x_e: jax.Array) -> jax.Array:
    """M^dag = g5 M g5 (gamma5-hermiticity survives eo reduction)."""
    g5 = gamma_matrices()[4]
    return _spin_mul(g5, wilson_m_ee(w, _spin_mul(g5, x_e)))


def solve_eo(w: WilsonEO, b: jax.Array,
             params: SolverParams = SolverParams()
             ) -> tuple[jax.Array, SolverStats]:
    """eo-preconditioned CGNE solve of D x = b (full-lattice b/x):
    M x_e = b_e + H_eo b_o / a on even sites, then
    x_o = (b_o + H_oe x_e) / a.  Halves the Krylov-space cost of the
    full-lattice CGNE (QEX wilsonSolve eo path).

    ``params.backend == "mg"``: dispatch to the K-cycle multigrid on
    the full (unreduced) operator -- the MG hierarchy is built on D,
    not the Schur complement (solverBase.nim backend switch).
    """
    from ..ops import eo as eomod
    lat = w.lat
    if params.backend == "mg":
        g = eomod.unpack(w.g_e, w.g_o, lat.nd)
        x, stats, _ = solve_mg(WilsonD(lat, g, w.m), b, params)
        return x, stats
    b_e, b_o = eomod.pack(b, lat.nd)
    if lat.nd == 4:
        # lane-packed half-spinor operator brackets the Krylov solve
        from . import stag_fast as sfst
        from . import wilson_fast as wfst
        fw = wfst.new_fast_wilson(w)
        bf_e = sfst.to_fast(b_e, lat)
        bf_o = sfst.to_fast(b_o, lat)
        rhs = bf_e + wfst.hop_fast(fw, bf_o, parity_out=0) / w.a
        rhs_n = wfst.m_ee_dag_fast(fw, rhs)
        op_true, floor = None, 1e-12
        if jax.default_backend() not in ("cpu",):
            from . import wilson_pallas as wpal
            if wpal.fits(lat):
                # fused 8-term spin-projected stencil kernel; one
                # full-Z block where VMEM fits (drops the z-neighbor
                # streams; exp_wilson2.py A/B 387.7 -> 402.8 GF/s f32)
                nzb = wpal.pick_nzb_auto(lat)
                pw = wpal.new_pallas_wilson(fw)
                op = lambda v: wpal._join(wpal.m_ee_dag_pallas(
                    pw, wpal.m_ee_pallas(pw, wpal._split(v), nzb=nzb),
                    nzb=nzb))
                if getattr(params, "sloppy", False):
                    # bf16-link inner iterations + f32 true-residual
                    # restarts (QEX sloppySolve; same recipe as the
                    # staggered solve_ee).  Since z-vectorization +
                    # full-Z streaming the kernel is DMA-bound, and
                    # bf16 links win the hop A/B 425-456 vs 388-403
                    # GF/s (exp_wilson2.py; the earlier VPU-bound
                    # finding predates the z-vectorized kernel).
                    nzbb = wpal.pick_nzb_auto(lat, jnp.bfloat16)
                    pwb = wpal.new_pallas_wilson(
                        fw, links_dtype=jnp.bfloat16)
                    op_true, floor = op, 1e-5
                    op = lambda v: wpal._join(wpal.m_ee_dag_pallas(
                        pwb, wpal.m_ee_pallas(pwb, wpal._split(v),
                                              nzb=nzbb), nzb=nzbb))
            else:
                op = lambda v: wfst.m_ee_dag_fast(fw,
                                                  wfst.m_ee_fast(fw, v))
        else:
            op = lambda v: wfst.m_ee_dag_fast(fw, wfst.m_ee_fast(fw, v))
        xf_e, stats = cg.cg_solve_restarted(op, rhs_n,
                                            r2req=params.r2req,
                                            maxits=params.maxits,
                                            restarts=params.restarts,
                                            op_true=op_true,
                                            inner_r2req_floor=floor)
        xf_o = (bf_o + wfst.hop_fast(fw, xf_e, parity_out=1)) / w.a
        return eomod.unpack(sfst.from_fast(xf_e, lat),
                            sfst.from_fast(xf_o, lat), lat.nd), stats
    rhs = b_e + wilson_hop_eo(w, b_o, parity_out=0) / w.a
    rhs_n = wilson_m_ee_dag(w, rhs)
    op = lambda v: wilson_m_ee_dag(w, wilson_m_ee(w, v))
    x_e, stats = cg.cg_solve_restarted(op, rhs_n, r2req=params.r2req,
                                       maxits=params.maxits,
                                       restarts=params.restarts)
    x_o = (b_o + wilson_hop_eo(w, x_e, parity_out=1)) / w.a
    return eomod.unpack(x_e, x_o, lat.nd), stats


def wilson_flops_per_site(nd: int = 4, nc: int = 3, ns: int = 4) -> int:
    """Reference-style flop model: per direction 2 color matvecs on
    half-spinors (2 spin components after projection) + spin
    reconstruction; QEX wilsonD.nim flop accounting analog."""
    cmv = 8 * nc * nc * (ns // 2) * 2      # two half-spinor matvecs
    proj = 4 * nc * ns                     # project + reconstruct adds
    return nd * (cmv + proj) + 2 * 2 * nc * ns
