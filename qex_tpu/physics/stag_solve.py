"""Staggered solve drivers.

TPU-native replacement for QEX's src/physics/stagSolve.nim (even-odd
reduction ``solveEO/solveEE/solveOO`` :17-140, outer defect-correction
driver ``solve`` :224-296, multi-mass ``solveXX`` :296-460).

The full operator is D(m) = m + Dslash with anti-hermitian Dslash, so in
even/odd block form

    [ m     D_eo ] [x_e]   [b_e]
    [ D_oe  m    ] [x_o] = [b_o],      D_eo^dag = -D_oe.

Eliminating x_o gives the hermitian positive-definite normal system on
even sites

    (m^2 - D_eo D_oe) x_e = m b_e - D_eo b_o,

solved by CG (qex_tpu.solvers.cg), then x_o = (b_o - D_oe x_e)/m.
"""

from __future__ import annotations

from functools import partial

import jax

from ..ops import eo, linalg
from ..solvers import cg
from ..solvers.base import SolverParams, SolverStats
from . import staggered as st


def _use_pallas(lat) -> bool:
    """Route through the fused Pallas stencil kernel on TPU when the
    geometry satisfies the kernel constraints (even packable T; the
    streamed s8/HISQ kernel falls back to one full-Z block when Z is
    not divisible by the default z-block)."""
    if jax.default_backend() in ("cpu",):
        return False
    from . import stag_pallas_hisq as sph
    return sph.fits(lat)


def solve_ee(s: st.StaggeredEO, b_e: jax.Array, m: float,
             params: SolverParams = SolverParams()
             ) -> tuple[jax.Array, SolverStats]:
    """Solve (m^2 - D_eo D_oe) x_e = b_e on even sites (QEX solveEE).

    4D lattices route through the lane-packed fast layout
    (qex_tpu.physics.stag_fast, ~3x on TPU); the conversion transposes
    bracket the whole Krylov solve, not each iteration.
    """
    if s.lat.nd == 4:
        import jax.numpy as jnp

        from . import stag_fast as sf
        fs = sf.new_fast(s)
        bf = sf.to_fast(b_e, s.lat)
        op_true = None
        floor = 1e-12
        from . import stag_shard as sh
        if sh.mesh_usable(params.mesh, s.lat):
            # explicit shard_map kernel route (multi-chip Pallas;
            # SolverParams.mesh = the QEX backend-switch analog)
            ee, _ = sh.ops8(params.mesh, fs)
            op = lambda v: ee(v, m)
            if params.sloppy and jax.default_backend() == "tpu":
                eeb, _ = sh.ops8(params.mesh, fs,
                                 links_dtype=jnp.bfloat16)
                op_true, floor = op, 1e-5
                op = lambda v: eeb(v, m)
            xf, stats = cg.cg_solve_restarted(
                op, bf, r2req=params.r2req, maxits=params.maxits,
                restarts=params.restarts, op_true=op_true,
                inner_r2req_floor=floor)
            return sf.from_fast(xf, s.lat), stats
        if _use_pallas(s.lat):
            # s8: the z-vectorized streamed 8-term kernel
            # (stag_pallas_hisq.new_pallas_stag8) -- measured fastest
            # at every volume in BOTH precisions (32^4: 448/641 GF/s
            # f32/bf16 vs v3's 438/610; 24^4: 263/323 vs v1's 155/133,
            # exp_s8.py same-process A/Bs), with no YX % 128 or
            # full-Z VMEM-fit constraint.
            from . import stag_pallas_hisq as sph
            if params.sloppy:
                # bf16-link inner iterations + f32 true-residual
                # restarts; inner tolerance pinned at the bf16 noise
                # floor so no iterations stall (measured: FEWER total
                # iterations than pure f32 at equal true residual)
                op_true = partial(sf.d2ee_fast, fs, m=m)
                floor = 1e-5
                psb = sph.new_pallas_stag8(fs,
                                           links_dtype=jnp.bfloat16)
                op = lambda v: sph._join(
                    sph.d2ee_pallas_hisq(psb, sph._split(v), m))
            else:
                ps = sph.new_pallas_stag8(fs)
                op = lambda v: sph._join(
                    sph.d2ee_pallas_hisq(ps, sph._split(v), m))
        else:
            op = partial(sf.d2ee_fast, fs, m=m)
        xf, stats = cg.cg_solve_restarted(op, bf, r2req=params.r2req,
                                          maxits=params.maxits,
                                          restarts=params.restarts,
                                          op_true=op_true,
                                          inner_r2req_floor=floor)
        return sf.from_fast(xf, s.lat), stats
    op = partial(st.d2ee, s, m=m)
    return cg.cg_solve_restarted(op, b_e, r2req=params.r2req,
                                 maxits=params.maxits,
                                 restarts=params.restarts)


def solve_eo(s: st.StaggeredEO, b_e: jax.Array, b_o: jax.Array, m: float,
             params: SolverParams = SolverParams()
             ) -> tuple[jax.Array, jax.Array, SolverStats]:
    """Solve D(m) x = b given packed rhs; returns (x_e, x_o, stats).

    QEX parity: stagSolve ``solveEO`` :17-140 + outer restart driver
    :224-296 (the restart lives inside cg_solve_restarted).
    """
    rhs = m * b_e - st.dslash_eo(s, b_o, parity_out=0)
    x_e, stats = solve_ee(s, rhs, m, params)
    x_o = st.reconstruct_odd(s, x_e, b_o, m)
    return x_e, x_o, stats


def solve(s: st.StaggeredEO, b: jax.Array, m: float,
          params: SolverParams = SolverParams()
          ) -> tuple[jax.Array, SolverStats]:
    """Solve D(m) x = b for a full-lattice rhs ``b`` (shape (nc, *dims)).

    Packs to even/odd, runs the eo-reduced CG, unpacks the solution.
    """
    nd = s.lat.nd
    b_e, b_o = eo.pack(b, nd)
    x_e, x_o, stats = solve_eo(s, b_e, b_o, m, params)
    return eo.unpack(x_e, x_o, nd), stats


def solve_multi(s: st.StaggeredEO, b_e: jax.Array, masses: list[float],
                params: SolverParams = SolverParams()
                ) -> tuple[list[jax.Array], SolverStats]:
    """Multi-mass even-site solve: (m_i^2 - D_eo D_oe) x_i = b_e for all i.

    QEX parity: stagSolve ``solveXX``/``solve(seq)`` :296-460 backed by
    multishift CG (solvers/cgm.nim) -- one Krylov space, all masses.
    """
    from ..solvers import cgm

    shifts = [m * m for m in masses]
    if s.lat.nd == 4:
        import jax.numpy as jnp

        from . import stag_fast as sf
        fs = sf.new_fast(s)
        base_sloppy = None
        # Mixed-precision multishift is profitable ONLY when every
        # shift satisfies the iterative-refinement criterion
        # eps_sloppy * kappa(A + sigma) < 1 (eps_bf16 ~ 3.9e-3,
        # lambda_max(-D_eo D_oe) <= 16): below it the per-shift sloppy
        # refinement stalls and the f32 closure re-does the work
        # (measured 0.69x at 32^4 masses 0.025-0.2, exp_msloppy.py).
        # Single-mass solves restart and stay profitable at much
        # lighter masses (solve_ee handles those).
        sloppy_ok = min(shifts) >= 2 * 3.9e-3 * 16
        from . import stag_shard as sh
        if sh.mesh_usable(params.mesh, s.lat):
            _, base = sh.ops8(params.mesh, fs)
            if (params.sloppy and sloppy_ok
                    and jax.default_backend() == "tpu"):
                _, base_sloppy = sh.ops8(params.mesh, fs,
                                         links_dtype=jnp.bfloat16)
        elif _use_pallas(s.lat):
            # s8 streamed kernel (see solve_ee routing note)
            from . import stag_pallas_hisq as sph
            ps = sph.new_pallas_stag8(fs)
            base = lambda v: sph._join(
                sph.d2dd_pallas_hisq(ps, sph._split(v), 0))
            if params.sloppy and sloppy_ok:
                # bf16-link sloppy pass + per-shift f32
                # true-residual refinement (QEX sloppySolve for
                # the multimass path)
                psb = sph.new_pallas_stag8(fs,
                                           links_dtype=jnp.bfloat16)
                base_sloppy = lambda v: sph._join(
                    sph.d2dd_pallas_hisq(psb, sph._split(v), 0))
        else:
            base = partial(sf.d2dd_fast, fs, parity=0)
        bf = sf.to_fast(b_e, s.lat)
        # single-pass achievable floor: the multishift recurrence cannot
        # restart, so rounding accumulates; the smallest shift stalls
        # near 1e-8 (rel r2) in c64
        floor = 1e-8 if bf.dtype == jnp.complex64 else 1e-22
        if base_sloppy is not None:
            xs, stats = cgm.cg_multishift_refined(
                base_sloppy, base, bf, shifts, r2req=params.r2req,
                maxits=params.maxits, sloppy_r2req=1e-5)
        elif params.r2req < floor and params.restarts > 0:
            # QEX parity: solveXX re-solves each mass until its TRUE
            # residual passes (stagSolve.nim:296-460); here the
            # per-shift defect refinement lifts the c64 floor
            xs, stats = cgm.cg_multishift_refined(
                base, base, bf, shifts, r2req=params.r2req,
                maxits=params.maxits, sloppy_r2req=floor,
                refine_restarts=params.restarts)
        else:
            xs, stats = cgm.cg_multishift(base, bf, shifts,
                                          r2req=params.r2req,
                                          maxits=params.maxits)
        return [sf.from_fast(x, s.lat) for x in xs], stats
    base = partial(st.d2dd, s, parity=0)  # -D_eo D_oe (shift-free part)
    xs, stats = cgm.cg_multishift(base, b_e, shifts, r2req=params.r2req,
                                  maxits=params.maxits)
    return xs, stats


def solve_batched(s: st.StaggeredEO, bs: jax.Array, m: float,
                  params: SolverParams = SolverParams()
                  ) -> tuple[jax.Array, SolverStats]:
    """Multi-RHS solve: ``bs`` has a leading RHS axis (nrhs, nc, *dims).

    QEX parity: the multi-RHS stacked operators ``stagDN``
    (stagD.nim:98-197).  Implemented as vmap over the RHS axis -- XLA
    shares the link loads across the batch inside each Dslash, which is
    the stacked-operator bandwidth amortization (links are ~70%% of the
    traffic, so nc-source propagator solves run ~2x faster than
    sequential).  All lanes iterate until the slowest converges.
    Uses the fast-layout operator explicitly (the Pallas kernel is not
    batched under vmap).
    """
    lat = s.lat
    if lat.nd != 4:
        return jax.vmap(lambda b: solve(s, b, m, params))(bs)

    from . import stag_fast as sf
    fs = sf.new_fast(s)

    def one(b):
        b_e, b_o = eo.pack(b, lat.nd)
        rhs = m * b_e - st.dslash_eo(s, b_o, parity_out=0)
        rf = sf.to_fast(rhs, lat)
        xf, stats = cg.cg_solve_restarted(
            partial(sf.d2ee_fast, fs, m=m), rf, r2req=params.r2req,
            maxits=params.maxits, restarts=params.restarts)
        x_e = sf.from_fast(xf, lat)
        x_o = st.reconstruct_odd(s, x_e, b_o, m)
        return eo.unpack(x_e, x_o, lat.nd), stats

    return jax.vmap(one)(bs)


def cg_flops(lat, nd: int, nc: int, iters) -> jax.Array:
    """QEX's eo-CG flop model (stagSolve.nim:33-38):
    (nd*4*72 + 60) * nEven * iters for nc=3."""
    n_even = lat.volume // 2
    per_site = nd * 4 * 72 + 60 if nc == 3 else nd * 4 * 8 * nc * nc + 20 * nc
    return per_site * n_even * iters
