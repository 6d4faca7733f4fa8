"""Staggered pseudofermion / Pauli-Villars actions for HMC.

TPU-native replacement for QEX's fermion-HMC plumbing:
``generate_pseudoferms`` (phi = D^dag psi for fermions, phi = D^-1 psi
for PV bosons; src/stagg_pv_hmc/staghmc_spv.nim:521-554), the fermion
action accumulation (:559-697) and the CG-solve force ``fforce``
(:758-872), and the mcmc framework's staggered heatbath/forces
(src/mcmc/fields/staggeredFields.nim:175-466).

All actions are expressed on EVEN sites through the hermitian
positive-definite normal operator

    A(m) = m^2 - D_eo D_oe        (qex_tpu.physics.staggered.d2ee)

* Fermion (2-flavor-equivalent): S_f = phi^dag A^{-1} phi,
  heatbath phi = (D(m)^dag xi)_e = m xi_e - D_eo xi_o with xi complex
  Gaussian of variance 1/2 per real component, so Cov(phi) = A.
* Pauli-Villars boson:          S_pv = phi^dag A phi,
  heatbath phi = A^{-1} (D^dag xi)_e  (Cov = A^{-1}; the reference's
  phi = D^{-1} psi in eo form).
* Hasenbusch ratio:  S_h = phi^dag A(mp) A(m)^{-1} A(mp) ... is composed
  by the mcmc layer from these primitives (see qex_tpu.mcmc).

Forces use the **implicit-function VJP**: for S = phi^dag A(u)^{-1} phi
with x = A^{-1} phi, dS/du = -x^dag (dA/du) x -- one extra CG solve per
force, differentiated through d2ee by ordinary AD (replacing QEX's
hand-built outer-product ``stagDeriv``, stagD.nim:589-635).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import dsum, eo, linalg
from ..solvers.base import SolverParams
from . import stag_solve, staggered as st


def _a_apply(lat: Lattice, bc: str, u: jax.Array, x_e: jax.Array,
             m: float) -> jax.Array:
    """A(m) x on even sites from UNPACKED links (differentiable in u)."""
    s = st.new_stag_eo(lat, u, bc)
    return st.d2ee(s, x_e, m)


def _ddag_e(lat: Lattice, bc: str, u: jax.Array, xi: jax.Array,
            m: float) -> jax.Array:
    """(D(m)^dag xi)_e = m xi_e - D_eo xi_o for a full-lattice xi."""
    s = st.new_stag_eo(lat, u, bc)
    xi_e, xi_o = eo.pack(xi, lat.nd)
    return m * xi_e - st.dslash_eo(s, xi_o, parity_out=0)


def gaussian_eta(key: jax.Array, lat: Lattice, dtype) -> jax.Array:
    """Full-lattice complex Gaussian with P ~ exp(-|xi|^2):
    variance 1/2 per real component (QEX's pseudofermion noise
    normalization, staghmc_spv.nim:521-554)."""
    rdtype = jnp.finfo(dtype).dtype
    kr, ki = jax.random.split(key)
    shape = lat.vector_shape()
    return ((jax.random.normal(kr, shape, rdtype)
             + 1j * jax.random.normal(ki, shape, rdtype))
            * 0.7071067811865476).astype(dtype)


def make_quad_inv_action(lat: Lattice, bc: str, m: float,
                         params: SolverParams,
                         force_params: SolverParams | None = None
                         ) -> Callable:
    """Differentiable S(u, phi) = Re[phi^dag A(u,m)^{-1} phi].

    custom_vjp: forward runs CG once; backward evaluates
    -x^dag dA x by AD with x held fixed (the implicit-function trick
    replacing staghmc_spv's fforce solve+outer-product).

    ``force_params`` (QEX ``f_tol``/``f_maxits``,
    staghmc_spv_init_and_io.nim:482): the solve tolerance used on the
    DIFFERENTIATION path.  The custom_vjp ``fwd`` rule only runs under
    jax.grad -- i.e. for MD force evaluations -- while plain calls
    (Hamiltonian values at trajectory endpoints) take the primal path
    at ``params`` (the ``a_tol`` solves).
    """
    fparams = force_params if force_params is not None else params

    def solve_x(u, phi, sp):
        s = st.new_stag_eo(lat, u, bc)
        x, _ = stag_solve.solve_ee(s, phi, m, sp)
        return x

    @jax.custom_vjp
    def s_act(u, phi):
        x = solve_x(u, phi, params)
        return jnp.real(linalg.dot(phi, x))

    def fwd(u, phi):
        x = solve_x(u, phi, fparams)
        return jnp.real(linalg.dot(phi, x)), (u, phi, x)

    def bwd(res, g):
        u, phi, x = res

        def quad(uu):
            return -jnp.real(linalg.dot(x, _a_apply(lat, bc, uu, x, m)))

        gu = jax.grad(quad)(u)
        gphi = 2.0 * jnp.conj(x)
        return (g * gu, g * gphi)

    s_act.defvjp(fwd, bwd)
    return s_act


def make_quad_action(lat: Lattice, bc: str, m: float) -> Callable:
    """Differentiable S(u, phi) = Re[phi^dag A(u,m) phi] (PV boson)."""

    def s_act(u, phi):
        return jnp.real(linalg.dot(phi, _a_apply(lat, bc, u, phi, m)))

    return s_act


# --- compensated (two-float) action values -----------------------------------
#
# Measurement-path twins with the final site reduction through
# ops.dsum two-float trees (Hamiltonian exactness at volume in f32;
# the reference holds H in f64, src/hmc/metropolis.nim:6-16).  Same
# solves at the same tolerances; never differentiated, so no
# custom_vjp plumbing.

def make_quad_inv_action2(lat: Lattice, bc: str, m: float,
                          params: SolverParams) -> Callable:
    """Two-float S = Re[phi^dag A^{-1} phi] -> (hi, lo)."""

    def s_act2(u, phi):
        s = st.new_stag_eo(lat, u, bc)
        x, _ = stag_solve.solve_ee(s, phi, m, params)
        return dsum.redot2(phi, x)

    return s_act2


def make_quad_action2(lat: Lattice, bc: str, m: float) -> Callable:
    """Two-float S = Re[phi^dag A phi] -> (hi, lo)."""

    def s_act2(u, phi):
        return dsum.redot2(phi, _a_apply(lat, bc, u, phi, m))

    return s_act2


@dataclasses.dataclass(frozen=True)
class StagFermion:
    """Staggered pseudofermion action term S = phi^dag A(m)^{-1} phi.

    ``n_pseudo`` independent pseudofermion fields share the operator
    (QEX staghmc_spv 'Nf' with 4 tastes per field; rooting is handled by
    the rational term in qex_tpu.mcmc)."""

    lat: Lattice
    m: float
    bc: str = "pppa"
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000, restarts=3)
    force_params: SolverParams | None = None

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        xi = gaussian_eta(key, self.lat, u.dtype)
        return _ddag_e(self.lat, self.bc, u, xi, self.m)

    def action(self, u: jax.Array, phi: jax.Array) -> jax.Array:
        return self.make_action_fn()(u, phi)

    def make_action_fn(self) -> Callable:
        return make_quad_inv_action(self.lat, self.bc, self.m,
                                    self.params, self.force_params)

    def make_action2_fn(self) -> Callable:
        return make_quad_inv_action2(self.lat, self.bc, self.m,
                                     self.params)

    def check_solve(self, u: jax.Array, phi: jax.Array):
        """Re-solve at the action tolerance and report
        (iterations, true relative residual) -- the QEX ``check_solvers``
        per-trajectory solver verification (staghmc_spv.nim:1066-1090)."""
        s = st.new_stag_eo(self.lat, u, self.bc)
        x, stats = stag_solve.solve_ee(s, phi, self.m, self.params)
        r = st.d2ee(s, x, self.m) - phi
        rel = linalg.norm2(r) / linalg.norm2(phi)
        return stats.iterations, rel


@dataclasses.dataclass(frozen=True)
class StagBoson:
    """Pauli-Villars boson term S = phi^dag A(m_pv) phi
    (staghmc_spv.nim PV fields, mass_pv)."""

    lat: Lattice
    m: float
    bc: str = "pppa"
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000, restarts=3)

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        xi = gaussian_eta(key, self.lat, u.dtype)
        rhs = _ddag_e(self.lat, self.bc, u, xi, self.m)
        s = st.new_stag_eo(self.lat, u, self.bc)
        phi, _ = stag_solve.solve_ee(s, rhs, self.m, self.params)
        return phi

    def action(self, u: jax.Array, phi: jax.Array) -> jax.Array:
        return make_quad_action(self.lat, self.bc, self.m)(u, phi)

    def make_action_fn(self) -> Callable:
        return make_quad_action(self.lat, self.bc, self.m)

    def make_action2_fn(self) -> Callable:
        return make_quad_action2(self.lat, self.bc, self.m)


def _fast3_ops(f3, mesh=None):
    """Best fat+naik operator callables for a FastStag3EO: the fused
    16-term Pallas HISQ stencil (stag_pallas_hisq) on TPU when the
    geometry fits, else the XLA fast layout.  Returns
    ``(d2ee3(v, m), d2dd3(v))`` on fast-layout complex vectors.
    Solves sit inside custom_vjp fwd/bwd, so AD never traces through
    the kernel."""
    ee, dd, _ = _fast3_ops_sloppy(f3, mesh)
    return ee, dd


def _fast3_ops_sloppy(f3, mesh=None):
    """(d2ee3, d2dd3, d2ee3_sloppy_or_None): as :func:`_fast3_ops`
    plus an optional cheaper inner op for sloppy CG iterations (the
    QEX sloppySolve mixed-precision role; pair with the full-precision
    op as ``op_true`` in cg_solve_restarted).

    The bf16-link sloppy slot is live on the single-chip Pallas route:
    with the z-vectorized kernel (full-sublane (nzb, YX) values) bf16
    links measure 0.780 vs 1.074 ms/d2dd at 24^3x48 (980 GF/s; the
    per-z-plane variant's convert overhead made bf16 SLOWER, 1.96 vs
    1.35 ms -- exp_hisq.py same-process A/Bs), and the sloppy ee-solve
    drops 0.339 -> 0.132 s at true r2 1.4e-10."""
    from . import stag_fast as sfst
    from .stag_solve import _use_pallas
    from .stag_shard import mesh_usable, ops16
    if mesh_usable(mesh, f3.lat, naik=True):
        # explicit shard_map kernel route (multi-chip Pallas,
        # SolverParams.mesh); dist-3 halos handled by the fixup
        ee, dd = ops16(mesh, f3)
        return ee, dd, None
    if _use_pallas(f3.lat):
        from . import stag_pallas_hisq as sph
        if sph.fits(f3.lat):
            p3 = sph.new_pallas_hisq(f3)
            ee = lambda v, m: sph._join(
                sph.d2ee_pallas_hisq(p3, sph._split(v), m))
            dd = lambda v: sph._join(
                sph.d2dd_pallas_hisq(p3, sph._split(v), 0))
            p3b = sph.new_pallas_hisq(f3, links_dtype=jnp.bfloat16)
            ee_b = lambda v, m: sph._join(
                sph.d2ee_pallas_hisq(p3b, sph._split(v), m))
            return ee, dd, ee_b
    return (lambda v, m: sfst.d2ee3_fast(f3, v, m),
            lambda v: sfst.d2dd3_fast(f3, v, parity=0),
            None)


@dataclasses.dataclass(frozen=True)
class HisqFermion:
    """HISQ pseudofermion: S = phi^dag A3(m)^{-1} phi with the fat+naik
    normal operator A3 = m^2 - D3_eo D3_oe built from
    gauge.fat7.hisq_links on PHASED links (MILC convention: stagPhase +
    setBC folded in before fattening, hisqLinks.nim usage).

    Forces flow by AD through the two-level smear + projection + naik
    construction via the implicit-function custom_vjp (one extra
    solve) -- replacing the reference's fat7lderiv + projectUDeriv +
    naik outer-product chain.  QEX parity: examples/hisqhmc.nim.
    """

    lat: Lattice
    m: float
    bc: str = "pppa"
    proj_iters: int = 14
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000, restarts=3)
    force_params: SolverParams | None = None

    def _links(self, u):
        from ..gauge.fat7 import hisq_links
        g = st.phase_links(self.lat, u, self.bc)
        return hisq_links(self.lat, g, proj_iters=self.proj_iters)

    def _a3(self, u, x_e):
        fl, ll = self._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        return st.d2ee3(s3, x_e, self.m)

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        xi = gaussian_eta(key, self.lat, u.dtype)
        fl, ll = self._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        xi_e, xi_o = eo.pack(xi, self.lat.nd)
        # phi = (D3^dag xi)_e = m xi_e - D3_eo xi_o : Cov = A3
        return self.m * xi_e - st.dslash3_eo(s3, xi_o, parity_out=0)

    def check_solve(self, u: jax.Array, phi: jax.Array):
        fl, ll = self._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        from ..solvers import cg as cgmod
        op = lambda v: st.d2ee3(s3, v, self.m)
        x, stats = cgmod.cg_solve_restarted(
            op, phi, r2req=self.params.r2req,
            maxits=self.params.maxits, restarts=self.params.restarts)
        rel = linalg.norm2(op(x) - phi) / linalg.norm2(phi)
        return stats.iterations, rel

    def solve_ee(self, u, b_e, sp=None, m=None):
        """x_e = A3(m)^{-1} b_e via the fast/Pallas-routed CG."""
        sp = self.params if sp is None else sp
        m = self.m if m is None else m
        fl, ll = self._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        from ..solvers import cg as cgmod
        if self.lat.nd == 4:
            # lane-packed fast layout brackets the Krylov solve
            from . import stag_fast as sfst
            f3 = sfst.new_fast3(s3)
            ee, _, ee_b = _fast3_ops_sloppy(f3, getattr(sp, 'mesh', None))
            op = lambda v: ee(v, m)
            op_true, floor = None, 1e-12
            if getattr(sp, "sloppy", False) and ee_b is not None:
                # bf16-link inner iterations + f32 true-residual
                # restarts (same recipe as stag_solve.solve_ee)
                op_true, floor = op, 1e-5
                op = lambda v: ee_b(v, m)
            xf, _ = cgmod.cg_solve_restarted(
                op, sfst.to_fast(b_e, self.lat),
                r2req=sp.r2req, maxits=sp.maxits,
                restarts=sp.restarts, op_true=op_true,
                inner_r2req_floor=floor)
            return sfst.from_fast(xf, self.lat)
        op = lambda v: st.d2ee3(s3, v, m)
        x, _ = cgmod.cg_solve_restarted(
            op, b_e, r2req=sp.r2req, maxits=sp.maxits,
            restarts=sp.restarts)
        return x

    def make_action_fn(self) -> Callable:
        def solve_x(u, phi, sp):
            return self.solve_ee(u, phi, sp)

        fparams = (self.force_params if self.force_params is not None
                   else self.params)

        @jax.custom_vjp
        def s_act(u, phi):
            return jnp.real(linalg.dot(phi, solve_x(u, phi, self.params)))

        def fwd(u, phi):
            x = solve_x(u, phi, fparams)
            return jnp.real(linalg.dot(phi, x)), (u, phi, x)

        def bwd(res, g):
            u, phi, x = res

            def quad(uu):
                return -jnp.real(linalg.dot(x, self._a3(uu, x)))

            gu = jax.grad(quad)(u)
            return (g * gu, g * 2.0 * jnp.conj(x))

        s_act.defvjp(fwd, bwd)
        return s_act

    def make_action2_fn(self) -> Callable:
        def s_act2(u, phi):
            return dsum.redot2(phi, self.solve_ee(u, phi, self.params))

        return s_act2

    def action(self, u, phi):
        return self.make_action_fn()(u, phi)

    def solve_multi(self, u: jax.Array, b_e: jax.Array,
                    masses) -> tuple[list, object]:
        """HISQ multi-mass even-site solve (config #5: 32^4x64 HISQ
        multi-mass CG): one Krylov space over the naik operator."""
        from ..solvers import cgm
        fl, ll = self._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        shifts = [m * m for m in masses]
        if self.lat.nd == 4:
            from . import stag_fast as sfst
            f3 = sfst.new_fast3(s3)
            _, base = _fast3_ops(f3, self.params.mesh)
            xs, stats = cgm.cg_multishift(base,
                                          sfst.to_fast(b_e, self.lat),
                                          shifts,
                                          r2req=self.params.r2req,
                                          maxits=self.params.maxits)
            return [sfst.from_fast(x, self.lat) for x in xs], stats
        base = lambda x: st.d2dd3(s3, x, parity=0)
        return cgm.cg_multishift(base, b_e, shifts,
                                 r2req=self.params.r2req,
                                 maxits=self.params.maxits)


def fermion_force(action_fn: Callable, u: jax.Array, phi: jax.Array
                  ) -> jax.Array:
    """TAH MD force of a fermion/boson action term at fixed phi."""
    from ..gauge.action import force_from_action
    return force_from_action(lambda uu: action_fn(uu, phi), u)


@dataclasses.dataclass(frozen=True)
class StagHasenbusch:
    """Hasenbusch mass-preconditioned ratio term.

    Even-site action (QEX staghmc_sh faction semantics, derived in
    even-odd-reduced form):

        S_h = phi^dag phi + (m2^2 - m1^2) phi^dag A(m1)^{-1} phi

    with m1 = light (target) mass, m2 = heavy (preconditioner) mass.
    Heatbath: phi = [D(m2)^{-1} D(m1) xi]_e for full-lattice Gaussian
    xi (staghmc_sh.nim:744-753 'phi = D(m2)^{-1} D(m1) psi' with odd
    part zeroed) -- its even-site covariance is exactly A1 A2^{-1}.
    The force is (m2^2 - m1^2) times the plain quad-inverse force at
    m1 (staghmc_sh ``fscale``, :383-387).
    """

    lat: Lattice
    m1: float           # light mass
    m2: float           # heavy (Hasenbusch) mass
    bc: str = "pppa"
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000, restarts=3)
    force_params: SolverParams | None = None

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        xi = gaussian_eta(key, self.lat, u.dtype)
        s = st.new_stag_eo(self.lat, u, self.bc)
        xi_e, xi_o = eo.pack(xi, self.lat.nd)
        # b = D(m1) xi on both parities
        b_e = self.m1 * xi_e + st.dslash_eo(s, xi_o, parity_out=0)
        b_o = self.m1 * xi_o + st.dslash_eo(s, xi_e, parity_out=1)
        phi_e, _phi_o, _stats = stag_solve.solve_eo(
            s, b_e, b_o, self.m2, self.params)
        return phi_e

    def check_solve(self, u: jax.Array, phi: jax.Array):
        s = st.new_stag_eo(self.lat, u, self.bc)
        x, stats = stag_solve.solve_ee(s, phi, self.m1, self.params)
        r = st.d2ee(s, x, self.m1) - phi
        rel = linalg.norm2(r) / linalg.norm2(phi)
        return stats.iterations, rel

    def make_action_fn(self) -> Callable:
        quad = make_quad_inv_action(self.lat, self.bc, self.m1,
                                    self.params, self.force_params)
        delta = self.m2 * self.m2 - self.m1 * self.m1

        def s_act(u, phi):
            return jnp.real(linalg.dot(phi, phi)) + delta * quad(u, phi)

        return s_act

    def make_action2_fn(self) -> Callable:
        quad2 = make_quad_inv_action2(self.lat, self.bc, self.m1,
                                      self.params)
        delta = self.m2 * self.m2 - self.m1 * self.m1

        def s_act2(u, phi):
            return dsum.df_add(dsum.norm22(phi),
                               dsum.df_scale(quad2(u, phi), delta))

        return s_act2

    def action(self, u: jax.Array, phi: jax.Array) -> jax.Array:
        return self.make_action_fn()(u, phi)


@dataclasses.dataclass(frozen=True)
class HisqHasenbusch:
    """Hasenbusch ratio term over the HISQ (fat+naik) operator.

    Same even-site algebra as :class:`StagHasenbusch` with A replaced
    by A3 = m^2 - D3_eo D3_oe on HISQ-smeared links:

        S_h = phi^dag phi + (m2^2 - m1^2) phi^dag A3(m1)^{-1} phi

    heatbath phi = [D3(m2)^{-1} D3(m1) xi]_e.  Forces flow by AD
    through the two-level smear via the implicit-function custom_vjp
    of the quad-inverse (reusing :class:`HisqFermion`).  QEX parity:
    examples/hisqhmc_h.nim (self.hmass fields, :107,:257,:463).
    """

    lat: Lattice
    m1: float           # light (target) mass
    m2: float           # heavy (preconditioner) mass
    bc: str = "pppa"
    proj_iters: int = 14
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000,
                                        restarts=3)
    force_params: SolverParams | None = None

    def _ferm(self, m: float) -> HisqFermion:
        return HisqFermion(self.lat, m, self.bc, self.proj_iters,
                           self.params, self.force_params)

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        f1 = self._ferm(self.m1)
        fl, ll = f1._links(u)
        s3 = st.new_stag3_eo(self.lat, fl, ll)
        xi = gaussian_eta(key, self.lat, u.dtype)
        xi_e, xi_o = eo.pack(xi, self.lat.nd)
        # b = D3(m1) xi on both parities
        b_e = self.m1 * xi_e + st.dslash3_eo(s3, xi_o, parity_out=0)
        b_o = self.m1 * xi_o + st.dslash3_eo(s3, xi_e, parity_out=1)
        # phi_e = [D3(m2)^{-1} b]_e via the eo-reduced normal solve
        rhs = self.m2 * b_e - st.dslash3_eo(s3, b_o, parity_out=0)
        return f1.solve_ee(u, rhs, m=self.m2)

    def check_solve(self, u: jax.Array, phi: jax.Array):
        return self._ferm(self.m1).check_solve(u, phi)

    def make_action_fn(self) -> Callable:
        quad = self._ferm(self.m1).make_action_fn()
        delta = self.m2 * self.m2 - self.m1 * self.m1

        def s_act(u, phi):
            return jnp.real(linalg.dot(phi, phi)) + delta * quad(u, phi)

        return s_act

    def make_action2_fn(self) -> Callable:
        quad2 = self._ferm(self.m1).make_action2_fn()
        delta = self.m2 * self.m2 - self.m1 * self.m1

        def s_act2(u, phi):
            return dsum.df_add(dsum.norm22(phi),
                               dsum.df_scale(quad2(u, phi), delta))

        return s_act2

    def action(self, u: jax.Array, phi: jax.Array) -> jax.Array:
        return self.make_action_fn()(u, phi)


@dataclasses.dataclass(frozen=True)
class StagRootedFermion:
    """Rooted staggered fermion: S = phi^dag A(m)^{-nf/4} phi.

    Rational approximations (qex_tpu.solvers.rational, replacing QEX's
    static Remez table mcmc/utilities/rational.nim) in partial-fraction
    form, evaluated by ONE multishift CG each:

      * heatbath: phi = A^{+nf/8} xi  (Cov(phi) = A^{nf/4})
      * action/MD: S = c0 |phi|^2 + sum_i r_i phi^dag (A+s_i)^{-1} phi

    QEX parity: addRootedStaggeredFermion
    (mcmc/actions/latticeAction.nim:65-170,
    mcmc/fields/staggeredFields.nim:191-466).
    """

    lat: Lattice
    m: float
    nf: int = 1
    bc: str = "pppa"
    degree: int = 10
    params: SolverParams = SolverParams(r2req=1e-12, maxits=2000, restarts=1)
    force_params: SolverParams | None = None
    # measured (lo, hi) bracket of A(m); None = safe analytic bound.
    # Produce with calibrate_spectral_range(u) at setup (QEX hisqev
    # bounds feeding the Remez interval).
    spectral_bounds: tuple | None = None

    def _base_op(self, u):
        """Canonical-layout base op; 4D lattices route each
        application through the lane-packed fast layout (the
        conversion transposes are ~5%% of the matvec win)."""
        s = st.new_stag_eo(self.lat, u, self.bc)
        if self.lat.nd == 4:
            from . import stag_fast as sfst
            fs = sfst.new_fast(s)
            return lambda x: sfst.from_fast(
                sfst.d2dd_fast(fs, sfst.to_fast(x, self.lat), 0),
                self.lat)
        return lambda x: st.d2dd(s, x, parity=0)

    def _spectral_range(self) -> tuple[float, float]:
        if self.spectral_bounds is not None:
            return tuple(self.spectral_bounds)
        # A = m^2 - D_eo D_oe with |eig(Dslash)| <= nd/... staggered
        # Dslash (with the 1/2) has |lambda| <= nd/2 * 2 = nd... use the
        # safe bound |lambda|^2 <= nd^2.
        lo = self.m * self.m
        hi = lo + float(self.lat.nd ** 2)
        return lo, hi

    def calibrate_spectral_range(self, u: jax.Array,
                                 safety: float = 1.2
                                 ) -> "StagRootedFermion":
        """Return a copy with the rational-approximation interval
        tightened to the MEASURED spectrum of A(m) on ``u`` (Lanczos
        bracket, qex_tpu.eigens.hisqev.spectral_range_stag), padded by
        ``safety`` at the top.  Tighter intervals need lower rational
        degree for the same accuracy (QEX parity: hisqev-style bounds
        selecting the Remez table in mcmc/utilities/rational.nim)."""
        from ..eigens.hisqev import spectral_range_stag
        lo, hi = spectral_range_stag(self.lat, u, self.m, bc=self.bc)
        mm = self.m * self.m
        lo = max(mm * 0.5, lo / safety)
        return dataclasses.replace(self,
                                   spectral_bounds=(lo, hi * safety))

    def _approx(self, num: int, den: int):
        from ..solvers.rational import rational_approx
        lo, hi = self._spectral_range()
        return rational_approx(num, den, lo, hi, self.degree)

    def heatbath(self, key: jax.Array, u: jax.Array) -> jax.Array:
        xi = gaussian_eta(key, self.lat, u.dtype)
        xi_e, _ = eo.pack(xi, self.lat.nd)
        ra = self._approx(self.nf, 8)        # A^{+nf/8}
        base = self._base_op(u)
        mm = self.m * self.m

        def shifted(x):
            return base(x) + mm * x

        phi, _ = ra.apply(shifted, xi_e, r2req=self.params.r2req,
                          maxits=self.params.maxits)
        return phi

    def _xs(self, u, phi, ra, sp=None):
        from ..solvers import cgm
        sp = sp if sp is not None else self.params
        base = self._base_op(u)
        mm = self.m * self.m
        xs, stats = cgm.cg_multishift(
            lambda x: base(x) + mm * x, phi, list(ra.poles),
            r2req=sp.r2req, maxits=sp.maxits)
        return xs

    def check_solve(self, u: jax.Array, phi: jax.Array):
        from ..solvers import cgm
        ra = self._approx(-self.nf, 4)
        base = self._base_op(u)
        mm = self.m * self.m
        op = lambda x: base(x) + mm * x
        xs, stats = cgm.cg_multishift(op, phi, list(ra.poles),
                                      r2req=self.params.r2req,
                                      maxits=self.params.maxits)
        # true residual of the most-singular (smallest) shift
        i0 = min(range(len(ra.poles)), key=lambda i: ra.poles[i])
        r = op(xs[i0]) + ra.poles[i0] * xs[i0] - phi
        rel = linalg.norm2(r) / linalg.norm2(phi)
        return stats.iterations, rel

    def make_action_fn(self) -> Callable:
        """Differentiable S(u, phi) with implicit-function VJP:
        dS/du = -sum_i r_i x_i^dag (dA/du) x_i from ONE multishift
        solve (replacing QEX's per-pole solve+outer-product force).
        Force solves use ``force_params`` (f_tol) -- the fwd rule only
        runs under differentiation."""
        ra = self._approx(-self.nf, 4)       # A^{-nf/4}

        def value_and_xs(u, phi, sp=None):
            xs = self._xs(u, phi, ra, sp)
            s = ra.c0 * linalg.norm2(phi)
            for r, x in zip(ra.residues, xs):
                s = s + r * jnp.real(linalg.dot(phi, x))
            return s, xs

        @jax.custom_vjp
        def s_act(u, phi):
            s, _ = value_and_xs(u, phi)
            return s

        def fwd(u, phi):
            s, xs = value_and_xs(u, phi, self.force_params)
            return s, (u, phi, xs)

        def bwd(res, g):
            u, phi, xs = res

            def quad(uu):
                acc = 0.0
                for r, x in zip(ra.residues, xs):
                    acc = acc - r * jnp.real(
                        linalg.dot(x, _a_apply(self.lat, self.bc, uu, x,
                                               self.m)))
                return acc

            gu = jax.grad(quad)(u)
            gphi = ra.c0 * phi
            for r, x in zip(ra.residues, xs):
                gphi = gphi + r * x
            return (g * gu, g * 2.0 * jnp.conj(gphi))

        s_act.defvjp(fwd, bwd)
        return s_act

    def make_action2_fn(self) -> Callable:
        ra = self._approx(-self.nf, 4)

        def s_act2(u, phi):
            xs = self._xs(u, phi, ra)
            s = dsum.df_scale(dsum.norm22(phi), ra.c0)
            for r, x in zip(ra.residues, xs):
                s = dsum.df_add(s, dsum.df_scale(dsum.redot2(phi, x), r))
            return s

        return s_act2

    def action(self, u: jax.Array, phi: jax.Array) -> jax.Array:
        return self.make_action_fn()(u, phi)
