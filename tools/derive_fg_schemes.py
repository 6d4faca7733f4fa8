"""Derive genuine 4th-order force-gradient integrator coefficients for
the MDevolve scheme names (4MN3F1GP, 4MN4F2GV(G), 4MN5F1GV/GP,
4MN5F2GV/GP) by numerical BCH analysis.

Method (no symbolic algebra needed):

1. Represent the kinetic/potential flows by random dense matrices A, B
   and each scheme stage by a matrix exponential; a force-gradient kick
   ("FG", c, xi) maps to exp(c*tau*B - xi*tau^3*[B,[B,A]]) — the sign
   calibrated so Chin's FGI (xi = 1/72) is exactly 4th order in
   qex_tpu.hmc.integrators' convention (F_eff = F - a dF[F],
   a = 2 xi dt^2 / c).
2. E(tau) = logm(product) - tau*(A+B).  The tau^3 coefficient lies in
   span{[A,[A,B]], [B,[B,A]]}; the tau^5 coefficient in the 6-dim
   grade-5 subspace of the free Lie algebra.  Both are extracted by
   Richardson extrapolation + least squares (residual < 1e-18 checks
   the Lie-subspace claim).
3. 4th order: solve alpha = beta = 0 for two designated parameters by
   Newton iteration on the numerically extracted coefficients.
4. Remaining free parameters: minimize the Euclidean norm of the six
   tau^5 coefficients (the Omelyan et al. 2003 "minimum norm"
   criterion) by Nelder-Mead.

Verified analytic cross-check (see integrators._4mn3f1gp): for
T(rho) V(lam) T(1/2-rho) FG(1-2lam, xi) T(1/2-rho) V(lam) T(rho),
    alpha = -1/24 + lam (1-2 rho)^2 / 4
    beta  =  1/12 - lam (1-lam) (1/2-rho) - xi
and MDevolve's documented default lam = 0.2470939580390842 matches the
FUEL f3g a0 = 0.109 cross-reference through lam = 1/(6 (1-2 a0)^2)
(reference src/experimental/stagag.nim:50).

Run:  python tools/derive_fg_schemes.py            # derive all
      python tools/derive_fg_schemes.py --verify    # check integrators.py
"""

from __future__ import annotations

import sys

import numpy as np
from scipy.linalg import expm, logm
from scipy.optimize import minimize

RNG = np.random.default_rng(0)
N = 6
A = RNG.normal(size=(N, N))
B = RNG.normal(size=(N, N))
A /= np.linalg.norm(A)
B /= np.linalg.norm(B)


def _c(x, y):
    return x @ y - y @ x


AAB = _c(A, _c(A, B))
BBA = _c(B, _c(B, A))
# grade-5 basis: bidegrees (4,1), (3,2)x2, (2,3)x2, (1,4)
G5 = [
    _c(A, _c(A, AAB)),        # [A,[A,[A,[A,B]]]]
    _c(A, _c(A, BBA)),        # [A,[A,[B,[B,A]]]]
    _c(B, _c(A, AAB)),        # [B,[A,[A,[A,B]]]]
    _c(B, _c(B, AAB)),        # [B,[B,[A,[A,B]]]]
    _c(A, _c(B, BBA)),        # [A,[B,[B,[B,A]]]]
    _c(B, _c(B, BBA)),        # [B,[B,[B,[B,A]]]]
]
M3 = np.stack([AAB.ravel(), BBA.ravel()], 1)
M5 = np.stack([g.ravel() for g in G5], 1)


def scheme_matrix(stages, tau):
    """stages: list of ('T', c) / ('V', c) / ('FG', c, xi)."""
    m = np.eye(N)
    for st in stages:
        if st[0] == "T":
            m = m @ expm(st[1] * tau * A)
        elif st[0] == "V":
            m = m @ expm(st[1] * tau * B)
        else:
            m = m @ expm(st[1] * tau * B - st[2] * tau ** 3 * BBA)
    return m


def err_coeffs(stages):
    """(alpha, beta, c5[6]) of logm(scheme) - tau*(A+B)."""
    def err(tau):
        return logm(scheme_matrix(stages, tau)) - tau * (A + B)

    t1, t2, t3 = 0.12, 0.06, 0.03
    e1, e2, e3 = err(t1), err(t2), err(t3)
    # E = c3 t^3 + c5 t^5 + c7 t^7: eliminate c7 then c5 for c3
    f1, f2, f3 = e1 / t1 ** 3, e2 / t2 ** 3, e3 / t3 ** 3
    g12 = (4 * f2 - f1) / 3          # c3 + O(t^4)
    g23 = (4 * f3 - f2) / 3
    c3m = (16 * g23 - g12) / 15
    ab, *_ = np.linalg.lstsq(M3, c3m.ravel(), rcond=None)
    # c5: subtract the c3 part first
    c3mat = ab[0] * AAB + ab[1] * BBA
    h1 = (e1 - t1 ** 3 * c3mat) / t1 ** 5
    h2 = (e2 - t2 ** 3 * c3mat) / t2 ** 5
    c5m = (4 * h2 - h1) / 3
    c5, *_ = np.linalg.lstsq(M5, c5m.ravel(), rcond=None)
    return ab[0], ab[1], c5


def solve_order4(make_stages, p0, free):
    """Newton-solve the two designated params (indices in p0) so that
    alpha = beta = 0; returns full param vector."""
    p = np.array(p0, float)

    def f(xy):
        q = p.copy()
        q[free[0]], q[free[1]] = xy
        a, b, _ = err_coeffs(make_stages(q))
        return np.array([a, b])

    xy = np.array([p[free[0]], p[free[1]]])
    for _ in range(20):
        v = f(xy)
        # extraction noise floor is ~1e-10 (Richardson truncation)
        if np.max(np.abs(v)) < 5e-10:
            break
        eps = 1e-7
        j = np.empty((2, 2))
        for k in range(2):
            d = np.zeros(2)
            d[k] = eps
            j[:, k] = (f(xy + d) - v) / eps
        xy = xy - np.linalg.solve(j, v)
    p[free[0]], p[free[1]] = xy
    return p


def min_norm(make_stages, p0, free, opt_idx):
    """Minimize |c5| over params opt_idx, re-solving order-4 conditions
    for params ``free`` at each step."""

    def cost(x):
        q = np.array(p0, float)
        for i, v in zip(opt_idx, x):
            q[i] = v
        try:
            q = solve_order4(make_stages, q, free)
        except np.linalg.LinAlgError:
            return 1e6
        a, b, c5 = err_coeffs(make_stages(q))
        if abs(a) + abs(b) > 5e-9:
            return 1e6
        cost.best = q
        return float(np.linalg.norm(c5))

    x0 = [p0[i] for i in opt_idx]
    r = minimize(cost, x0, method="Nelder-Mead",
                 options={"xatol": 1e-10, "fatol": 1e-13,
                          "maxiter": 400})
    q = np.array(p0, float)
    for i, v in zip(opt_idx, r.x):
        q[i] = v
    q = solve_order4(make_stages, q, free)
    return q, r.fun


# --- scheme structures -------------------------------------------------------
# params laid out per structure; 'free' indices are Newton-solved for
# the order conditions, 'opt' indices are minimum-norm optimized.

def s_4mn5f1gv(p):
    """V(b1) T(a1) V(b2) T(1/2-a1) FG(1-2b1-2b2, xi) ... palindrome.
    5 forces, 1 gradient, velocity."""
    b1, b2, a1, xi = p
    mid = 1.0 - 2 * b1 - 2 * b2
    a2 = 0.5 - a1
    return [("V", b1), ("T", a1), ("V", b2), ("T", a2),
            ("FG", mid, xi), ("T", a2), ("V", b2), ("T", a1),
            ("V", b1)]


def s_4mn5f1gp(p):
    """T(a1) V(b1) T(a2) V(b2) T(1/2-a1-a2) FG(mid, xi) ... palindrome.
    5 forces, 1 gradient, position."""
    b1, b2, a1, a2, xi = p
    mid = 1.0 - 2 * b1 - 2 * b2
    a3 = 0.5 - a1 - a2
    return [("T", a1), ("V", b1), ("T", a2), ("V", b2), ("T", a3),
            ("FG", mid, xi), ("T", a3), ("V", b2), ("T", a2),
            ("V", b1), ("T", a1)]


def s_4mn4f2gv(p):
    """V(b1) T(a1) FG(1/2-b1, xi) T(1-2a1) FG(1/2-b1, xi) T(a1) V(b1).
    4 forces, 2 gradients, velocity (gradients on the inner kicks)."""
    b1, a1, xi = p
    return [("V", b1), ("T", a1), ("FG", 0.5 - b1, xi),
            ("T", 1.0 - 2 * a1), ("FG", 0.5 - b1, xi), ("T", a1),
            ("V", b1)]


def s_4mn4f2gvg(p):
    """FG(b1, xi) T(a1) V(1/2-b1) T(1-2a1) V(1/2-b1) T(a1) FG(b1, xi).
    4 forces, 2 gradients, velocity, gradients on the outer kicks."""
    b1, a1, xi = p
    return [("FG", b1, xi), ("T", a1), ("V", 0.5 - b1),
            ("T", 1.0 - 2 * a1), ("V", 0.5 - b1), ("T", a1),
            ("FG", b1, xi)]


def s_4mn5f2gv(p):
    """V(b1) T(a1) FG(b2, xi) T(1/2-a1) V(1-2b1-2b2) ... palindrome.
    5 forces, 2 gradients, velocity."""
    b1, b2, a1, xi = p
    mid = 1.0 - 2 * b1 - 2 * b2
    a2 = 0.5 - a1
    return [("V", b1), ("T", a1), ("FG", b2, xi), ("T", a2),
            ("V", mid), ("T", a2), ("FG", b2, xi), ("T", a1),
            ("V", b1)]


def s_4mn5f2gp(p):
    """T(a1) V(b1) T(a2) FG(b2, xi) T(1/2-a1-a2) V(mid) ... palindrome.
    5 forces, 2 gradients, position."""
    b1, b2, a1, a2, xi = p
    mid = 1.0 - 2 * b1 - 2 * b2
    a3 = 0.5 - a1 - a2
    return [("T", a1), ("V", b1), ("T", a2), ("FG", b2, xi), ("T", a3),
            ("V", mid), ("T", a3), ("FG", b2, xi), ("T", a2),
            ("V", b1), ("T", a1)]


SCHEMES = {
    # name: (builder, p0, free(order-4), opt(min-norm))
    "4MN5F1GV": (s_4mn5f1gv, [0.1, 0.25, 0.15, 0.005], [2, 3], [0, 1]),
    "4MN5F1GP": (s_4mn5f1gp, [0.1, 0.25, 0.1, 0.2, 0.005], [3, 4],
                 [0, 1, 2]),
    "4MN4F2GV": (s_4mn4f2gv, [0.12, 0.2, 0.01], [1, 2], [0]),
    "4MN4F2GVG": (s_4mn4f2gvg, [0.12, 0.2, 0.01], [1, 2], [0]),
    "4MN5F2GV": (s_4mn5f2gv, [0.1, 0.2, 0.15, 0.005], [2, 3], [0, 1]),
    "4MN5F2GP": (s_4mn5f2gp, [0.09, 0.2, 0.1, 0.2, 0.004], [3, 4],
                 [0, 1, 2]),
}


def derive_all():
    for name, (mk, p0, free, opt) in SCHEMES.items():
        q, c5n = min_norm(mk, p0, free, opt)
        a, b, c5 = err_coeffs(mk(q))
        print(f"{name}: params={np.array2string(q, precision=16)}")
        print(f"  alpha={a:.2e} beta={b:.2e} |c5|={c5n:.6f}")
        print(f"  stages={mk(q)}")


def verify_integrators():
    """Check every FG scheme registered in qex_tpu.hmc.integrators is
    genuinely 4th order (alpha = beta = 0)."""
    sys.path.insert(0, ".")
    from qex_tpu.hmc import integrators as I
    bad = 0
    for name in ["FGI", "4MN3F1GP", "4MN5F1GV", "4MN5F1GP",
                 "4MN4F2GV", "4MN4F2GVG", "4MN5F2GV", "4MN5F2GP"]:
        try:
            sch = I.get_integrator(name)
        except Exception as e:
            print(f"{name}: unavailable ({e})")
            continue
        a, b, c5 = err_coeffs(list(sch.steps))
        # 16-digit printed coefficients round at ~1e-10
        tag = "OK " if abs(a) + abs(b) < 1e-9 else "BAD"
        print(f"{tag} {name}: alpha={a:.3e} beta={b:.3e} "
              f"|c5|={np.linalg.norm(c5):.6f}")
        bad += tag == "BAD"
    return bad


if __name__ == "__main__":
    if "--verify" in sys.argv:
        sys.exit(verify_integrators())
    derive_all()
