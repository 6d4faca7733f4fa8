"""Near-minimax rational approximations of x^(p/q) in pole-residue form.

TPU-native replacement for QEX's src/mcmc/utilities/rational.nim -- a
6,672-line *static table* of Remez coefficients for rooted-staggered
actions.  Here the approximation is COMPUTED on demand for the exact
requested power and spectral range and cached:

    x^(p/q)  ~=  c0 + sum_i  r_i / (x + s_i)     on [lo, hi]

which is exactly what the multishift CG (qex_tpu.solvers.cgm) consumes:
r(A) b costs ONE Krylov space.

Algorithm: AAA (Nakatsukasa, Sete & Trefethen, SIAM J. Sci. Comput.
2018; scipy.interpolate.AAA) on a dense log-spaced grid.  For Stieltjes
functions like x^(-1/2) AAA is near-minimax and its poles come out
simple, real and negative (verified at construction), so the shifts
s_i = -pole_i are positive and the shifted systems A + s_i stay
positive definite.  Relative accuracy ~1e-12 at degree ~12-16 --
comparable to the reference's tabulated Remez fits.

Used by rooted staggered HMC: S = phi^dag A^{-Nf/4} phi with
A = m^2 - D_eo D_oe; heatbath needs A^{+Nf/8}, MD needs A^{-Nf/4}
(conventions of src/mcmc/fields/staggeredFields.nim:191-466).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RationalApprox:
    """Partial-fraction rational approximation on [lo, hi]:
    r(x) = c0 + sum_i residues_i / (x + poles_i), poles_i > 0."""

    power_num: int
    power_den: int
    lo: float
    hi: float
    degree: int
    c0: float
    residues: tuple[float, ...]
    poles: tuple[float, ...]
    max_rel_err: float

    def __call__(self, x):
        x = np.asarray(x, dtype=float)
        acc = np.full_like(x, self.c0)
        for r, p in zip(self.residues, self.poles):
            acc = acc + r / (x + p)
        return acc

    def apply(self, base_op: Callable, b: jax.Array, *,
              r2req: float = 1e-12, maxits: int = 2000):
        """r(A) b via one multishift CG on the PSD operator ``base_op``;
        the poles become the shifts."""
        from . import cgm
        xs, stats = cgm.cg_multishift(base_op, b, list(self.poles),
                                      r2req=r2req, maxits=maxits)
        acc = self.c0 * b
        for r, x in zip(self.residues, xs):
            acc = acc + r * x
        return acc, stats


@functools.lru_cache(maxsize=64)
def rational_approx(power_num: int, power_den: int, lo: float, hi: float,
                    degree: int = 16, tol: float = 1e-13
                    ) -> RationalApprox:
    """Near-minimax r(x) ~= x^(power_num/power_den) on [lo, hi] (cached).

    ``degree`` caps the number of poles; AAA stops earlier when ``tol``
    (relative) is reached.  QEX parity: the lookup into rational.nim's
    table keyed by (power, degree) -- computed here for the exact
    spectral range instead of the nearest tabulated one.
    """
    from scipy.interpolate import AAA

    if not (0 < lo < hi):
        raise ValueError(f"need 0 < lo < hi, got [{lo}, {hi}]")
    power = power_num / power_den
    x = np.logspace(np.log10(lo), np.log10(hi), 4000)
    f = x ** power
    import warnings
    with warnings.catch_warnings():
        # hitting max_terms before rtol is fine -- we report the
        # achieved accuracy in max_rel_err
        warnings.simplefilter("ignore", RuntimeWarning)
        r = AAA(x, f, rtol=float(tol), max_terms=degree + 1)

    poles = r.poles()
    residues = r.residues()
    if np.abs(poles.imag).max(initial=0.0) > 1e-10 * np.abs(
            poles.real).min(initial=1.0):
        raise RuntimeError(f"AAA produced complex poles for x^{power}")
    if poles.real.max(initial=-1.0) >= 0:
        raise RuntimeError(
            f"AAA produced non-negative pole for x^{power}: "
            f"{poles.real.max()}")
    # constant term: limit of the barycentric form at infinity
    w = r.weights
    c0 = float(np.real(np.sum(w * r.support_values) / np.sum(w)))
    shifts = tuple(float(-p) for p in poles.real)
    res = tuple(float(np.real(ri)) for ri in residues)
    order = np.argsort(shifts)
    shifts = tuple(shifts[i] for i in order)
    res = tuple(res[i] for i in order)

    ra = RationalApprox(power_num, power_den, lo, hi, len(shifts), c0,
                        res, shifts, 0.0)
    rel = np.abs(ra(x) / f - 1.0).max()
    return dataclasses.replace(ra, max_rel_err=float(rel))
