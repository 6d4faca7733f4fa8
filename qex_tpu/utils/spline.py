"""Cubic-spline interpolation (natural / clamped boundaries).

TPU-native replacement for the reference's src/algorithms/cspline.nim:
tridiagonal second-derivative solve + Horner evaluation, plus the
Taylor-series endpoint-derivative estimator (estimateDerivative :6-24).
Used for interpolating flow observables (t^2 E(t) -> t0/w0 scales) and
tuning curves.

Vectorized over evaluation points with jnp ops (jit/vmap-safe); the
setup solve is a tiny host-side Thomas algorithm on the knot arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def estimate_derivative(dx, dy) -> float:
    """Derivative at a point from 1-3 forward differences (dx[i], dy[i]
    relative to that point) by Taylor-series elimination
    (cspline.nim:6-24)."""
    dx = [float(v) for v in dx]
    dy = [float(v) for v in dy]
    n = len(dx)
    if n == 1:
        return dy[0] / dx[0]
    if n == 2:
        h10 = dx[1] - dx[0]
        return dy[0] * dx[1] / (dx[0] * h10) - dx[0] * dy[1] / (h10 * dx[1])
    if n == 3:
        h10 = dx[1] - dx[0]
        h02 = dx[0] - dx[2]
        h21 = dx[2] - dx[1]
        a = dy[0] * dx[1] * dx[2] / (dx[0] * h10 * h02)
        b = dx[0] * dy[1] * dx[2] / (dx[1] * h10 * h21)
        c = dx[0] * dx[1] * dy[2] / (dx[2] * h02 * h21)
        return -(a + b + c)
    raise ValueError(f"estimate_derivative: need 1-3 points, got {n}")


@dataclasses.dataclass(frozen=True)
class CSpline:
    """Cubic spline through knots (x, y) with second derivatives y2."""

    x: jax.Array
    y: jax.Array
    y2: jax.Array

    def __call__(self, t):
        """Evaluate at t (scalar or array); clamps to the knot range."""
        t = jnp.asarray(t)
        i = jnp.clip(jnp.searchsorted(self.x, t, side="right") - 1,
                     0, self.x.shape[0] - 2)
        xl, xh = self.x[i], self.x[i + 1]
        h = xh - xl
        a = (xh - t) / h
        b = (t - xl) / h
        return (a * self.y[i] + b * self.y[i + 1]
                + ((a ** 3 - a) * self.y2[i] + (b ** 3 - b) * self.y2[i + 1])
                * (h * h) / 6.0)

    def deriv(self, t):
        """First derivative of the spline at t."""
        t = jnp.asarray(t)
        i = jnp.clip(jnp.searchsorted(self.x, t, side="right") - 1,
                     0, self.x.shape[0] - 2)
        xl, xh = self.x[i], self.x[i + 1]
        h = xh - xl
        a = (xh - t) / h
        b = (t - xl) / h
        return ((self.y[i + 1] - self.y[i]) / h
                + ((3.0 * b * b - 1.0) * self.y2[i + 1]
                   - (3.0 * a * a - 1.0) * self.y2[i]) * h / 6.0)

    def solve(self, target, lo=None, hi=None, iters: int = 60):
        """x with spline(x) == target by bisection on [lo, hi]
        (the t0 / w0 scale-setting use case)."""
        lo = self.x[0] if lo is None else jnp.asarray(lo, self.x.dtype)
        hi = self.x[-1] if hi is None else jnp.asarray(hi, self.x.dtype)
        rising = self(hi) > self(lo)

        def body(_, ab):
            a, b = ab
            m = 0.5 * (a + b)
            below = jnp.where(rising, self(m) < target, self(m) > target)
            return jnp.where(below, m, a), jnp.where(below, b, m)

        a, b = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return 0.5 * (a + b)


def cspline(x, y, dy_lo: float | None = None,
            dy_hi: float | None = None) -> CSpline:
    """Build a cubic spline; natural boundaries (y''=0) by default,
    clamped (given first derivative) where dy_lo/dy_hi is set
    (cspline.nim CSplineBounds: CSBZeroD2y / CSBSetDy)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = x.size
    if n < 3:
        raise ValueError("cspline needs >= 3 knots")
    if np.any(np.diff(x) <= 0):
        raise ValueError("cspline knots must be strictly increasing")
    # Thomas solve for y'' (standard natural/clamped cubic spline)
    y2 = np.zeros(n)
    u = np.zeros(n)
    if dy_lo is not None:
        y2[0] = -0.5
        u[0] = (3.0 / (x[1] - x[0])) * ((y[1] - y[0]) / (x[1] - x[0])
                                        - float(dy_lo))
    for i in range(1, n - 1):
        sig = (x[i] - x[i - 1]) / (x[i + 1] - x[i - 1])
        p = sig * y2[i - 1] + 2.0
        y2[i] = (sig - 1.0) / p
        u[i] = ((y[i + 1] - y[i]) / (x[i + 1] - x[i])
                - (y[i] - y[i - 1]) / (x[i] - x[i - 1]))
        u[i] = (6.0 * u[i] / (x[i + 1] - x[i - 1]) - sig * u[i - 1]) / p
    if dy_hi is None:
        qn, un = 0.0, 0.0
    else:
        qn = 0.5
        un = (3.0 / (x[-1] - x[-2])) * (float(dy_hi)
                                        - (y[-1] - y[-2]) / (x[-1] - x[-2]))
    y2[-1] = (un - qn * u[-2]) / (qn * y2[-2] + 1.0)
    for i in range(n - 2, -1, -1):
        y2[i] = y2[i] * y2[i + 1] + u[i]
    return CSpline(jnp.asarray(x), jnp.asarray(y), jnp.asarray(y2))
