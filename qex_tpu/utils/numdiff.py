"""Richardson-extrapolated numerical differentiation (Ridders 1982).

TPU-native replacement for the reference's src/algorithms/numdiff.nim
(ndiff :55, ndiff2 :63): accurate f'(x) and the combined f'(x)+f''(x)
stencil via Neville-style polynomial extrapolation of central
differences with geometrically shrinking step.

In this framework most derivatives come from jax.grad; these routines
exist for the same reason the reference keeps them -- validating
analytic/AD forces against an independent numerical oracle (used by the
finite-difference force tests) and differentiating observables that are
only available as black-box scalars.

Works on any pytree-of-arrays codomain (F may be a field); the scalar
abscissa x is the differentiation variable.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import numpy as np


def _tree_scale_add(a, sa, b, sb):
    return jax.tree_util.tree_map(lambda x, y: sa * x + sb * y, a, b)


def _tree_max_absdiff(a, b):
    leaves = jax.tree_util.tree_map(
        lambda x, y: float(np.max(np.abs(np.asarray(x) - np.asarray(y)))),
        a, b)
    return max(jax.tree_util.tree_leaves(leaves) or [0.0])


def _ridders(samples, scale):
    """Neville extrapolation table over samples A[i] taken at step
    dx/scale**i; returns (limit, err) with err = max |limit - last two
    column entries| (numdiff.nim ndiffTemplate parity)."""
    a = list(samples)
    n = len(a)
    s2 = scale * scale
    b = s2
    for j in range(n - 1, 1, -1):
        c = 1.0 / (b - 1.0)
        for i in range(j):
            a[i] = _tree_scale_add(a[i + 1], b * c, a[i], -c)
        b *= s2
    # final refinement from the last two rows
    c = 1.0 / (b - 1.0)
    r = _tree_scale_add(a[1], b * c, a[0], -c)
    err = max(_tree_max_absdiff(r, a[0]), _tree_max_absdiff(r, a[1]))
    return r, err


def ndiff(f: Callable, x: float, dx: float, scale: float = 2.0,
          ord_max: int = 8) -> Tuple[object, float]:
    """f'(x) via extrapolated central differences.

    Returns (derivative, err) where err estimates the extrapolation
    error (numdiff.nim:55-61).  ``f`` may return any pytree of arrays.
    """
    samples = []
    h = float(dx)
    for _ in range(ord_max):
        fp, fm = f(x + h), f(x - h)
        samples.append(_tree_scale_add(fp, 0.5 / h, fm, -0.5 / h))
        h /= scale
    return _ridders(samples, scale)


def ndiff2(f: Callable, x: float, dx: float, scale: float = 2.0,
           ord_max: int = 8) -> Tuple[object, float]:
    """Second derivative f''(x) via extrapolated second differences
    (numdiff.nim ndiff2 :63)."""
    f0 = f(x)
    samples = []
    h = float(dx)
    for _ in range(ord_max):
        fp, fm = f(x + h), f(x - h)
        s = _tree_scale_add(fp, 1.0 / (h * h), fm, 1.0 / (h * h))
        s = _tree_scale_add(s, 1.0, f0, -2.0 / (h * h))
        samples.append(s)
        h /= scale
    return _ridders(samples, scale)
