"""Two-float ("double-single") compensated reductions.

The reference runs every Hamiltonian accumulation in f64
(/root/reference/src/hmc/metropolis.nim:6-16 -- hOld/hNew/deltaH are
``float``; the whole stack defaults to "D" precision,
/root/reference/src/base/globals.nim:33-56), so Metropolis
accept/reject is exact at any volume.  On TPU the working precision is
f32: at 16^3x32 the Hamiltonian is ~6e6 and one ulp is ~0.25-0.5, so a
plain ``jnp.sum`` quantizes dH at O(1) -- every acceptance number at
volume becomes noise (the round-3 CONFIG3 artifact recorded dH = 58.0
*exactly*).

This module provides error-free-transformation building blocks (Knuth
two-sum, Veltkamp/Dekker two-prod -- no FMA primitive is exposed by
lax) and pairwise two-float reduction trees.  A value is carried as an
``(hi, lo)`` pair with ``hi + lo`` accurate to ~2x the working
precision; summing N per-site f32 values this way leaves only the
per-element input rounding (~sqrt(N) * ulp(site) << 1), which is the
same floor the f64 reference has relative to exact reals.

Used by the ``action2`` / ``hamiltonian2`` path (mcmc/theory.py):
dH = (hi1 - hi0) + (lo1 - lo0) with the hi difference exact by
Sterbenz cancellation.  The MD force path is untouched (forces are
O(1) per site; f32 is fine there).

All functions are jit-safe and differentiable-in-principle, but the
intended use is value-only measurement.  XLA's algebraic simplifier
does not reassociate floats at default settings, so the error terms
survive compilation (verified by tests/test_dsum.py at 1e6 elements).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Pair = tuple[jax.Array, jax.Array]


def two_sum(a: jax.Array, b: jax.Array) -> Pair:
    """Error-free sum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _fast_renorm(hi: jax.Array, lo: jax.Array) -> Pair:
    """Fast two-sum renormalization (requires |hi| >= |lo| roughly,
    which holds after an accumulation step)."""
    s = hi + lo
    return s, lo - (s - hi)


def _split_scale(dtype) -> float:
    """Veltkamp splitting constant 2^ceil((p)/2)+1 for precision p."""
    mant = jnp.finfo(dtype).nmant + 1        # f32: 24, f64: 53
    return float(2 ** ((mant + 1) // 2) + 1)  # f32: 2^12+1, f64: 2^27+1


def two_prod(a: jax.Array, b: jax.Array) -> Pair:
    """Error-free product via Dekker splitting: p + e == a * b."""
    c = jnp.asarray(_split_scale(jnp.result_type(a, b)),
                    jnp.result_type(a, b))
    p = a * b
    ca = c * a
    ah = ca - (ca - a)
    al = a - ah
    cb = c * b
    bh = cb - (cb - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_const(x: float, dtype) -> Pair:
    """Represent a python float as an (hi, lo) pair in ``dtype``."""
    hi = jnp.asarray(x, dtype)
    lo = jnp.asarray(x - float(hi), dtype)
    return hi, lo


def df_zero(dtype) -> Pair:
    z = jnp.zeros((), dtype)
    return z, z


def df_add(x: Pair, y: Pair) -> Pair:
    s, e = two_sum(x[0], y[0])
    return _fast_renorm(s, e + (x[1] + y[1]))


def df_neg(x: Pair) -> Pair:
    return -x[0], -x[1]


def df_sub(x: Pair, y: Pair) -> Pair:
    return df_add(x, df_neg(y))


def df_scale(x: Pair, c) -> Pair:
    """Pair times a scalar (array or python float)."""
    c = jnp.asarray(c, x[0].dtype)
    p, e = two_prod(x[0], c)
    return _fast_renorm(p, e + x[1] * c)


def df_value(x: Pair) -> jax.Array:
    """Collapse to the working precision."""
    return x[0] + x[1]


def sum2(x: jax.Array) -> Pair:
    """Compensated sum of a REAL array: pairwise two-float tree.

    Only the input values' own rounding survives; the accumulation is
    error-free to the two-float envelope (~2x working precision).
    """
    hi = x.reshape(-1)
    lo = jnp.zeros_like(hi)
    while hi.shape[0] > 1:
        n = hi.shape[0]
        m = n // 2
        h, l = df_add((hi[:m], lo[:m]), (hi[m:2 * m], lo[m:2 * m]))
        if n % 2:
            h = jnp.concatenate([h, hi[2 * m:]])
            l = jnp.concatenate([l, lo[2 * m:]])
        hi, lo = h, l
    return hi[0], lo[0]


def sum2_last(x: jax.Array) -> Pair:
    """Compensated sum over the LAST axis (leading axes preserved):
    the vectorized form of :func:`sum2` for batched reductions (e.g.
    all Gram-matrix entries at once, eigens/refine.py).  Returns
    (hi, lo) arrays of shape x.shape[:-1]."""
    hi = x
    lo = jnp.zeros_like(x)
    while hi.shape[-1] > 1:
        n = hi.shape[-1]
        m = n // 2
        h, l = df_add((hi[..., :m], lo[..., :m]),
                      (hi[..., m:2 * m], lo[..., m:2 * m]))
        if n % 2:
            h = jnp.concatenate([h, hi[..., 2 * m:]], axis=-1)
            l = jnp.concatenate([l, lo[..., 2 * m:]], axis=-1)
        hi, lo = h, l
    return hi[..., 0], lo[..., 0]


def norm22(x: jax.Array) -> Pair:
    """Compensated global |x|^2 (complex or real input)."""
    xr = jnp.real(x)
    xi = jnp.imag(x) if jnp.iscomplexobj(x) else None
    y = xr * xr if xi is None else xr * xr + xi * xi
    return sum2(y)


def redot2(x: jax.Array, y: jax.Array) -> Pair:
    """Compensated Re<x, y> = sum Re(conj(x) y)."""
    z = jnp.real(jnp.conj(x) * y) if (jnp.iscomplexobj(x)
                                      or jnp.iscomplexobj(y)) \
        else x * y
    return sum2(z)


def cdot2(x: jax.Array, y: jax.Array) -> jax.Array:
    """Compensated complex <x, y> = sum conj(x) y, collapsed to one
    complex scalar in the working precision.  The collapse keeps the
    ENTRY accurate to ~eps relative (instead of the ~sqrt(N)*eps of a
    plain f32 reduction) -- the enabler for f32 Rayleigh-Ritz
    projections at lattice volumes (eigens/refine.py)."""
    z = jnp.conj(x) * y
    re = sum2(jnp.real(z))
    im = sum2(jnp.imag(z))
    return (df_value(re) + 1j * df_value(im)).astype(x.dtype)
