"""SU(N) group / algebra operations on lattice fields.

TPU-native replacement for QEX's src/maths/groupOps.nim and the random
field generators in src/gauge/gaugeUtils.nim (randomTAH :1377,
projectSU/checkSU).

Conventions
-----------
Algebra elements are **traceless anti-hermitian** (TAH) matrices ``p``.
The invariant inner product is ``<a, b> = -sum_sites retr(a b)`` which is
positive definite on TAH fields, and the HMC kinetic energy is
``K = -1/2 sum retr(p^2) = +1/2 sum_a xi_a^2`` when ``p`` is drawn by
:func:`random_tah` -- matching QEX's momentum normalization
(gauge/gaugeUtils.nim:1377-1454) so acceptance statistics are comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import linalg


def tah(m: jax.Array) -> jax.Array:
    """Traceless anti-hermitian projection.

    QEX parity: ``projectTAH`` (src/maths/groupOps.nim:608 neighborhood):
    P(m) = (m - m^dag)/2 - tr(m - m^dag)/(2 n) I.
    """
    n = m.shape[0]
    a = 0.5 * (m - linalg.adj(m))
    if n == 1:
        # u(1) is the full antihermitian line i*R -- no traceless
        # projection (the compact-U(1) models, puregauge2du1 analog)
        return a
    tr = linalg.trace(a) / n
    return a - tr * linalg.eye_like(m)


def norm2_tah(p: jax.Array) -> jax.Array:
    """Algebra norm: -sum retr(p^2) = sum_ij |p_ij|^2 (real, >= 0)."""
    return linalg.norm2(p)


def kinetic_energy(p: jax.Array) -> jax.Array:
    """HMC kinetic term K = -1/2 sum retr(p^2)."""
    return 0.5 * norm2_tah(p)


def random_tah(key: jax.Array, shape: tuple[int, ...], n: int,
               dtype=jnp.complex64) -> jax.Array:
    """Gaussian traceless anti-hermitian field, shape (n, n, *shape).

    Drawn from the Gaussian measure exp(-K) with K = 1/2 sum |p_ij|^2
    = -1/2 sum retr(p^2), so E[K] = (n^2-1)/2 per matrix (equipartition
    over the n^2-1 algebra dofs) -- the distribution QEX's ``randomTAH``
    samples (gauge/gaugeUtils.nim:1377-1454).

    Implementation: draw a complex Ginibre matrix g with unit-variance
    real components; p = tah(g) then has E|p_ij|^2 = 1 off-diagonal and
    E[-retr(p^2)] = n^2 - 1 exactly, as required.
    """
    rdtype = jnp.finfo(dtype).dtype
    kr, ki = jax.random.split(key)
    g = (jax.random.normal(kr, (n, n) + tuple(shape), rdtype)
         + 1j * jax.random.normal(ki, (n, n) + tuple(shape), rdtype))
    return tah(g.astype(dtype))


def random_unitary(key: jax.Array, shape: tuple[int, ...], n: int,
                   dtype=jnp.complex64) -> jax.Array:
    """Haar-random U(n) matrix field of shape (n, n, *shape).

    QR of a complex Ginibre ensemble with the R-diagonal phase fix
    (Mezzadri's algorithm).  Used for hot starts (QEX ``random`` gauge,
    gauge/gaugeUtils.nim `defaultSetup`/unit/random options).

    For small n the QR is a modified Gram-Schmidt written directly in
    the leading-matrix-axes layout: MGS with real-positive column norms
    IS the unique QR with positive diag(R), i.e. the Mezzadri phase
    convention, so the sample stays exactly Haar.  This matters on TPU:
    batched ``jnp.linalg.qr`` places the (n, n) axes minor, and XLA
    pads them to (8, 128) tiles -- a 57x HBM blowup that OOMs a 32^4
    hot start (40 GB for a 36 MB field).  Elementwise MGS has no such
    padding.  NOTE: different bitstream than the jnp.linalg.qr path.
    """
    rdtype = jnp.finfo(dtype).dtype
    kr, ki = jax.random.split(key)
    g = (jax.random.normal(kr, (n, n) + tuple(shape), rdtype)
         + 1j * jax.random.normal(ki, (n, n) + tuple(shape), rdtype))
    g = g.astype(dtype)
    if n > 5:
        # batched QR wants trailing matrix axes
        gm = jnp.moveaxis(g, (0, 1), (-2, -1))
        q, r = jnp.linalg.qr(gm)
        d = jnp.diagonal(r, axis1=-2, axis2=-1)
        ph = d / jnp.abs(d)
        q = q * ph[..., None, :]
        return jnp.moveaxis(q, (-2, -1), (0, 1))
    # columns g[:, j] are length-n site vectors over the lattice axes
    qcols: list[jax.Array] = []
    for j in range(n):
        v = g[:, j]
        for qi in qcols:
            # <q_i, v> per site, then v -= q_i <q_i, v>
            ip = jnp.sum(jnp.conj(qi) * v, axis=0)
            v = v - qi * ip
        nrm = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=0)).astype(dtype)
        qcols.append(v / nrm)
    return jnp.stack(qcols, axis=1)


def random_su(key: jax.Array, shape: tuple[int, ...], n: int,
              dtype=jnp.complex64) -> jax.Array:
    """Haar-random SU(n) field: U(n) sample with det phase removed."""
    u = random_unitary(key, shape, n, dtype)
    d = linalg.det(u)
    phase = jnp.angle(d)
    return u * jnp.exp(-1j * phase / n).astype(u.dtype)


def unit_gauge(lat, dtype=jnp.complex64) -> jax.Array:
    """Cold start: identity links, shape (nd, nc, nc, *dims)."""
    n = lat.nc
    ident = jnp.eye(n, dtype=dtype).reshape((1, n, n) + (1,) * lat.nd)
    return jnp.broadcast_to(ident, lat.gauge_shape()).astype(dtype)


def check_su(u: jax.Array) -> dict:
    """Unitarity/determinant deviation metrics (QEX ``checkSU``)."""
    n = u.shape[0]
    dev_u = linalg.norm2(linalg.mul_an(u, u) - linalg.eye_like(u))
    dev_d = linalg.norm2(linalg.det(u) - 1.0)
    nsites = math.prod(u.shape[2:]) if u.ndim > 2 else 1
    return {
        "unitarity_dev2_per_site": dev_u / nsites,
        "det_dev2_per_site": dev_d / nsites,
    }
