"""Site-local dense linear algebra on lattice fields.

TPU-native replacement for QEX's ``src/maths/`` layer
(matrixConcept.nim:116-123, matrixOps.nim, matexp.nim, matinv.nim,
matrixFunctions.nim:309-360).

All operations act on the *leading* site-tensor axes of a field array:
a matrix field has shape ``(n, m, *lattice_dims)`` and a vector field
``(n, *lattice_dims)``.  Every op is a small static loop of elementwise
multiplies/adds over full lattice volumes, which XLA fuses into a handful
of VPU passes -- the idiomatic TPU mapping of QEX's per-site SIMD kernels.

No data-dependent control flow: everything is jit/grad/vmap-safe.
"""

from __future__ import annotations

import contextlib as _contextlib
import os

import jax
import jax.numpy as jnp


# --- basic ops --------------------------------------------------------------

def adj(m: jax.Array) -> jax.Array:
    """Hermitian conjugate of a matrix field (leading two axes)."""
    return jnp.conj(jnp.swapaxes(m, 0, 1))


_LOOP_N = 5  # explicit expansion threshold (site matrices are tiny)


_FORCE_EINSUM = False


@_contextlib.contextmanager
def force_einsum():
    """Trace-time override: einsum site-linalg inside this block.

    Used by the huge-volume split pullback (mcmc/md): the
    loop-expanded staple VJP programs keep all ~81 expanded product
    planes live (a single level-2 staple-chunk VJP peaked 17 GB HBM at
    24^4), while the einsum form of the same program is compact."""
    global _FORCE_EINSUM
    old = _FORCE_EINSUM
    _FORCE_EINSUM = True
    try:
        yield
    finally:
        _FORCE_EINSUM = old


def _loop(n: int) -> bool:
    """Expand tiny site matmuls into explicit multiply-adds only when
    compiling for TPU: batched 3x3 dot_generals map terribly onto the
    MXU (measured ~3x slower on v5e) and the expanded form fuses into
    VPU passes, but the expansion also inflates CPU compile times
    severely (the f64 oracle test suite tripled), where einsum is
    already fine.  Decided at trace time from the default backend.

    QEX_TPU_LINALG_EINSUM=1 forces einsum everywhere: the expansion
    multiplies HLO size ~10x, and the very largest traced programs
    (e.g. the fused 24^4 multi-field smeared-HMC trajectory) can OOM
    the XLA compiler itself -- einsum trades ~20% step speed for a
    compilable graph there."""
    if _FORCE_EINSUM:
        return False
    if os.environ.get("QEX_TPU_LINALG_EINSUM", "0") == "1":
        return False
    return n <= _LOOP_N and jax.default_backend() == "tpu"


def _stack2(rows):
    return jnp.stack([jnp.stack(r) for r in rows])


def mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix-matrix product of two matrix fields: (a @ b) per site.

    Small fixed n expands into elementwise multiply-adds: batched tiny
    matmuls via dot_general map terribly onto the TPU MXU (measured
    ~3x slower than the expanded form on v5e), and the VPU form fuses
    with neighbors.
    """
    n, m_, k = a.shape[0], b.shape[1], a.shape[1]
    if not _loop(max(n, m_, k)):
        return jnp.einsum("ab...,bc...->ac...", a, b)
    return _stack2([[sum(a[i, l] * b[l, j] for l in range(k))
                     for j in range(m_)] for i in range(n)])


def mul_an(a: jax.Array, b: jax.Array) -> jax.Array:
    """adj(a) @ b per site (QEX's ``mul(r, a.adj, b)``)."""
    n, m_, k = a.shape[1], b.shape[1], a.shape[0]
    if not _loop(max(n, m_, k)):
        return jnp.einsum("ba...,bc...->ac...", jnp.conj(a), b)
    return _stack2([[sum(jnp.conj(a[l, i]) * b[l, j] for l in range(k))
                     for j in range(m_)] for i in range(n)])


def mul_na(a: jax.Array, b: jax.Array) -> jax.Array:
    """a @ adj(b) per site."""
    n, m_, k = a.shape[0], b.shape[0], a.shape[1]
    if not _loop(max(n, m_, k)):
        return jnp.einsum("ab...,cb...->ac...", a, jnp.conj(b))
    return _stack2([[sum(a[i, l] * jnp.conj(b[j, l]) for l in range(k))
                     for j in range(m_)] for i in range(n)])


def mul_aa(a: jax.Array, b: jax.Array) -> jax.Array:
    """adj(a) @ adj(b) per site."""
    n, m_, k = a.shape[1], b.shape[0], a.shape[0]
    if not _loop(max(n, m_, k)):
        return jnp.einsum("ba...,cb...->ac...", jnp.conj(a), jnp.conj(b))
    return _stack2([[sum(jnp.conj(a[l, i] * b[j, l]) for l in range(k))
                     for j in range(m_)] for i in range(n)])


def mv(m: jax.Array, v: jax.Array) -> jax.Array:
    """Matrix-vector product per site: (m @ v)."""
    n, k = m.shape[0], m.shape[1]
    if not _loop(max(n, k)):
        return jnp.einsum("ab...,b...->a...", m, v)
    return jnp.stack([sum(m[i, l] * v[l] for l in range(k))
                      for i in range(n)])


def mv_an(m: jax.Array, v: jax.Array) -> jax.Array:
    """adj(m) @ v per site."""
    n, k = m.shape[1], m.shape[0]
    if not _loop(max(n, k)):
        return jnp.einsum("ba...,b...->a...", jnp.conj(m), v)
    return jnp.stack([sum(jnp.conj(m[l, i]) * v[l] for l in range(k))
                      for i in range(n)])


def outer(v: jax.Array, w: jax.Array) -> jax.Array:
    """Outer product v w^dagger per site -> matrix field."""
    return jnp.einsum("a...,b...->ab...", v, jnp.conj(w))


def trace(m: jax.Array) -> jax.Array:
    """Per-site trace (complex scalar field)."""
    return jnp.einsum("aa...->...", m)


def re_trace(m: jax.Array) -> jax.Array:
    return jnp.real(trace(m))


def eye_like(m: jax.Array) -> jax.Array:
    """Identity matrix field broadcastable against matrix field ``m``."""
    n = m.shape[0]
    ident = jnp.eye(n, dtype=m.dtype)
    return ident.reshape((n, n) + (1,) * (m.ndim - 2))


def norm2(x: jax.Array) -> jax.Array:
    """Global squared 2-norm: sum |x|^2 over all axes (real scalar).

    QEX parity: Field.norm2 (src/field/fieldET.nim reductions), which does
    thread-local sums + qmpSum.  Here XLA emits a deterministic tree
    reduction (and a psum over the mesh when sharded).
    """
    xr = jnp.real(x)
    xi = jnp.imag(x)
    return jnp.sum(xr * xr) + jnp.sum(xi * xi)


def dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Global inner product <x, y> = sum conj(x) y (complex scalar)."""
    return jnp.sum(jnp.conj(x) * y)


def redot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Real part of the global inner product (QEX ``redot``)."""
    return jnp.sum(jnp.real(x) * jnp.real(y) + jnp.imag(x) * jnp.imag(y))


# --- 3x3 (and general small-n) closed forms ---------------------------------

def _minor(m: jax.Array, i: int, j: int) -> list[list[jax.Array]]:
    """(n-1)x(n-1) minor of a matrix field as nested element lists."""
    n = m.shape[0]
    return [[m[a, b] for b in range(n) if b != j]
            for a in range(n) if a != i]


def _det_elems(rows: list[list[jax.Array]]) -> jax.Array:
    """Determinant by Laplace expansion on nested element lists (keeps
    everything elementwise over the lattice -- no padded batched LU)."""
    n = len(rows)
    if n == 1:
        return rows[0][0]
    if n == 2:
        return rows[0][0] * rows[1][1] - rows[0][1] * rows[1][0]
    out = None
    for j in range(n):
        sub = [[rows[a][b] for b in range(n) if b != j]
               for a in range(1, n)]
        term = rows[0][j] * _det_elems(sub)
        if j % 2:
            term = -term
        out = term if out is None else out + term
    return out


def det(m: jax.Array) -> jax.Array:
    """Per-site determinant: closed form for n <= 5 (elementwise over
    the lattice, TPU-friendly), batched LU above (multi_nc genericity,
    reference src/maths/matinv.nim handles any static n)."""
    n = m.shape[0]
    if n == 1:
        return m[0, 0]
    if n == 2:
        return m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    if n == 3:
        return (
            m[0, 0] * (m[1, 1] * m[2, 2] - m[1, 2] * m[2, 1])
            - m[0, 1] * (m[1, 0] * m[2, 2] - m[1, 2] * m[2, 0])
            + m[0, 2] * (m[1, 0] * m[2, 1] - m[1, 1] * m[2, 0])
        )
    if n <= 5:
        return _det_elems([[m[i, j] for j in range(n)]
                           for i in range(n)])
    return jnp.linalg.det(jnp.moveaxis(m, (0, 1), (-2, -1)))


def inv(m: jax.Array) -> jax.Array:
    """Per-site inverse for n in {1, 2, 3} via adjugate/determinant.

    QEX parity: src/maths/matinv.nim.
    """
    n = m.shape[0]
    d = det(m)
    if n == 1:
        return (1.0 / d)[None, None]
    if n == 2:
        rows = [[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]
    elif n == 3:
        def cof(i, j):
            i1, i2 = [a for a in range(3) if a != i]
            j1, j2 = [a for a in range(3) if a != j]
            return m[i1, j1] * m[i2, j2] - m[i1, j2] * m[i2, j1]
        # adjugate = transpose of cofactor matrix with checkerboard signs
        rows = [
            [((-1) ** (i + j)) * cof(j, i) for j in range(3)]
            for i in range(3)
        ]
    elif n <= 5:
        rows = [
            [((-1) ** (i + j)) * _det_elems(_minor(m, j, i))
             for j in range(n)]
            for i in range(n)
        ]
    else:
        mi = jnp.linalg.inv(jnp.moveaxis(m, (0, 1), (-2, -1)))
        return jnp.moveaxis(mi, (-2, -1), (0, 1))
    adjugate = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
    return adjugate / d


# --- matrix exponential -----------------------------------------------------

def expm(m: jax.Array, order: int = 12, squarings: int = 4) -> jax.Array:
    """Per-site matrix exponential via Taylor + scaling-and-squaring.

    TPU-native analog of QEX's ``exp``/``expPoly3`` (src/maths/matexp.nim:
    53-90).  A fixed (static) order/squaring count keeps this jit-stable
    and exactly differentiable; for HMC/flow step sizes the argument norm
    is O(1e-1), giving errors far below f32 resolution at the defaults.
    """
    x = m * (0.5 ** squarings)
    r = eye_like(m) + x
    term = x
    fac = 1.0
    for k in range(2, order + 1):
        term = mul(term, x)
        fac = fac / k
        r = r + term * fac
    for _ in range(squarings):
        r = mul(r, r)
    return r


def sqrtm_db(m: jax.Array, iters: int = 20) -> jax.Array:
    """Principal matrix square root by the Denman-Beavers iteration
    (QEX matroot.nim analog): Y <- (Y + Z^-1)/2, Z <- (Z + Y^-1)/2.

    Quadratically convergent for matrices with no nonpositive-real
    eigenvalues; built from the closed-form ``inv`` (n <= 3) so it is
    jit/grad-safe.
    """
    y = m
    z = eye_like(m)
    for _ in range(iters):
        yn = 0.5 * (y + inv(z))
        zn = 0.5 * (z + inv(y))
        y, z = yn, zn
    return y


def logm(m: jax.Array, sqrt_iters: int = 6, series_order: int = 12,
         db_iters: int = 20) -> jax.Array:
    """Principal matrix logarithm by inverse scaling-and-squaring
    (QEX matlog.nim analog): repeated Denman-Beavers square roots until
    near identity, then the Mercator series of log(I + X), scaled back.

    Intended for near-unitary / near-identity fields (gauge links,
    smeared links); for SU(n) links logm is the algebra-valued log used
    by Landau-type gauge conditions and flow diagnostics.
    """
    x = m
    for _ in range(sqrt_iters):
        x = sqrtm_db(x, iters=db_iters)
    d = x - eye_like(m)
    # log(I + d) = d - d^2/2 + d^3/3 - ...
    acc = jnp.zeros_like(m)
    term = eye_like(m)
    for j in range(1, series_order + 1):
        term = mul(term, d)
        acc = acc + ((-1.0) ** (j + 1) / j) * term
    return (2.0 ** sqrt_iters) * acc


# --- hermitian inverse square root / unitary projection ---------------------

def rsqrt_phm(h: jax.Array, iters: int = 14, eps: float = 1e-30) -> jax.Array:
    """Inverse square root of a positive-definite hermitian matrix field.

    Newton-Schulz iteration (coupled form), fully differentiable and
    composed of small matmuls -- the stable differentiable formulation of
    QEX's ``rsqrtPHM`` (src/maths/matrixFunctions.nim:309-360) that nHYP /
    HISQ projection forces need.

    The input is pre-scaled by its per-site trace so the iteration's
    convergence condition ||I - H/s|| < 1 holds for any SPD input.
    """
    n = h.shape[0]
    ident = eye_like(h)
    # scale: s ~ tr(h)/n bounds the largest eigenvalue within [s/n, s*n]
    s = jnp.real(trace(h)) / n + eps
    a = h / s
    # coupled Newton-Schulz: y -> a^{1/2}, z -> a^{-1/2}
    y = a
    z = ident
    for _ in range(iters):
        t = 0.5 * (3.0 * ident - mul(z, y))
        y = mul(y, t)
        z = mul(t, z)
    return z / jnp.sqrt(s)


def _project_u_ns(x: jax.Array, iters: int = 14) -> jax.Array:
    """project_u via plain AD-differentiable Newton-Schulz (any n)."""
    h = mul_an(x, x)
    return mul(x, rsqrt_phm(h, iters=iters))


def _eigvals_herm3(h: jax.Array):
    """Closed-form eigenvalues of a 3x3 Hermitian matrix field
    (trigonometric Cardano), elementwise over the lattice axes --
    never batched ``jnp.linalg.eigh`` (lane-padding disaster on TPU).
    Returns three real arrays (one eigenvalue field each)."""
    idm = eye_like(h)
    q = jnp.real(trace(h)) / 3.0
    hd = h - q.astype(h.dtype) * idm
    p2 = jnp.real(trace(mul(hd, hd)))  # = sum of |hd|^2 eigenvalues
    tiny = jnp.asarray(1e-30, p2.dtype)
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, tiny))
    b = hd / p.astype(h.dtype)
    r = jnp.clip(jnp.real(det(b)) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    return tuple(q + 2.0 * p * jnp.cos(phi - two_pi_3 * k)
                 for k in range(3))


def _sylvester_herm3(r: jax.Array, m: jax.Array, s123) -> jax.Array:
    """Solve R N + N R = M for a 3x3 Hermitian positive field R whose
    eigenvalues are ``s123``, WITHOUT eigenvectors: the Sylvester
    operator T(A) = RA + AR is annihilated by the degree-6 monic
    polynomial with roots {s_i + s_j, i <= j}, so T^{-1} is a degree-5
    polynomial in T with coefficients built from the roots --
    degeneracy-safe (repeated roots are still an annihilating
    polynomial) and fully elementwise."""
    s1, s2, s3 = s123
    roots = (2.0 * s1, 2.0 * s2, 2.0 * s3, s1 + s2, s1 + s3, s2 + s3)
    # monic coefficients, highest degree first: prod(t - root)
    coeffs = [jnp.ones_like(s1)]
    for rt in roots:
        nxt = [coeffs[0]]
        for k in range(1, len(coeffs)):
            nxt.append(coeffs[k] - rt * coeffs[k - 1])
        nxt.append(-rt * coeffs[-1])
        coeffs = nxt
    # q(t) = sum_k a_k t^k with a_k = coeffs[6-k]; q(T) = 0 gives
    # T^{-1} M = -(1/a0) (a1 M + a2 T M + ... + a6 T^5 M), a6 = 1
    a = [coeffs[6 - k] for k in range(7)]
    cdtype = m.dtype

    def tapp(x):
        return mul(r, x) + mul(x, r)

    tm = m
    acc = a[1].astype(cdtype) * m
    for k in range(2, 7):
        tm = tapp(tm)
        acc = acc + a[k].astype(cdtype) * tm
    return -acc / a[0].astype(cdtype)


def _project_u3_fwd(x, iters):
    h = mul_an(x, x)
    s = rsqrt_phm(h, iters=iters)
    return mul(x, s), (x, s)


def _project_u3_bwd(iters, res, g):
    """Exact polar-projection VJP in closed form (the QEX
    ``projectUDeriv`` role, src/maths/matrixFunctions.nim:309-360 /
    projUderiv.nim) -- derived from dP = dX S - P dR S with
    R dR + dR R = dH, H = X^dag X, R = H^{1/2}, S = H^{-1/2}:

        G_X = G_P S^T - conj(X) N^T - conj(X N),
        R N + N R = S G_P^T P.

    Memory: O(1) in the Newton-Schulz iteration count (the AD-through-
    iterations backward stores every iterate -- the dominant HBM cost
    of the nHYP/HISQ force pullback at production volumes).
    """
    x, s = res
    h = mul_an(x, x)
    r = mul(h, s)                       # H^{1/2} (= H * H^{-1/2})
    p = mul(x, s)
    m = mul(mul(s, jnp.swapaxes(g, 0, 1)), p)
    l1, l2, l3 = _eigvals_herm3(h)
    sq = tuple(jnp.sqrt(jnp.maximum(l, 1e-30)) for l in (l1, l2, l3))
    n = _sylvester_herm3(r, m, sq)
    gx = (mul(g, jnp.swapaxes(s, 0, 1))
          - mul(jnp.conj(x), jnp.swapaxes(n, 0, 1))
          - jnp.conj(mul(x, n)))
    return (gx,)


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _project_u3(x: jax.Array, iters: int) -> jax.Array:
    return _project_u_ns(x, iters)


_project_u3.defvjp(_project_u3_fwd, _project_u3_bwd)


def project_u(x: jax.Array, iters: int = 14) -> jax.Array:
    """Polar projection U = X (X^dagger X)^{-1/2} onto U(n).

    QEX parity: ``projectU`` (src/maths/matrixFunctions.nim:309-360), the
    heart of nHYP/HISQ smearing.  Differentiable end-to-end; for n=3 the
    backward pass is the closed-form spectral VJP (QEX's hand-derived
    ``projectUDeriv`` analog, O(1) memory in the iteration count); other
    n fall back to AD through the Newton-Schulz iterations.
    """
    if x.shape[0] == 3 and x.shape[1] == 3:
        return _project_u3(x, iters)
    return _project_u_ns(x, iters)


def project_su(x: jax.Array, iters: int = 14) -> jax.Array:
    """Project onto SU(n): polar projection then det-phase removal.

    QEX parity: ``projectSU`` (src/gauge/gaugeUtils.nim).
    """
    n = x.shape[0]
    u = project_u(x, iters=iters)
    d = det(u)
    phase = jnp.angle(d)
    return u * jnp.exp(-1j * phase / n).astype(u.dtype)
