"""Layout experiments for the eo staggered Dslash on TPU.

Explores data layouts for the hot kernel (cf. bench.py headline):
  v0: canonical (nc, X, Y, Z, Th) -- Th=16 minor axis underfills lanes
  v1: transposed (nc, Th, Z, Y, X) -- X=32 minor
  v2: flattened minor (nc, Th, Z, Y*X) -- 1024 minor axis, full lanes;
      x-shifts become double-roll + lane-column select
  v3: v2 with links pre-transposed for the backward term
      (mul_an without transpose at runtime)

Run on the TPU: python benchx.py ; prints ms/app and GB/s for each.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import eo, group, linalg
    from qex_tpu.physics import staggered as st

    dims = (32, 32, 32, 32)
    lat = Lattice(dims)
    dtype = jnp.complex64
    iters = 30
    X, Y, Z, T = dims
    Th = T // 2

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, lat.nd + 1)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               dtype))
            for i in range(lat.nd)])
        s = st.new_stag_eo(lat, u)
        x = jax.random.normal(ks[-1], (lat.nc,) + dims[:-1] + (Th,),
                              jnp.float32).astype(dtype)
        return s.g_e, s.g_o, x

    ge, go, x = setup(jax.random.PRNGKey(7))

    def timeit(fn, *args, name=""):
        out = fn(*args)
        float(out)
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)
        dt = (time.perf_counter() - t0) / iters
        sites = lat.volume // 2
        bytes_moved = (8 * 72 + 8 * 24 + 24) * sites
        print(f"{name}: {dt*1e3:.3f} ms/app  "
              f"{bytes_moved/dt/1e9:.0f} GB/s eff  "
              f"{594*sites/dt/1e9:.1f} GF/s", flush=True)
        return dt

    # --- v0: current canonical layout ----------------------------------
    @jax.jit
    def v0(ge, go, v):
        so = st.StaggeredEO(lat, ge, go)

        def body(v, _):
            w = st.dslash_eo(so, v, parity_out=1)
            w = st.dslash_eo(so, w, parity_out=0)
            w = w / jnp.sqrt(linalg.norm2(w)).astype(w.dtype)
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.real(linalg.norm2(v)).astype(jnp.float32)

    timeit(v0, ge, go, x, name="v0 canonical (nc,X,Y,Z,Th)")

    # --- v1: transposed (nc, Th, Z, Y, X) ------------------------------
    # lattice dir mu ordering stays (x,y,z,t) logically; we permute the
    # array axes and adjust shifts accordingly.
    perm = (0, 4, 3, 2, 1)  # (nc, X, Y, Z, Th) -> (nc, Th, Z, Y, X)
    permg = (0, 1, 2, 6, 5, 4, 3)

    ge1 = jnp.transpose(ge, permg)
    go1 = jnp.transpose(go, permg)
    x1 = jnp.transpose(x, perm)
    # axis of lattice dir mu in transposed layout: x->-1, y->-2, z->-3,
    # t->-4
    ax = {0: -1, 1: -2, 2: -3, 3: -4}

    def smask1(parity):
        # s = (parity + x + y + z) mod 2 on trailing (Z, Y, X) axes
        xg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 2)
        yg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 1)
        zg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y, X), 0)
        return ((parity + xg + yg + zg) % 2).astype(bool)[None]

    def shift1(f, mu, sign, parity_out):
        if mu != 3:
            return jnp.roll(f, -sign, f.ndim + ax[mu])
        s = smask1(parity_out)
        if sign > 0:
            base, extra = f, jnp.roll(f, -1, f.ndim + ax[3])
        else:
            base, extra = jnp.roll(f, 1, f.ndim + ax[3]), f
        return jnp.where(s, extra, base)

    def dslash1(g_out, g_src, v, parity_out):
        out = None
        for mu in range(4):
            fwd = jnp.einsum("ab...,b...->a...", g_out[mu],
                             shift1(v, mu, +1, parity_out))
            tmp = jnp.einsum("ba...,b...->a...", jnp.conj(g_src[mu]), v)
            bwd = shift1(tmp, mu, -1, parity_out)
            term = fwd - bwd
            out = term if out is None else out + term
        return 0.5 * out

    @jax.jit
    def v1(ge, go, v):
        def body(v, _):
            w = dslash1(go, ge, v, 1)
            w = dslash1(ge, go, w, 0)
            w = w / jnp.sqrt(linalg.norm2(w)).astype(w.dtype)
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.real(linalg.norm2(v)).astype(jnp.float32)

    timeit(v1, ge1, go1, x1, name="v1 transposed (nc,Th,Z,Y,X)")

    # --- v2: flattened minor (nc, Th, Z, Y*X) --------------------------
    ge2 = ge1.reshape(4, 3, 3, Th, Z, Y * X)
    go2 = go1.reshape(4, 3, 3, Th, Z, Y * X)
    x2 = x1.reshape(3, Th, Z, Y * X)

    xcol = jax.lax.broadcasted_iota(jnp.int32, (Y * X,), 0) % X

    def shift2(f, mu, sign, parity_out):
        if mu == 0:  # x: double roll + boundary-column fix
            if sign > 0:
                a = jnp.roll(f, -1, -1)
                b = jnp.roll(f, X - 1, -1)
                return jnp.where(xcol == X - 1, b, a)
            a = jnp.roll(f, 1, -1)
            b = jnp.roll(f, -(X - 1), -1)
            return jnp.where(xcol == 0, b, a)
        if mu == 1:  # y: roll by X within the flattened axis
            return jnp.roll(f, -sign * X, -1)
        if mu == 2:
            return jnp.roll(f, -sign, -2)
        # t with parity select
        zg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y * X), 0)
        yxg = jax.lax.broadcasted_iota(jnp.int32, (Z, Y * X), 1)
        xg = yxg % X
        yg = yxg // X
        s = ((parity_out + xg + yg + zg) % 2).astype(bool)[None]
        if sign > 0:
            base, extra = f, jnp.roll(f, -1, -3)
        else:
            base, extra = jnp.roll(f, 1, -3), f
        return jnp.where(s, extra, base)

    def dslash2(g_out, g_src, v, parity_out):
        out = None
        for mu in range(4):
            fwd = jnp.einsum("ab...,b...->a...", g_out[mu],
                             shift2(v, mu, +1, parity_out))
            tmp = jnp.einsum("ba...,b...->a...", jnp.conj(g_src[mu]), v)
            bwd = shift2(tmp, mu, -1, parity_out)
            term = fwd - bwd
            out = term if out is None else out + term
        return 0.5 * out

    @jax.jit
    def v2(ge, go, v):
        def body(v, _):
            w = dslash2(go, ge, v, 1)
            w = dslash2(ge, go, w, 0)
            w = w / jnp.sqrt(linalg.norm2(w)).astype(w.dtype)
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.real(linalg.norm2(v)).astype(jnp.float32)

    timeit(v2, ge2, go2, x2, name="v2 flat minor (nc,Th,Z,Y*X)")

    # --- v3: v2 with real/imag split (2, ...) f32 ----------------------
    def split(a):
        return jnp.stack([jnp.real(a), jnp.imag(a)])

    ge3, go3, x3 = split(ge2), split(go2), split(x2)

    def cmul_mv(g, v):
        # g: (2, nc, nc, ...), v: (2, nc, ...) -> (2, nc, ...)
        gr, gi = g[0], g[1]
        vr, vi = v[0], v[1]
        rr = jnp.einsum("ab...,b...->a...", gr, vr) \
            - jnp.einsum("ab...,b...->a...", gi, vi)
        ri = jnp.einsum("ab...,b...->a...", gr, vi) \
            + jnp.einsum("ab...,b...->a...", gi, vr)
        return jnp.stack([rr, ri])

    def cmul_mv_adj(g, v):
        gr, gi = g[0], g[1]
        vr, vi = v[0], v[1]
        rr = jnp.einsum("ba...,b...->a...", gr, vr) \
            + jnp.einsum("ba...,b...->a...", gi, vi)
        ri = jnp.einsum("ba...,b...->a...", gr, vi) \
            - jnp.einsum("ba...,b...->a...", gi, vr)
        return jnp.stack([rr, ri])

    def dslash3(g_out, g_src, v, parity_out):
        out = None
        for mu in range(4):
            fwd = cmul_mv(g_out[:, mu], shift2(v, mu, +1, parity_out))
            tmp = cmul_mv_adj(g_src[:, mu], v)
            bwd = shift2(tmp, mu, -1, parity_out)
            term = fwd - bwd
            out = term if out is None else out + term
        return 0.5 * out

    @jax.jit
    def v3(ge, go, v):
        def body(v, _):
            w = dslash3(go, ge, v, 1)
            w = dslash3(ge, go, w, 0)
            n = jnp.sqrt(jnp.sum(w * w))
            return w / n, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.sum(v * v).astype(jnp.float32)

    timeit(v3, ge3, go3, x3, name="v3 re/im split f32")


if __name__ == "__main__":
    main()
