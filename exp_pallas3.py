"""Experiment: split v3 dslash kernel into DMA-only / compute-only parts
to locate the non-overlap.  Modes:
  dma      -- stream all 8 link blocks per th, trivial compute
  compute  -- full compute, links read from resident scratch (no HBM DMA)
  full     -- the real kernel (baseline, equals stag_pallas3)
Usage: python exp_pallas3.py [dma|compute|full] [nslots]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(X, parity_out, nslots, mode):
    def kernel(l_hbm, psi_c, psi_tm, psi_tp, out, lbuf, sem):
        th = pl.program_id(0)
        Z, YX = out.shape[-2], out.shape[-1]
        xg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) % X
        yg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 1) // X
        zg = jax.lax.broadcasted_iota(jnp.int32, (Z, YX), 0)
        s_par = ((parity_out + xg + yg + zg) % 2) == 1

        def dma(term, buf):
            return pltpu.make_async_copy(l_hbm.at[term, th],
                                         lbuf.at[buf], sem.at[buf])

        def cvec(ref):
            return [(ref[0, c, 0], ref[1, c, 0]) for c in range(3)]

        def roll_pair(v, sh, axis=1):
            sh = sh % (YX if axis == 1 else Z)
            return tuple(pltpu.roll(x, sh, axis) for x in v)

        def sel_pair(mask, a, b):
            return tuple(jnp.where(mask, xa, xb)
                         for xa, xb in zip(a, b))

        psi = cvec(psi_c)
        psi_tm_v = cvec(psi_tm)
        psi_tp_v = cvec(psi_tp)

        def shifted(term):
            mu, fwd = term % 4, term < 4
            if mu == 0:
                if fwd:
                    a = [roll_pair(v, -1) for v in psi]
                    b = [roll_pair(v, X - 1) for v in psi]
                    m = xg == X - 1
                else:
                    a = [roll_pair(v, 1) for v in psi]
                    b = [roll_pair(v, -(X - 1)) for v in psi]
                    m = xg == 0
                return [sel_pair(m, bb, aa) for aa, bb in zip(a, b)]
            if mu == 1:
                return [roll_pair(v, -X if fwd else X) for v in psi]
            if mu == 2:
                return [roll_pair(v, -1 if fwd else 1, axis=0)
                        for v in psi]
            if fwd:
                return [sel_pair(s_par, p, c)
                        for p, c in zip(psi_tp_v, psi)]
            return [sel_pair(s_par, c, m)
                    for c, m in zip(psi, psi_tm_v)]

        def matvec(buf, vec):
            res = []
            for a in range(3):
                rr = ri = None
                for b in range(3):
                    ar = lbuf[buf, 0, a, b].astype(jnp.float32)
                    ai = lbuf[buf, 1, a, b].astype(jnp.float32)
                    vr, vi = vec[b]
                    tr = ar * vr - ai * vi
                    ti = ar * vi + ai * vr
                    rr = tr if rr is None else rr + tr
                    ri = ti if ri is None else ri + ti
                res.append((rr, ri))
            return res

        look = nslots - 1
        acc = None
        if mode == "dma":
            for k in range(min(look, 8)):
                dma(k, k % nslots).start()
            for term in range(8):
                if term + look < 8:
                    dma(term + look, (term + look) % nslots).start()
                dma(term, term % nslots).wait()
                t = [(lbuf[term % nslots, 0, c, 0],
                      lbuf[term % nslots, 1, c, 0]) for c in range(3)]
                sign = 1.0 if term < 4 else -1.0
                acc = ([(sign * r, sign * i) for r, i in t] if acc is None
                       else [(ar + sign * r, ai + sign * i)
                             for (ar, ai), (r, i) in zip(acc, t)])
        elif mode == "matvec":
            for term in range(8):
                t = matvec(term % nslots, psi)
                sign = 1.0 if term < 4 else -1.0
                acc = ([(sign * r, sign * i) for r, i in t] if acc is None
                       else [(ar + sign * r, ai + sign * i)
                             for (ar, ai), (r, i) in zip(acc, t)])
        elif mode == "shifts":
            for term in range(8):
                t = shifted(term)
                sign = 1.0 if term < 4 else -1.0
                acc = ([(sign * r, sign * i) for r, i in t] if acc is None
                       else [(ar + sign * r, ai + sign * i)
                             for (ar, ai), (r, i) in zip(acc, t)])
        elif mode == "compute":
            for term in range(8):
                t = matvec(term % nslots, shifted(term))
                sign = 1.0 if term < 4 else -1.0
                acc = ([(sign * r, sign * i) for r, i in t] if acc is None
                       else [(ar + sign * r, ai + sign * i)
                             for (ar, ai), (r, i) in zip(acc, t)])
        else:  # full
            for k in range(min(look, 8)):
                dma(k, k % nslots).start()
            for term in range(8):
                if term + look < 8:
                    dma(term + look, (term + look) % nslots).start()
                dma(term, term % nslots).wait()
                t = matvec(term % nslots, shifted(term))
                sign = 1.0 if term < 4 else -1.0
                acc = ([(sign * r, sign * i) for r, i in t] if acc is None
                       else [(ar + sign * r, ai + sign * i)
                             for (ar, ai), (r, i) in zip(acc, t)])

        for c in range(3):
            out[0, c, 0] = 0.5 * acc[c][0]
            out[1, c, 0] = 0.5 * acc[c][1]

    return kernel


def run(l, x_split, lat, parity_out, mode, nslots):
    X, Y, Z, T = lat.dims
    Th, YX = T // 2, Y * X
    spin = lambda im: pl.BlockSpec((2, 3, 1, Z, YX), im,
                                   memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        spin(lambda th: (0, 0, th, 0, 0)),
        spin(lambda th: (0, 0, (th - 1) % Th, 0, 0)),
        spin(lambda th: (0, 0, (th + 1) % Th, 0, 0)),
    ]
    out_spec = pl.BlockSpec((2, 3, 1, Z, YX),
                            lambda th: (0, 0, th, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        make_kernel(X, parity_out, nslots, mode),
        grid=(Th,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((2, 3, Th, Z, YX), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nslots, 2, 3, 3, Z, YX), l.dtype),
            pltpu.SemaphoreType.DMA((nslots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(l, x_split, x_split, x_split)


def main():
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_pallas3 as sp
    from qex_tpu.physics import staggered as st

    mode = sys.argv[1] if len(sys.argv) > 1 else "full"
    nslots = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    dims = (32, 32, 32, 32)
    lat = Lattice(dims)
    iters = 50

    @jax.jit
    def setup(key):
        ks = jax.random.split(key, 5)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               jnp.complex64))
            for i in range(4)])
        s = sf.new_fast(st.new_stag_eo(lat, u))
        p = sp.new_pallas3(s)
        x = jax.random.normal(ks[-1], (3, dims[3] // 2, dims[2],
                                       dims[1] * dims[0]),
                              jnp.float32).astype(jnp.complex64)
        return p.l_e, p.l_o, sp._split(x)

    le, lo, xs = setup(jax.random.PRNGKey(7))

    @jax.jit
    def chain(le, lo, v):
        def body(v, _):
            w = run(lo, v, lat, 1, mode, nslots)
            w = run(le, w, lat, 0, mode, nslots)
            w = w / jnp.sqrt(jnp.sum(w * w))
            return w, None

        v, _ = jax.lax.scan(body, v, None, length=iters // 2)
        return jnp.sum(v * v).astype(jnp.float32)

    float(chain(le, lo, xs))
    t0 = time.perf_counter()
    float(chain(le, lo, xs))
    dt = (time.perf_counter() - t0) / iters
    sites = lat.volume // 2
    print(f"mode={mode} nslots={nslots}: {dt*1e3:.3f} ms/app "
          f"({594*sites/dt/1e9:.1f} GF/s-model)")


if __name__ == "__main__":
    main()
