"""AOT memory analysis of the nHYP smeared-force pullback pieces.

For every jit program the split-step trajectory dispatcher runs for a
smeared kick (mcmc/md._smeared_split_jits: staged forwards, projection
VJPs, per-addend staple VJPs), lower + compile it AOT at a production
volume and print XLA's memory_analysis -- argument/output/temp/peak
bytes.  Nothing is executed, so this works on the tunneled TPU even
under congestion (remote compile only) and identifies the HBM hog
exactly (the VERDICT round-3 'north-star memory fit' instrument).

Usage:
    python exp_nhyp_mem.py [ns nt] [--cpu] [--mode split|chunk|whole]

The peak of interest is temp + arguments + outputs of the worst piece,
plus the live inter-piece arrays (u, p, a1, a2, chain: printed at the
end).
"""

from __future__ import annotations

import sys


def fmt(n):
    return f"{n/2**30:7.2f} G"


def analyze(name, fn, *avals, donate=None):
    import jax
    try:
        jitted = (jax.jit(fn) if donate is None
                  else jax.jit(fn, donate_argnums=donate))
        c = jitted.lower(*avals).compile()
        ma = c.memory_analysis()
        arg = ma.argument_size_in_bytes
        out = ma.output_size_in_bytes
        tmp = ma.temp_size_in_bytes
        alias = ma.alias_size_in_bytes
        peak = arg + out + tmp - alias
        print(f"{name:<34} args {fmt(arg)}  out {fmt(out)}  "
              f"temp {fmt(tmp)}  alias {fmt(alias)}  PEAK {fmt(peak)}")
        return peak
    except Exception as e:
        print(f"{name:<34} FAILED: {type(e).__name__} {str(e)[:160]}")
        return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    cpu = "--cpu" in argv
    if cpu:
        argv.remove("--cpu")
    mode = "split"
    if "--mode" in argv:
        i = argv.index("--mode")
        mode = argv[i + 1]
        del argv[i:i + 2]
    ns, nt = (int(argv[0]), int(argv[1])) if len(argv) >= 2 else (24, 24)

    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qex_tpu.lattice import Lattice
    from qex_tpu.gauge.smear import (HypCoefs, nhyp_stage_terms,
                                     nhyp_stages_preproj)
    from qex_tpu.ops import group, linalg

    lat = Lattice((ns, ns, ns, nt))
    dt = jnp.complex64
    print(f"# {lat.dims} {dt.__name__} on "
          f"{jax.devices()[0].device_kind} mode={mode}")

    A = jax.ShapeDtypeStruct  # noqa: N806
    u_av = A((4, 3, 3) + lat.dims, dt)
    l_av = A((12, 3, 3) + lat.dims, dt)
    g4_av = A((4, 3, 3) + lat.dims, dt)
    s1_av = A((1, 3, 3) + lat.dims, dt)

    c = HypCoefs(0.4, 0.5, 0.5)
    (p1, p2, p3), proj = nhyp_stages_preproj(c, lat)
    t1s, t2s, t3s = nhyp_stage_terms(c, lat)

    peaks = {}

    # staged forwards (run per shared kick).  Two proj-stack variants:
    # inline jnp.stack vs barrier-sequenced (mcmc/md._proj_stack --
    # frees one projection's Newton-Schulz temporaries before the
    # next starts; the staple addends inside pK are barrier-sequenced
    # by gauge.smear._bar either way)
    def proj_stack(w):
        return jnp.stack([proj(w[j]) for j in range(w.shape[0])])

    def proj_bar(w):
        return jnp.stack([jax.lax.optimization_barrier(proj(w[j]))
                          for j in range(w.shape[0])])

    peaks["fwd_s1"] = analyze("fwd s1 = proj(p1(u))",
                              lambda u: proj_stack(p1(u)), u_av)
    peaks["fwd_s1b"] = analyze("fwd s1 (barrier proj)",
                               lambda u: proj_bar(p1(u)), u_av)
    peaks["fwd_s2"] = analyze("fwd s2 = proj(p2(u,a1))",
                              lambda u, a: proj_stack(p2(u, a)),
                              u_av, l_av)
    peaks["fwd_s2b"] = analyze("fwd s2 (barrier proj)",
                               lambda u, a: proj_bar(p2(u, a)),
                               u_av, l_av)
    peaks["fwd_s3"] = analyze("fwd s3 = proj(p3(u,a2))",
                              lambda u, a: proj_stack(p3(u, a)),
                              u_av, l_av)

    # level-3 pullback pieces, one direction per chunk (md._pb_split)
    def pre3_c(u, a, c_=0):
        return p3(u, a)[c_:c_ + 1]

    def projvjp1(w, g):
        _, vjp = jax.vjp(lambda ww: jnp.stack([proj(ww[0])]), w)
        return vjp(g)[0]

    def prevjp3(u, a, gw, c_=0):
        _, vjp = jax.vjp(lambda uu, aa: p3(uu, aa)[c_:c_ + 1], u, a)
        return vjp(gw)

    peaks["pre3"] = analyze("L3 pre fwd (1 dir)", pre3_c, u_av, l_av)
    peaks["projvjp"] = analyze("L3 proj VJP (1 dir)", projvjp1,
                               s1_av, s1_av)
    peaks["prevjp3"] = analyze("L3 staple VJP (1 dir, fused)",
                               prevjp3, u_av, l_av, s1_av)

    # per-addend level-3 staple VJP (current split mode: slice-aware
    # StageTerm -- the jit slices only the slabs the addend reads and
    # returns only their gradients, mcmc/md term_vjp)
    t30 = t3s[0][1]  # one half-staple addend of output 0

    def addvjp3(u, a, gw1):
        us = tuple(u[i] for i in t30.u_idx)
        als = tuple(a[i] for i in t30.a_idx)
        _, vjp = jax.vjp(t30.fn, us, als)
        return vjp(gw1)

    s1s_av = A((3, 3) + lat.dims, dt)
    peaks["addvjp3"] = analyze("L3 staple VJP (1 half-staple)",
                               addvjp3, u_av, l_av, s1s_av)

    # level-2: per-addend (current split mode) and fused one-output
    t20 = t2s[0][1]

    def addvjp2(u, a, gw1):
        us = tuple(u[i] for i in t20.u_idx)
        als = tuple(a[i] for i in t20.a_idx)
        _, vjp = jax.vjp(t20.fn, us, als)
        return vjp(gw1)

    peaks["addvjp2"] = analyze("L2 staple VJP (1 half-staple)",
                               addvjp2, u_av, l_av, s1s_av)

    # donated slab add (the md.addslab accumulator: zero-copy)
    slab_av = A((3, 3) + lat.dims, dt)
    addslab = jax.jit(lambda x, y: x + y, donate_argnums=(0,))
    try:
        ma = addslab.lower(slab_av, slab_av).compile().memory_analysis()
        print(f"{'addslab (donated)':<34} "
              f"args {fmt(ma.argument_size_in_bytes)}  "
              f"out {fmt(ma.output_size_in_bytes)}  "
              f"temp {fmt(ma.temp_size_in_bytes)}  "
              f"alias {fmt(ma.alias_size_in_bytes)}")
    except Exception as e:
        print(f"addslab analyze FAILED: {str(e)[:120]}")

    if mode == "fused2":
        # reliably crashes the remote tpu_compile_helper (its own OOM)
        # -- only attempted on request
        def prevjp2(u, a, gw, c_=0):
            _, vjp = jax.vjp(lambda uu, aa: p2(uu, aa)[c_:c_ + 1],
                             u, a)
            return vjp(gw)

        peaks["prevjp2"] = analyze("L2 staple VJP (1 out, fused)",
                                   prevjp2, u_av, l_av, s1_av)

    # level-1: u-only
    t10 = t1s[0][1]

    def addvjp1(u, gw1):
        us = tuple(u[i] for i in t10.u_idx)
        _, vjp = jax.vjp(lambda uss: t10.fn(uss, ()), us)
        return vjp(gw1)[0]

    peaks["addvjp1"] = analyze("L1 staple VJP (1 half-staple)",
                               addvjp1, u_av, s1s_av)

    if mode == "whole":
        from qex_tpu.gauge.smear import nhyp_smear

        def whole_pb(u, g):
            _, vjp = jax.vjp(lambda uu: nhyp_smear(c, lat, uu), u)
            return vjp(g)[0]

        peaks["whole"] = analyze("WHOLE smear pullback", whole_pb,
                                 u_av, g4_av)

    # live inter-piece arrays during a smeared kick
    isz = jnp.dtype(dt).itemsize
    for n, sz in (("u", 4), ("p", 4), ("a1", 12), ("a2", 12),
                  ("chain", 4), ("gu_acc", 4)):
        b = sz * 9 * lat.volume * isz
        print(f"live {n:<6} {fmt(b)}")
    live = (4 + 4 + 12 + 12 + 4 + 4) * 9 * lat.volume * isz
    worst = max(peaks.values()) if peaks else 0
    print(f"# live between pieces {fmt(live)} + worst piece "
          f"{fmt(worst)} => ~{fmt(live + worst)} transient upper bound")
    return 0


if __name__ == "__main__":
    sys.exit(main())
