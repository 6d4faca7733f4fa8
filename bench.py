"""qex_tpu headline benchmark: even-odd staggered Dslash throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GFLOP/s", "vs_baseline": N}

The metric is the eo staggered Dslash GFLOP/s on a single chip at 32^4,
using the reference's own flop model (18 + nd*(72+66+6) = 594 flops/site,
/root/reference/src/physics/stagD.nim:393) so the number is directly
comparable to QEX's self-reported Gflops.  The timed kernel is the
PRODUCTION inner-solver operator: the s8 streamed z-vectorized Pallas
stencil (stag_pallas_hisq.new_pallas_stag8) with bf16 link storage +
f32 spinors/arithmetic, exactly what the sloppy mixed-precision CG
iterates; the CG section below proves the TRUE
residual still reaches 1e-12 via f32 true-residual restarts, and the
f32-link kernel time is printed alongside for cross-round
comparability.  The reference publishes no absolute numbers
(BASELINE.md), so ``vs_baseline`` reports the fraction of the
spec-bandwidth roofline achieved -- the speed-of-light measure for this
bandwidth-bound kernel.  vs_baseline uses the SPEC bandwidth table for
cross-round comparability; the practical bandwidth of the attached chip
is also MEASURED with a jitted axpy stream and printed to stderr
(tunneled chips have been observed at ~330-450 GB/s practical vs the
819 GB/s v5e spec, and the chip's throughput swings ~1.5x over hours --
only same-process comparisons are meaningful).

Backend notes: on the axon-tunneled TPU, eager dispatch and complex
host transfers are unsupported -- ALL computation here lives inside jit
and only real f32 scalars cross to the host.  Timing is a jitted
``lax.scan`` chain of dependent operator applications ended by a scalar
fetch (a hard sync on every backend).  If even that is impossible, we
re-exec on the CPU backend and say so on stderr.

Extra diagnostics (CG solve time, roofline details) go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def detect_hbm_bw_gbs(device) -> float:
    """Best-effort HBM bandwidth of the attached chip (GB/s)."""
    kind = getattr(device, "device_kind", "cpu").lower()
    table = [
        ("v5 lite", 819.0), ("v5e", 819.0), ("v5p", 2765.0),
        ("v6 lite", 1640.0), ("v6e", 1640.0), ("v6", 3584.0),
        ("v4", 1228.0), ("v3", 900.0), ("v2", 700.0), ("v5", 2765.0),
    ]
    for k, v in table:
        if k in kind:
            return v
    return 100.0  # CPU-ish fallback


_PROBE_SRC = (
    "import sys, jax, jax.numpy as jnp;"
    "v = jax.jit(lambda: jnp.sum(jnp.arange(16.0)))();"
    "sys.exit(0 if float(v) == 120.0 else 3)"
)


def backend_can_fetch(budget_s: float = 3000.0) -> bool:
    """True iff a jit-computed real scalar can be fetched from the
    default backend.

    Each probe runs in a fresh SUBPROCESS that is killed on timeout:
    a wedged tunnel attempt then cannot poison the main process's
    (still-uninitialized) jax backend, and the tunnel itself recovers
    once its stuck client is gone (CLAUDE.md: kill both, restart one).
    Exactly one process touches the tunnel at a time.

    The documented failure mode is WHOLE-SESSION outages lasting
    hours (BENCH_r02 recorded a CPU fallback after only 18 min of
    patience, losing the round's headline).  So: keep re-probing with
    backoff for the full ``budget_s`` (~50 min) before surrendering
    to the CPU.  A genuinely restricted backend fails FAST with
    UNIMPLEMENTED -- two reproducible fast failures end the wait
    early since more patience cannot help."""
    import subprocess

    t0 = time.monotonic()
    fast_fails = 0
    attempt = 0
    for timeout_s in (180, 300, 600, 600, 900, 900, 1200):
        remaining = budget_s - (time.monotonic() - t0)
        if remaining <= 60:
            break
        attempt += 1
        p = subprocess.Popen([sys.executable, "-c", _PROBE_SRC],
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.PIPE)
        try:
            _, err = p.communicate(timeout=min(timeout_s, remaining))
            if p.returncode == 0:
                print(f"# fetch probe ok (attempt {attempt}, "
                      f"{time.monotonic()-t0:.0f}s in)", file=sys.stderr)
                return True
            fast_fails += 1
            tail = err.decode(errors="replace").strip().splitlines()
            print(f"# fetch probe failed (attempt {attempt}): "
                  f"{tail[-1] if tail else 'rc=%d' % p.returncode}",
                  file=sys.stderr)
            if fast_fails >= 2:
                return False  # reproducibly restricted, not congested
            time.sleep(30)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            print(f"# fetch probe timed out after {timeout_s:.0f}s "
                  f"(attempt {attempt}); backing off and retrying "
                  "(tunnel outages last minutes-to-hours)",
                  file=sys.stderr)
            time.sleep(60)  # let the tunnel shed the killed client
    # final short retry before ever giving up the TPU path
    p = subprocess.Popen([sys.executable, "-c", _PROBE_SRC],
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    try:
        p.communicate(timeout=180)
        if p.returncode == 0:
            return True
    except subprocess.TimeoutExpired:
        p.kill()
        p.wait()
    return False


def main() -> None:
    import os

    if "--cpu" in sys.argv:
        import jax
        os.environ["JAX_PLATFORMS"] = "cpu"
        jax.config.update("jax_platforms", "cpu")
    elif not backend_can_fetch():
        print("# default backend cannot return values (restricted tunnel); "
              "re-running on CPU backend", file=sys.stderr)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        os.execve(sys.executable,
                  [sys.executable, os.path.abspath(__file__), "--cpu"], env)

    import jax
    import jax.numpy as jnp
    from qex_tpu.lattice import Lattice
    from qex_tpu.ops import group, linalg
    from qex_tpu.physics import stag_fast as sf
    from qex_tpu.physics import stag_solve, staggered as st
    from qex_tpu.solvers import cg
    from qex_tpu.solvers.base import SolverParams

    dev = jax.devices()[0]
    on_tpu = dev.platform.lower() != "cpu"
    dims = (32, 32, 32, 32) if on_tpu else (16, 16, 16, 16)
    lat = Lattice(dims)
    dtype = jnp.complex64
    mass = 0.1
    iters = 50
    napp = 2  # Dslash applications per d2ee

    @jax.jit
    def setup(key):
        """Hot-start SU(3) links (exp of TAH: QR-free) + unit-norm rhs,
        phased + eo-packed + converted to the lane-packed fast layout
        (qex_tpu.physics.stag_fast)."""
        ks = jax.random.split(key, lat.nd + 1)
        u = jnp.stack([
            linalg.expm(0.7 * group.random_tah(ks[i], lat.dims, lat.nc,
                                               dtype))
            for i in range(lat.nd)])
        s = sf.new_fast(st.new_stag_eo(lat, u))
        x = jax.random.normal(ks[-1], (lat.nc,) + dims[:-1]
                              + (dims[-1] // 2,), jnp.float32).astype(dtype)
        x = x / jnp.sqrt(linalg.norm2(x)).astype(dtype)
        return s.g_e, s.g_o, sf.to_fast(x, lat)

    use_pallas = on_tpu
    if use_pallas:
        from qex_tpu.physics import stag_pallas_hisq as sp

        @jax.jit
        def make_op(ge, go):
            """Both link precisions of the s8 kernel: f32 (reference
            precision) and bf16 (the production sloppy-CG INNER
            operator -- bf16 link storage, f32 spinors/arithmetic;
            true residuals are restored by the f32 true-residual
            restarts, proven in the CG section below)."""
            pf = sp.new_pallas_stag8(sf.FastStagEO(lat, ge, go))
            pb = sp.new_pallas_stag8(sf.FastStagEO(lat, ge, go),
                                     links_dtype=jnp.bfloat16)
            return pf.l_e, pf.l_o, pb.l_e, pb.l_o

        @jax.jit
        def chain(le, lo, v):
            """iters dependent d2ee applications (fused s8 streamed
            stencil kernel); returns a real scalar."""
            so = sp.PallasStag3EO(lat, le, lo)
            vs = sp._split(v)

            def body(vs, _):
                w = sp.d2ee_pallas_hisq(so, vs, mass)
                w = w / jnp.sqrt(jnp.sum(w * w))
                return w, None

            vs, _ = jax.lax.scan(body, vs, None, length=iters)
            return jnp.sum(vs * vs).astype(jnp.float32)
    else:
        @jax.jit
        def chain(ge, go, v):
            """iters dependent d2ee applications; returns a real
            scalar."""
            so = sf.FastStagEO(lat, ge, go)

            def body(v, _):
                w = sf.d2ee_fast(so, v, mass)
                w = w / jnp.sqrt(linalg.norm2(w)).astype(w.dtype)
                return w, None

            v, _ = jax.lax.scan(body, v, None, length=iters)
            return jnp.real(linalg.norm2(v)).astype(jnp.float32)

    ge, go, x = setup(jax.random.PRNGKey(2024))
    if use_pallas:
        lfe, lfo, lbe, lbo = make_op(ge, go)
        args = (lbe, lbo)            # HEADLINE: bf16-link inner kernel
        args_f32 = (lfe, lfo)
    else:
        args = (ge, go)
        args_f32 = None
    def time_chain(a, reps=5):
        """Best-of-reps per-application time: the tunnel chip's
        throughput swings ~1.5x with congestion over hours (CLAUDE.md);
        the MIN over repeated chains measures the kernel's capability
        rather than the epoch's luck.  Each rep is a full jitted chain
        ended by a scalar fetch (hard sync on every backend)."""
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(*a, x))      # scalar fetch = hard sync
            best = min(best, time.perf_counter() - t0)
        return best / (iters * napp)

    float(chain(*args, x))           # compile + warm
    t = time_chain(args)             # per Dslash application
    if args_f32 is not None:
        # same-process f32-link number for cross-round comparability
        float(chain(*args_f32, x))
        t_f32 = time_chain(args_f32)
        print(f"# f32-link kernel (same process): {t_f32*1e3:.3f} ms/app"
              f", {594*(lat.volume//2)/t_f32/1e9:.1f} GFLOP/s",
              file=sys.stderr)

    # measured practical stream bandwidth of THIS chip (read+write
    # axpy over 512 MB x 20 passes) -- the honest roofline basis
    nbw = 128 * 1024 * 1024

    @jax.jit
    def bw_setup():
        return jnp.ones((nbw,), jnp.float32)

    @jax.jit
    def bw_chain(xb):
        def body(xb, _):
            return xb * 1.000001 + 1e-9, None
        xb, _ = jax.lax.scan(body, xb, None, length=20)
        return jnp.sum(xb[:8]).astype(jnp.float32)

    xb = bw_setup()
    float(bw_chain(xb))
    t_bw = float("inf")
    for _ in range(3):               # best-of-3 (congestion swings)
        t0 = time.perf_counter()
        float(bw_chain(xb))
        t_bw = min(t_bw, time.perf_counter() - t0)
    bw_meas = 20 * 2 * 4 * nbw / t_bw / 1e9

    sites_out = lat.volume // 2
    flops = st.dslash_flops_per_site(lat.nd, lat.nc) * sites_out
    gflops = flops / t / 1e9

    # roofline: bytes per output site in complex64 --
    # 8 link matrices (72 B) + 8 neighbor spinors (24 B) + 1 write (24 B)
    bytes_per_site = 8 * 72 + 8 * 24 + 24
    bw_spec = detect_hbm_bw_gbs(dev)
    roofline_spec = bw_spec * flops / (bytes_per_site * sites_out)
    roofline_meas = bw_meas * flops / (bytes_per_site * sites_out)
    frac = gflops / roofline_spec
    gbs = bytes_per_site * sites_out / t / 1e9

    print(f"# device={dev.device_kind} dims={dims} "
          f"Dslash: {t*1e3:.3f} ms/app, {gflops:.1f} GFLOP/s (model), "
          f"{gbs:.0f} GB/s moved (model bytes); spec roofline "
          f"{roofline_spec:.0f} GFLOP/s @ {bw_spec:.0f} GB/s -> "
          f"{100*frac:.1f}%; measured stream BW {bw_meas:.0f} GB/s "
          f"(practical roofline {roofline_meas:.0f} -> "
          f"{100*gflops/roofline_meas:.1f}%)", file=sys.stderr)

    # --- CG solve (secondary, stderr) -------------------------------------
    try:
        if use_pallas:
            @jax.jit
            def cg_run(lbe2, lbo2, fge, fgo, be):
                """Production mixed-precision solve: bf16-link inner
                iterations + f32 TRUE-residual restarts -- proves the
                headline kernel's CG residual is unchanged (the
                VERDICT item-3 'residual unchanged' condition)."""
                so = sp.PallasStag3EO(lat, lbe2, lbo2)
                fs2 = sf.FastStagEO(lat, fge, fgo)
                op = lambda v: sp._join(
                    sp.d2ee_pallas_hisq(so, sp._split(v), mass))
                op_true = lambda v: sf.d2ee_fast(fs2, v, mass)
                # restarts=5: each bf16-inner defect correction gains
                # ~1e-5 in true residual; the converged short-circuit
                # makes unused restarts free, and 3 left the proof at
                # 8e-10 on one epoch
                xe, stats = cg.cg_solve_restarted(
                    op, be, r2req=1e-12, maxits=500, restarts=5,
                    op_true=op_true, inner_r2req_floor=1e-5)
                return (jnp.real(stats.r2).astype(jnp.float32),
                        stats.iterations.astype(jnp.float32))
        else:
            @jax.jit
            def cg_run(ge, go, be):
                so = sf.FastStagEO(lat, ge, go)
                xe, stats = cg.cg_solve_restarted(
                    lambda v: sf.d2ee_fast(so, v, mass), be,
                    r2req=1e-12, maxits=500, restarts=2)
                return (jnp.real(stats.r2).astype(jnp.float32),
                        stats.iterations.astype(jnp.float32))

        cg_args = ((lbe, lbo, ge, go) if use_pallas else args)
        r2, its = cg_run(*cg_args, x)
        float(r2)
        t0 = time.perf_counter()
        r2, its = cg_run(*cg_args, x)
        r2v = float(r2)
        t_cg = time.perf_counter() - t0
        print(f"# CG {dims} m={mass}"
              f"{' (bf16 inner + f32 true-residual restarts)' if use_pallas else ''}"
              f": {t_cg:.3f} s, its={int(float(its))}, "
              f"true rel r2={r2v:.3e}", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# CG bench skipped: {e}", file=sys.stderr)

    rec = {
        "metric": "staggered_eo_dslash_32c4_gflops_per_chip",
        "value": round(gflops, 2),
        "unit": "GFLOP/s",
        "vs_baseline": round(frac, 4),
    }
    if not on_tpu:
        # the tunnel was unreachable: this is a 16^4 CPU-host number,
        # NOT the chip headline -- label it so it can't be mistaken
        # for a TPU regression (last recorded chip headline: ROUND2.md)
        rec["metric"] += "_CPU_FALLBACK_16c4"
        rec["note"] = "TPU tunnel unreachable; CPU host measurement"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
