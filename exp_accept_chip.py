"""On-chip accepting HMC chains (VERDICT round-4 task 2).

Two chains on the real TPU chip, both with the compensated two-float
Hamiltonian (exact f32 Metropolis):

  A. 8^3x16, beta=6.0, 2MN -- the SAME chain exp_accept_cpu.py runs in
     f64 on CPU; equilibrium plaquettes must agree statistically
     (cross-backend sampling validation at matched volume).
  B. 16^3x32 (CONFIG3 volume), beta=6.0, 2MN -- warmup properly (the
     round-3/4 dH=58 at 20 steps was the 4-trajectory-warmup
     thermalization transient, not integrator error: the 8^3x16
     equilibrium scan measured rms dH 0.32 at 20 steps), then a short
     step scan and >=24 measured trajectories with acceptance in
     (0.5, 0.95).

Writes ACCEPT_CHIP.json.  Run SOLO on the tunnel.
"""
import json
import statistics
import time
from functools import partial

import jax
import jax.numpy as jnp

from qex_tpu.lattice import Lattice
from qex_tpu.gauge import action as ga
from qex_tpu.gauge import loops
from qex_tpu.hmc import hmc, integrators
from qex_tpu.ops import group

BETA = 6.0
TAU = 1.0
scheme = integrators.get_integrator("2MN")
print(f"backend: {jax.default_backend()}", flush=True)


def _retry(fn, *args, tries=6, sleep_s=45):
    """Re-issue a jitted call after transient tunnel failures.

    The axon remote-compile endpoint occasionally drops a response
    mid-body ("response body closed before all bytes were read") --
    the program state (u, key) lives host-side, so simply re-calling
    the same jit re-submits the compile.  Exponential-ish backoff;
    re-raises after `tries` consecutive failures (a real outage).
    """
    for attempt in range(tries):
        try:
            return fn(*args)
        except jax.errors.JaxRuntimeError as e:
            if attempt == tries - 1:
                raise
            print(f"transient tunnel failure (attempt {attempt}): "
                  f"{str(e)[:120]}; retrying in {sleep_s} s",
                  flush=True)
            time.sleep(sleep_s)


def chain(dims, warm_steps, n_warm, scan_steps, n_scan, n_meas,
          rms_target=0.7, seed=50):
    """Run one accepting chain; returns the record dict.

    seed=50 for 8^3x16 matches exp_accept_cpu.py's key stream (the
    noise is drawn in f32 there too, so the two chains see the same
    physics but different arithmetic -- statistical comparison only).
    """
    lat = Lattice(dims)
    c = ga.wilson(BETA)
    act = partial(ga.full_action, c, lat)
    act2 = partial(ga.full_action2, c, lat)
    frc = partial(ga.gauge_force, c, lat)

    def make_step(nsteps):
        @jax.jit
        def step(key, u, warm):
            u1, stt = hmc.hmc_step(key, u, act, frc, scheme, TAU,
                                   nsteps, always_accept=warm,
                                   action2_fn=act2)
            pl = jnp.real(loops.plaquette(lat, u1)).astype(jnp.float32)
            return u1, stt.dH, stt.accepted, pl
        return step

    @jax.jit
    def cold():
        return group.unit_gauge(lat, jnp.complex64)

    u = cold()
    key = jax.random.PRNGKey(seed)
    t0 = time.time()

    coarse = make_step(warm_steps)
    for i in range(n_warm):
        key, k = jax.random.split(key)
        u, dH, _, pl = _retry(coarse, k, u, jnp.bool_(True))
        if i % 5 == 0:
            print(f"{dims} warm {i}: dH={float(dH):+.3f} "
                  f"plaq={float(pl):.5f} ({time.time()-t0:.0f} s)",
                  flush=True)

    scan = {}
    chosen = None
    for ns in scan_steps:
        stepf = make_step(ns)
        dhs = []
        for i in range(n_scan):
            key, k = jax.random.split(key)
            u, dH, _, pl = _retry(stepf, k, u, jnp.bool_(True))
            dhs.append(float(dH))
        rms = (sum(d * d for d in dhs) / len(dhs)) ** 0.5
        scan[ns] = dhs
        print(f"{dims} scan nsteps={ns}: rms(dH)={rms:.4f} "
              f"({time.time()-t0:.0f} s)", flush=True)
        if rms < rms_target:
            chosen = ns
            break
    if chosen is None:
        chosen = scan_steps[-1]
    print(f"{dims} chosen nsteps={chosen}", flush=True)

    stepf = make_step(chosen)
    for i in range(5):          # re-equilibrate under Metropolis
        key, k = jax.random.split(key)
        u, dH, acc, pl = _retry(stepf, k, u, jnp.bool_(False))
    dhs, accs, plaqs = [], [], []
    tm0 = time.time()
    for i in range(n_meas):
        key, k = jax.random.split(key)
        u, dH, acc, pl = _retry(stepf, k, u, jnp.bool_(False))
        dhs.append(float(dH))
        accs.append(bool(acc))
        plaqs.append(float(pl))
        print(f"{dims} meas {i}: dH={dhs[-1]:+.4f} acc={accs[-1]} "
              f"plaq={plaqs[-1]:.5f}", flush=True)
    sec_per_traj = (time.time() - tm0) / n_meas
    mean_pl = statistics.mean(plaqs)
    err_pl = statistics.stdev(plaqs) / len(plaqs) ** 0.5
    acc_rate = sum(accs) / len(accs)
    print(f"{dims} beta={BETA}: acceptance={acc_rate:.3f} "
          f"plaq={mean_pl:.6f} +- {err_pl:.6f} nsteps={chosen} "
          f"{sec_per_traj:.2f} s/traj", flush=True)
    return {"volume": "x".join(map(str, dims)), "beta": BETA,
            "tau": TAU, "nsteps": chosen, "n_meas": n_meas,
            "acceptance": acc_rate, "plaq_mean": mean_pl,
            "plaq_err": err_pl, "mean_dH": statistics.mean(dhs),
            "sec_per_traj": round(sec_per_traj, 3), "dH": dhs,
            "plaq_series": plaqs,
            "scan": {str(k): v for k, v in scan.items()}}


recs = []


def dump():
    with open("ACCEPT_CHIP.json", "w") as f:
        f.write(json.dumps({"backend": jax.default_backend(),
                            "records": recs}) + "\n")


# A: matched-volume cross-backend chain (same seed/keys as the CPU f64
# run; hmc_step draws momenta in the field dtype = f32 on both)
recs.append(chain((8, 8, 8, 16), warm_steps=10, n_warm=30,
                  scan_steps=[20, 30], n_scan=4, n_meas=30, seed=50))
dump()
# B: CONFIG3 volume, thorough warmup then accepting run
recs.append(chain((16, 16, 16, 32), warm_steps=20, n_warm=40,
                  scan_steps=[24, 32, 48], n_scan=3, n_meas=24,
                  seed=60))
dump()
print("wrote ACCEPT_CHIP.json", flush=True)
