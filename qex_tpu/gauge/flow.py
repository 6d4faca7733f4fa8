"""Wilson / gradient flow.

TPU-native replacement for QEX's src/gauge/wflow.nim:21-70
(``gaugeFlow(g, steps, eps): measure`` -- 3-stage Luscher Runge-Kutta on
the group manifold) and the measurement loop of src/flow/gauge_flow.nim
(t^2 E in plaquette and clover discretizations, topological charge,
Polyakov loop, per-(t_max, dt) segments).

Flow generator: Z(U) = -grad S_c(U) projected TAH, i.e. ``-force`` in
the convention of :func:`qex_tpu.gauge.action.force_from_action`, so the
flow is gradient descent on the chosen action.  For the standard Wilson
flow (Luscher arXiv:1006.4518 conventions, where
t0 is set by t^2 E(t0) = 0.3) use ``wilson_flow_coeffs(nc)`` =
``GaugeActionCoeffs(plaq=2*nc)``: then S = -2 sum_p retr P + const,
matching g0^2 S_W.

Luscher's RK3 (appendix C of 1006.4518):
    W1 = exp(1/4 Z0) W0
    W2 = exp(8/9 Z1 - 17/36 Z0) W1
    W3 = exp(3/4 Z2 - 8/9 Z1 + 17/36 Z0) W2,   Z_i = eps Z(W_i).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from . import loops
from .action import GaugeActionCoeffs, full_action, gauge_force


def wilson_flow_coeffs(nc: int = 3) -> GaugeActionCoeffs:
    return GaugeActionCoeffs(plaq=2.0 * nc)


def flow_generator(c: GaugeActionCoeffs, lat: Lattice,
                   u: jax.Array) -> jax.Array:
    """Z(U) with dU/dt = Z U descending the action (QEX wflow's ``f``)."""
    return -gauge_force(c, lat, u)


def _exp_mul(z: jax.Array, u: jax.Array) -> jax.Array:
    ex = jax.vmap(linalg.expm)(z)
    return jax.vmap(linalg.mul)(ex, u)


def flow_step(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array,
              eps: float) -> jax.Array:
    """One RK3 integration step of flow time ``eps`` (wflow.nim:37-60)."""
    z0 = eps * flow_generator(c, lat, u)
    w1 = _exp_mul(0.25 * z0, u)
    z1 = eps * flow_generator(c, lat, w1)
    w2 = _exp_mul((8.0 / 9.0) * z1 - (17.0 / 36.0) * z0, w1)
    z2 = eps * flow_generator(c, lat, w2)
    w3 = _exp_mul(0.75 * z2 - (8.0 / 9.0) * z1 + (17.0 / 36.0) * z0, w2)
    return w3


class FlowMeasurement(NamedTuple):
    """Per-step observables (gauge_flow.nim:387-487 output parity)."""

    t: jax.Array          # flow time after the step
    t2e_plaq: jax.Array   # t^2 E, plaquette discretization
    t2e_clover: jax.Array  # t^2 E, clover discretization
    topo_q: jax.Array     # clover topological charge
    plaq: jax.Array       # average plaquette


def measure_flow(lat: Lattice, u: jax.Array, t: jax.Array
                 ) -> FlowMeasurement:
    ep = loops.energy_density_plaq(lat, u)
    ec = loops.energy_density_clover(lat, u)
    q = loops.topo_charge_clover(lat, u) if lat.nd == 4 else jnp.zeros(())
    pl = loops.plaquette(lat, u)
    return FlowMeasurement(t=t, t2e_plaq=t * t * ep, t2e_clover=t * t * ec,
                           topo_q=q, plaq=pl)


def flow(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array, eps: float,
         steps: int, measure: bool = True, t0: float = 0.0
         ) -> tuple[jax.Array, FlowMeasurement | None]:
    """Integrate ``steps`` RK3 steps of size ``eps``; optionally measure
    after every step (QEX ``gaugeFlow`` template with measure body).

    Fully jitted via ``lax.scan``; returns (flowed gauge, stacked
    measurements).
    """

    def body(carry, i):
        u, t = carry
        u = flow_step(c, lat, u, eps)
        t = t + eps
        m = measure_flow(lat, u, t) if measure else None
        return (u, t), m

    (u, t), ms = jax.lax.scan(body, (u, jnp.asarray(t0, jnp.float64
                                                    if u.dtype == jnp.complex128
                                                    else jnp.float32)),
                              jnp.arange(steps))
    return u, ms


def flow_segments(c: GaugeActionCoeffs, lat: Lattice, u: jax.Array,
                  segments: list[tuple[float, float]]
                  ) -> list[FlowMeasurement]:
    """Multi-segment flow: [(t_max, dt), ...] like the XML deck of
    src/flow/gauge_flow.nim (each segment flows to its t_max with its
    own step size, continuing from the previous).  Host loop over
    segments, jitted scan inside.
    """
    out = []
    t = 0.0
    for t_max, dt in segments:
        n = max(1, round((t_max - t) / dt))
        u, ms = flow(c, lat, u, dt, n, t0=t)
        t = t + n * dt
        out.append(ms)
    return out
