"""Arbitrary Wilson-line / loop engine with common-subpath reuse.

TPU-native replacement for QEX's path-tree-optimized ``wline``
machinery (src/gauge/gaugeUtils.nim:405-1103): the reference builds a
tree over all requested paths so shared sub-products are computed
once; here a :class:`PathEngine` memoizes every sub-segment's matrix
FIELD (and its shifted copies) during one trace, so loop families --
the four clover leaves, rectangle sets, Polyakov-line powers -- reuse
each other's halves.  Products are built by binary splitting,

    W(p)(x) = W(p_left)(x) * W(p_right)(x + disp(p_left)),

log-depth in path length, with each distinct sub-segment a single
cached roll-based transport (idiomatic XLA: big fused matmuls, no
per-site loops).

Path convention (QEX wline, gaugeUtils.nim:1103): entries +-(mu+1);
+1 = one hop in +x, -3 = one hop in -z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lattice import Lattice
from ..ops import linalg
from ..ops.shifts import shift


def path_displacement(path: tuple[int, ...], nd: int) -> tuple[int, ...]:
    d = [0] * nd
    for step in path:
        mu = abs(step) - 1
        d[mu] += 1 if step > 0 else -1
    return tuple(d)


class PathEngine:
    """Memoizing Wilson-line builder over one gauge field.

    Create once per (traced) gauge field and ask for any number of
    lines/loops; all shared sub-segments and shifted copies are
    computed once per trace.
    """

    def __init__(self, lat: Lattice, u: jax.Array):
        self.lat = lat
        self.u = u
        self._lines: dict = {}
        self._shifted: dict = {}

    # -- internals ---------------------------------------------------------
    def _shift_by(self, key, arr: jax.Array, disp: tuple[int, ...]
                  ) -> jax.Array:
        """arr(x + disp), memoized on (segment key, disp)."""
        if all(d == 0 for d in disp):
            return arr
        ck = (key, disp)
        if ck not in self._shifted:
            out = arr
            for mu, d in enumerate(disp):
                if d:
                    out = shift(out, mu, +1 if d > 0 else -1,
                                self.lat.nd, dist=abs(d))
            self._shifted[ck] = out
        return self._shifted[ck]

    def line(self, path) -> jax.Array:
        """Untraced Wilson-line matrix field W(x) along ``path``:
        W(x) = L_{p1}(x) L_{p2}(x + d1) ... with L_{+mu}(x) = U_mu(x),
        L_{-mu}(x) = U_mu(x - mu)^dag."""
        path = tuple(int(s) for s in path)
        for step in path:
            if step == 0 or abs(step) > self.lat.nd:
                raise ValueError(
                    f"bad path step {step}: expected +-(mu+1) with "
                    f"mu < nd={self.lat.nd}")
        if not path:
            n = self.lat.nc
            ident = jnp.eye(n, dtype=self.u.dtype).reshape(
                (n, n) + (1,) * self.lat.nd)
            return jnp.broadcast_to(ident, (n, n) + self.lat.dims)
        if path in self._lines:
            return self._lines[path]
        if len(path) == 1:
            step = path[0]
            mu = abs(step) - 1
            if step > 0:
                w = self.u[mu]
            else:
                w = shift(linalg.adj(self.u[mu]), mu, -1, self.lat.nd)
        else:
            k = len(path) // 2
            a, b = path[:k], path[k:]
            wb = self._shift_by(b, self.line(b),
                                path_displacement(a, self.lat.nd))
            w = linalg.mul(self.line(a), wb)
        self._lines[path] = w
        return w

    def loop_trace(self, path) -> jax.Array:
        """Volume-averaged Re tr / nc of the (closed or open) line."""
        w = self.line(path)
        return (jnp.sum(linalg.re_trace(w))
                / (self.lat.nc * self.lat.volume))

    # -- loop families -----------------------------------------------------
    def rect_path(self, mu: int, nu: int, r: int, t: int
                  ) -> tuple[int, ...]:
        """R x T rectangle in the (mu, nu) plane starting at x."""
        return ((mu + 1,) * r + (nu + 1,) * t
                + (-(mu + 1),) * r + (-(nu + 1),) * t)

    def wilson_loop(self, mu: int, nu: int, r: int, t: int) -> jax.Array:
        """Averaged R x T Wilson loop (QEX loop observables family)."""
        return self.loop_trace(self.rect_path(mu, nu, r, t))

    def clover_leaves(self, mu: int, nu: int) -> jax.Array:
        """Sum of the four plaquette leaves around x in the (mu, nu)
        plane -- the clover input to Fmunu, all four built from the
        same cached single-link segments."""
        pmu, pnu = mu + 1, nu + 1
        paths = [
            (pmu, pnu, -pmu, -pnu),
            (pnu, -pmu, -pnu, pmu),
            (-pmu, -pnu, pmu, pnu),
            (-pnu, pmu, pnu, -pmu),
        ]
        total = None
        for p in paths:
            w = self.line(p)
            total = w if total is None else total + w
        return total

    def stats(self) -> dict:
        return {"segments": len(self._lines),
                "shifted": len(self._shifted)}
