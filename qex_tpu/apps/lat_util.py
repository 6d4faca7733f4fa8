"""Lattice-file utilities: inspect and compare SciDAC configurations.

TPU-native replacement for QEX's src/examples/checklat.nim (print a
file's lattice size and plaquette) and src/examples/fieldCmp.nim
(site-by-site comparison of fields from multiple files: norms,
difference norms, per-timeslice traces).

Usage:
    python -m qex_tpu.apps.lat_util check FILE
    python -m qex_tpu.apps.lat_util cmp FILE0 FILE1 [FILE2 ...]
"""

from __future__ import annotations

import sys


def _check(path: str) -> int:
    import jax
    import jax.numpy as jnp

    from qex_tpu.gauge import loops
    from qex_tpu.io import lime
    from qex_tpu.lattice import Lattice

    dims = lime.file_lattice(path)
    print(f"Lattice size: {list(dims)}")
    lat = Lattice(dims)
    u = jnp.asarray(lime.load_gauge(path, lat))
    pl = jax.jit(lambda g: loops.plaquette(lat, g))(u)
    print(f"plaq: {float(jnp.real(pl)):.10g}")
    return 0


def _cmp(paths: list[str]) -> int:
    import numpy as np

    from qex_tpu.io import lime
    from qex_tpu.lattice import Lattice

    dims = lime.file_lattice(paths[0])
    print(f"Lattice size: {list(dims)}")
    for p in paths[1:]:
        d = lime.file_lattice(p)
        if d != dims:
            print(f"Error: file {p} has lattice size {list(d)} != "
                  f"{list(dims)}")
            return 1
    lat = Lattice(dims)
    nt = dims[-1]
    fields, traces, norms = [], [], []
    for p in paths:
        print(f"Loading field from file: {p}")
        arr = lime.load_gauge(p, lat)
        fields.append(arr)
        # per-timeslice trace of the real part (fieldCmp.nim:47-53)
        tr = np.real(arr).sum(axis=tuple(range(arr.ndim - 1)))
        traces.append(tr)
        n2 = float(np.vdot(arr, arr).real)
        norms.append(n2)
        print(f"Field {len(fields)-1} norm2: {n2:.10g}")
    rc = 0
    for i in range(1, len(fields)):
        d = fields[i] - fields[i - 1]
        dn = float(np.vdot(d, d).real)
        rel = dn / max(min(norms[i], norms[i - 1]), 1e-300)
        print(f"Difference between field {i-1} and field {i}")
        print(f"\tNorm2 of the field difference: {dn:.6g} "
              f"relative: {rel:.6g}")
        x = 0.0
        for t in range(nt):
            lo = min(abs(traces[i][t]), abs(traces[i - 1][t]))
            x = max(x, abs(traces[i][t] - traces[i - 1][t])
                    / max(lo, 1e-300))
        print(f"\tMax relative difference in time slice traces: "
              f"{x:.6g}")
        rc |= rel > 1e-25
    return rc


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) >= 2 and argv[0] == "check":
        return _check(argv[1])
    if len(argv) >= 3 and argv[0] == "cmp":
        return _cmp(argv[1:])
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
