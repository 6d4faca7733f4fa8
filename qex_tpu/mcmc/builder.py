"""JSON-driven lattice field theory builder.

TPU-native replacement for QEX's mcmc builder DSL
(``newLatticeFieldTheory(json)`` + addGaugeAction/addStaggeredFermion/
addRootedStaggeredFermion/addStaggeredBoson, src/mcmc/mcmcTypes.nim:924,
src/mcmc/actions/latticeAction.nim:65-170) -- accepts the same JSON
schema as the reference's example decks
(src/examples/example_files/input.json): hmc/action/gauge +
staggered-fermions / rooted-staggered-fermions / staggered-pauli-villars
sections with per-field steps and integrators, and optional flow
measurement configs.
"""

from __future__ import annotations

import json
from ..gauge import action as ga
from ..gauge.smear import HypCoefs
from ..lattice import Lattice
from ..solvers.base import SolverParams
from .theory import FermionSpec, GaugeActionSpec, LatticeFieldTheory

_MATTER_SECTIONS = {
    "staggered-fermions": "fermion",
    "rooted-staggered-fermions": "rooted",
    "staggered-pauli-villars": "boson",
    "staggered-boson": "boson",
}


def _gauge_coeffs(g: dict) -> ga.GaugeActionCoeffs:
    act = g.get("action", "Wilson").lower()
    beta = float(g.get("beta", 6.0))
    if act == "wilson":
        return ga.wilson(beta)
    if act in ("rectangle", "rect"):
        return ga.gauge_act_rect(beta, float(g.get("cr", -1.0 / 12.0)))
    if act == "adjoint":
        return ga.adjoint_action(beta, float(g.get("adjoint-ratio",
                                                   -0.25)))
    if act == "symanzik":
        return ga.symanzik(beta)
    if act == "iwasaki":
        return ga.iwasaki(beta)
    if act == "dbw2":
        return ga.dbw2(beta)
    raise ValueError(f"unknown gauge action {g.get('action')!r}")


def theory_from_json(src: str | dict, mesh_to_solver: bool | None = None
                     ) -> tuple[Lattice, LatticeFieldTheory, dict]:
    """Build (lattice, theory, meta) from a reference-format JSON deck.

    ``meta`` carries hmc-section info the driver needs (trajectory
    length, seeds, start, flow configs) plus ``meta["mesh"]``: a
    LatticeMesh built from the deck's ``hmc["mpi-geometry"]`` rank
    split (mcmcTypes.nim:905-907) or None.  With a mesh,
    ``mesh_to_solver`` routes the staggered solves through the
    shard_map Pallas kernels (stag_shard); default None = only on
    TPU, where the fused kernels need explicit sharding (on CPU the
    GSPMD XLA path is the fast one -- same policy as
    apps/staghmc_spv.py).
    """
    if isinstance(src, str):
        with open(src) as f:
            cfg = json.load(f)
    else:
        cfg = dict(src)

    hmc = cfg.get("hmc", {})
    lat = Lattice(tuple(hmc.get("lattice-geometry", [4, 4, 4, 4])))
    tau = float(hmc.get("trajectory-length", 1.0))

    act = cfg.get("action", {})
    smear = None
    smkind = act.get("smearing", "none").lower()
    if smkind == "nhyp":
        a = act.get("smearing-coefficients", [0.4, 0.5, 0.5])
        smear = HypCoefs(*[float(x) for x in a])
    elif smkind == "stout":
        from ..gauge.smear import StoutCoefs
        a = act.get("smearing-coefficients", [0.1])
        rho = float(a[0]) if isinstance(a, (list, tuple)) else float(a)
        smear = StoutCoefs(rho)
    elif smkind not in ("none", ""):
        raise ValueError(f"unknown smearing kind {smkind!r}")
    bc = act.get("boundary-conditions", "pppa")

    g = cfg.get("gauge", {})
    gauge = GaugeActionSpec(_gauge_coeffs(g),
                            steps=int(g.get("steps", 10)),
                            scheme=str(g.get("integrator", "2MN")),
                            smeared=bool(g.get("smeared", False)))

    fermions: list[FermionSpec] = []
    for section, kind in _MATTER_SECTIONS.items():
        if section not in cfg:
            continue
        entries = cfg[section]
        if isinstance(entries, dict):
            entries = [entries]
        for e in entries:
            # QEX 'species': number of identical fields (PV typically
            # 16); 0 means section disabled in the reference decks.
            n = int(e.get("species", 1))
            if n <= 0:
                continue
            for _ in range(n if kind == "boson" else max(1, n)):
                fermions.append(FermionSpec(
                    kind, float(e.get("mass", 0.1)),
                    steps=int(e.get("steps", 10)),
                    scheme=str(e.get("integrator", "2MN")),
                    smeared=smear is not None,
                    nf=int(e.get("nf", 1)),
                    hmasses=tuple(e.get("hasenbusch-masses", ())),
                ))

    lm = None
    if hmc.get("mpi-geometry"):
        import math

        import jax

        from ..parallel import make_lattice_mesh
        rg = tuple(int(x) for x in hmc["mpi-geometry"])
        lm = make_lattice_mesh(lat, devices=jax.devices()[:math.prod(rg)],
                               rank_geom=rg)
        if mesh_to_solver is None:
            mesh_to_solver = jax.devices()[0].platform != "cpu"

    solver = cfg.get("solver", {})
    sp = SolverParams(r2req=float(solver.get("tolerance", 1e-12)),
                      maxits=int(solver.get("max-iterations", 2000)),
                      restarts=int(solver.get("restarts", 3)),
                      mesh=(lm if (lm is not None and mesh_to_solver)
                            else None))

    theory = LatticeFieldTheory(lat, gauge, fermions, smear=smear,
                                bc=bc, solver_params=sp, tau=tau)
    meta = {
        "tau": tau,
        "serial_seed": int(hmc.get("serial-random-number-seed", 0)),
        "parallel_seed": int(hmc.get("parallel-random-number-seed", 0)),
        "start": hmc.get("start", "cold"),
        "flow": cfg.get("flow", {}),
        "mesh": lm,
    }
    return lat, theory, meta
