"""Modular MCMC framework: composable action terms, multi-timescale
molecular dynamics, JSON/XML-driven lattice field theories.

TPU-native replacement for QEX's src/mcmc/ (the fork's flagship layer:
``newLatticeFieldTheory`` builder, per-field integrators, nested MD
scheduling) and src/stagg_pv_hmc/'s production HMC.
"""

from .md import ActionTerm, build_schedule, run_trajectory
from .theory import LatticeFieldTheory, GaugeActionSpec, FermionSpec

__all__ = ["ActionTerm", "build_schedule", "run_trajectory",
           "LatticeFieldTheory", "GaugeActionSpec", "FermionSpec"]
