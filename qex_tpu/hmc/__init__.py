"""Hybrid Monte Carlo: symplectic integrators, Metropolis, trajectories.

TPU-native replacement for QEX's src/hmc/, src/algorithms/integrator.nim
(MDevolve wrapper) and the pure-gauge HMC drivers
(src/examples/puregaugehmc.nim, src/mcmc/mcmc/hamiltonianMonteCarlo.nim).
"""

from .integrators import INTEGRATORS, Integrator, integrate, get_integrator
from .hmc import hmc_step, HMCState, check_reverse

__all__ = ["INTEGRATORS", "Integrator", "integrate", "get_integrator",
           "hmc_step", "HMCState", "check_reverse"]
