"""qex_tpu: TPU-native lattice field theory framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the QEX
lattice-QCD framework (ctpeterson/qex fork): sharded SU(N) gauge and
staggered/Wilson fermion fields on a device mesh, even-odd Dirac
operators and Krylov solvers, differentiable smearing and HMC forces,
gradient flow, observables, SciDAC-compatible I/O, and XML/JSON-driven
MCMC applications.  See SURVEY.md for the full blueprint.
"""

from .lattice import Lattice

__version__ = "0.1.0"
__all__ = ["Lattice"]
