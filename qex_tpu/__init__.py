"""qex_tpu: TPU-native lattice field theory framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the QEX
lattice-QCD framework (ctpeterson/qex fork): sharded SU(N) gauge and
staggered/Wilson fermion fields on a device mesh, even-odd Dirac
operators and Krylov solvers, differentiable smearing and HMC forces,
gradient flow, observables, SciDAC-compatible I/O, and XML/JSON-driven
MCMC applications.  See SURVEY.md for the full blueprint.
"""

import jax as _jax

# Lattice QCD needs true float32 arithmetic: XLA's DEFAULT matmul
# precision on TPU routes f32 (and thus complex64) contractions through
# bf16 MXU passes, which destroys SU(3) unitarity (~1e-2 relative
# error).  Full-f32 is the correct default for physics; kernels that
# deliberately want bf16 links (mixed-precision experiments) request it
# explicitly per-op.
_jax.config.update("jax_default_matmul_precision", "float32")

from .lattice import Lattice

__version__ = "0.1.0"
__all__ = ["Lattice"]
