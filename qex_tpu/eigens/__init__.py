"""Eigensolvers: Chebyshev-filtered thick-restart Lanczos for lattice
operators.

TPU-native replacement for QEX's src/eigens/ (svdLanczos.nim, the
PRIMME wrappers qexPrimme.nim:59, the hisqev.nim production driver,
and the Chebyshev-preconditioned PRIMME tests in tests/primme/):
PRIMME-equivalent functionality implemented natively on the JAX stack.
"""

from .lanczos import lanczos_hermitian, eigs_hermitian, svd_lowest
from .chebyshev import (chebyshev_filter, eigs_filtered,
                        estimate_spectral_range)
from .hisqev import (EigResult, deflation_basis, spectral_range_stag,
                     stag_eigs)
from .svdlanczos import svd_lanczos, svd_lanczos_dev, svd_stag

__all__ = ["lanczos_hermitian", "eigs_hermitian", "svd_lowest",
           "chebyshev_filter", "eigs_filtered",
           "estimate_spectral_range", "EigResult", "deflation_basis",
           "spectral_range_stag", "stag_eigs", "svd_lanczos",
           "svd_lanczos_dev", "svd_stag"]
