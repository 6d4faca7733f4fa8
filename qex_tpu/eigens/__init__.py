"""Eigensolvers: thick-restart Lanczos for lattice operators.

TPU-native replacement for QEX's src/eigens/ (svdLanczos.nim, the
PRIMME wrappers qexPrimme.nim:59, hisqev.nim): PRIMME-equivalent
functionality implemented natively on the JAX stack.
"""

from .lanczos import lanczos_hermitian, eigs_hermitian, svd_lowest

__all__ = ["lanczos_hermitian", "eigs_hermitian", "svd_lowest"]
