"""Device-mesh parallelism: the TPU replacement for QEX's comms+layout
rank-grid domain decomposition (SURVEY.md §2.11, §5.8)."""

from .mesh import (LatticeMesh, make_lattice_mesh, field_spec, shard_field,
                   replicated_spec)
from . import distributed

__all__ = ["LatticeMesh", "make_lattice_mesh", "field_spec", "shard_field",
           "replicated_spec", "distributed"]
