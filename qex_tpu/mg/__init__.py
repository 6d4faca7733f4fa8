"""Wilson multigrid prototype.

TPU-native replacement for QEX's src/mg/ (blocking mgblocks.nim, setup
wmgsetup.nim, GCR-preconditioned solve wilsonmg.nim:58-104).
"""

from .twogrid import MGSetup, mg_setup, mg_preconditioner, mg_solve
from .kcycle import MGHierarchy, mg_hierarchy, k_cycle, mg_solve_kcycle

__all__ = ["MGSetup", "mg_setup", "mg_preconditioner", "mg_solve",
           "MGHierarchy", "mg_hierarchy", "k_cycle", "mg_solve_kcycle"]
