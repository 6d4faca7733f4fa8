"""Wilson multigrid prototype.

TPU-native replacement for QEX's src/mg/ (blocking mgblocks.nim, setup
wmgsetup.nim, GCR-preconditioned solve wilsonmg.nim:58-104).
"""

from .twogrid import MGSetup, mg_setup, mg_preconditioner, mg_solve

__all__ = ["MGSetup", "mg_setup", "mg_preconditioner", "mg_solve"]
