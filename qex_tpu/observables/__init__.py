"""Measurement observables: meson correlators, chiral condensate,
noise sources with dilution.

TPU-native replacement for QEX's src/observables/ (fpvaMeas.nim,
conn4d.nim, scalarTrace.nim, sources.nim), src/physics/stagMesonLocal
and wilsonMeson, and src/algorithms/dilution.nim.
"""
