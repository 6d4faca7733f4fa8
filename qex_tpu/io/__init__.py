"""Lattice I/O: checkpoints, SciDAC/LIME format codec.

TPU-native replacement for QEX's src/io/ (QIO/qiolite SciDAC-LIME
readers/writers, parallel IO, per-timeslice records) and the tri-part
checkpoint of staghmc_spv (gauge + RNG field + serial RNG,
SURVEY.md §5.4).
"""
