"""Spin-model family (beyond-QCD Monte Carlo programs).

TPU-native replacement for QEX's src/xy_cluster_mc/ (2D XY Wolff
cluster updates + U(1) spin gradient flow) and src/xy_heatbath_mc/
(2D XY heatbath), plus the clock/heatbath examples of src/examples/.
"""
