"""Microbenchmark suite (reference src/bench/ parity: benchLinalg,
benchGauge, benchGather, benchStagProp)."""
