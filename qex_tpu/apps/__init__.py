"""Runnable applications (the reference's compiled CLI programs,
SURVEY.md layer 14): staghmc_spv, gauge_flow, puregauge_hmc, ...

Each app is ``python -m qex_tpu.apps.<name> [args]`` with the same
XML/JSON decks as the reference where one exists.
"""
