"""Utilities: config decks, CLI params, profiling, resampling stats."""
