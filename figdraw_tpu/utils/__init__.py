"""Utilities: perf timers, PNG IO, debug helpers."""
