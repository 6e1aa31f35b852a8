"""Shared utilities: timing, logging, profiling."""
