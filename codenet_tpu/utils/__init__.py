"""Utilities: meters, logging, oracle probes, visualization."""
