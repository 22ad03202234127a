"""Logging, metrics, memory and profiling utilities."""
