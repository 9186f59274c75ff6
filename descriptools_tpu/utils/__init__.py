"""Utilities: synthetic terrain, timing/benchmark helpers."""
