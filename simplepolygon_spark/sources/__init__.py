"""Deterministic synthetic sources (fixtures, footprints, images)."""
