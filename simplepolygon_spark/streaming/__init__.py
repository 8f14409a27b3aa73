"""Structured Streaming operators (the reference is batch-only —
SURVEY.md §2.10 — so this module covers the engine-extension surface:
a streaming image feed with dedup, watermarked windowed metrics, and a
streaming tile-assignment path reusing the broadcast interval index)."""
