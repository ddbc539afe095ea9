"""Structured Streaming ingestion (the reference is batch-only; this is
the engine's streaming path for continuous tile rollups)."""
