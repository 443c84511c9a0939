"""Structured Streaming jobs — the engine's streaming layer."""
