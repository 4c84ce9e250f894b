"""Structured Streaming operators (events stream)."""
