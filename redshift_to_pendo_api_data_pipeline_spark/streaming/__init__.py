"""Structured Streaming incremental variant."""
