"""Relational + scale-extension operators."""
