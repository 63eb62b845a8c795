"""Batched, rate-limited, retrying HTTP sink."""
