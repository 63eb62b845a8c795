"""Column-expression record transforms (no Python row loops)."""
