"""End-to-end pipelines and state management."""
