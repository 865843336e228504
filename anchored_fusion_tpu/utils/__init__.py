"""Observability and stage-cache utilities."""
