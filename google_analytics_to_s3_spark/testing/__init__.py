"""Deterministic synthetic fixtures (no network, no external data)."""
