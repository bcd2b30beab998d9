"""Scalar/column functions (SURVEY.md §2.9) — native expressions, no UDFs."""
