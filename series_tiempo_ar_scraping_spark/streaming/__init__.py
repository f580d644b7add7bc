"""Structured Streaming layer (SURVEY §2.11 — a new capability, the
reference is strictly batch)."""
