"""Relational operators of the engine (SURVEY §2 inventory)."""
