"""Pipeline planning (SURVEY §3 — EP1/EP2/EP3 as pure planning + actions)."""
