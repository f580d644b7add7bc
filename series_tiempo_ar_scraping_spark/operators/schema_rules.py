"""V1 rule compiler: JSON Schema (draft-04 subset) → Column expressions.

The reference validates metadata by running pydatajson's JSON-Schema
validation (``base.py:434-441``) against the draft-04 documents in
``config/schemas/``. This module makes the engine's V1 rules *derive*
from schema documents instead of being hand-transcribed: each scalar
property's ``required`` / ``format`` / ``pattern`` / ``minLength``
constraints compile to one boolean Column per rule, evaluated in a
single pass by ``validation.apply_rules``.

Supported subset (everything the catalog schemas use):

- ``required`` lists, including one level of nested object (``publisher``
  → ``publisher_name`` in the normalized frames);
- ``anyOf`` unions over string branches with ``format`` (email, uri,
  date, date-time), ``pattern``, ``minLength``/``maxLength``, plus
  ``null`` / ``integer`` / ``array`` branches;
- bare string properties with ``format``/``pattern``/``minLength``.

Structural properties (the nested entity arrays — ``dataset``,
``distribution``, ``field``, ``themeTaxonomy``) carry no value rule:
they're the normalization relationships themselves (SURVEY §1.3).

Naming contract: ``{entity}_{column}_required`` for presence,
``{entity}_{column}_format`` for value shape — so rule names stay
stable for report consumers regardless of how the schema evolves.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEMA_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config",
    "schemas",
)

# Structural nesting properties: relationships, not values.
STRUCTURAL_PROPS = {"dataset", "distribution", "field", "themeTaxonomy"}

FORMAT_REGEX: dict[str, str] = {
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "uri": r"^https?://\S+$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "date-time": (
        r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?(([+-]\d{2}:\d{2})|Z)?$"
    ),
}


def load_schema(entity: str) -> dict:
    with open(os.path.join(SCHEMA_DIR, f"{entity}.json")) as fh:
        return json.load(fh)


def _string_branch_ok(col: Column, branch: dict) -> Column:
    conds: list[Column] = []
    if "minLength" in branch:
        conds.append(F.length(col) >= branch["minLength"])
    if "maxLength" in branch:
        conds.append(F.length(col) <= branch["maxLength"])
    if "format" in branch:
        conds.append(col.rlike(FORMAT_REGEX[branch["format"]]))
    if "pattern" in branch:
        conds.append(col.rlike(branch["pattern"]))
    if "enum" in branch:
        conds.append(col.isin(*branch["enum"]))
    if not conds:
        return F.lit(True)
    return reduce(lambda a, b: a & b, conds)


def _branch_ok(col: Column, branch: dict) -> Column | None:
    t = branch.get("type")
    if t == "null":
        return col.isNull()
    if t == "array":
        # Array typing is enforced by the frame schema itself.
        return F.lit(True)
    if t == "integer":
        # Normalized frames carry metadata scalars as strings.
        return col.cast("string").rlike(r"^-?\d+$")
    if t == "string":
        return _string_branch_ok(col, branch)
    if t == "object":
        return None  # handled via path flattening
    if t is None and _is_constrained(branch):
        # draft-04 allows type-less constrained branches (e.g.
        # {"format": "uri"}): the string-class keywords still apply.
        # Falling through to lit(True) here would silently compile the
        # constraint into an always-pass rule that the coverage
        # inventory still counts as covered.
        return _string_branch_ok(col, branch)
    return F.lit(True)


def _value_ok(col: Column, prop_schema: dict) -> Column | None:
    """OK-expression for a present (non-null) value, or None if the
    schema imposes no value constraint (plain stringOrNull)."""
    if "anyOf" in prop_schema:
        branches = [
            _branch_ok(col, b)
            for b in prop_schema["anyOf"]
        ]
        branches = [b for b in branches if b is not None]
        if not branches:
            return None
        ok = reduce(lambda a, b: a | b, branches)
        # anyOf of only unconstrained branches compiles to literal True —
        # treat as no rule.
        if all(not _is_constrained(b) for b in prop_schema["anyOf"]):
            return None
        return ok
    return (
        _branch_ok(col, prop_schema)
        if _is_constrained(prop_schema)
        else None
    )


def _is_constrained(branch: dict) -> bool:
    if branch.get("type") in ("null", "array", "object"):
        return False
    return bool(
        {"format", "pattern", "minLength", "maxLength", "enum"}
        & branch.keys()
    ) or branch.get("type") == "integer"


def _rule_suffix(prop_schema: dict) -> str:
    """``enum`` when the only value constraint is an enum (so rule names
    read ``field_type_enum``, the vocabulary-check idiom); ``format``
    otherwise."""
    branches = prop_schema.get("anyOf", [prop_schema])
    kinds = {
        k
        for b in branches
        for k in ("format", "pattern", "minLength", "maxLength", "enum")
        if k in b
    }
    return "enum" if kinds == {"enum"} else "format"


def _scalar_paths(schema: dict) -> list[tuple[str, dict, bool]]:
    """[(flattened_column, prop_schema, is_required)] for every scalar
    property, flattening one nested-object level with ``_`` (matching the
    normalized frame columns, e.g. ``publisher_name``)."""
    out: list[tuple[str, dict, bool]] = []
    required = set(schema.get("required", []))
    for prop, ps in schema.get("properties", {}).items():
        if prop in STRUCTURAL_PROPS:
            continue
        if ps.get("type") == "object":
            sub_required = set(ps.get("required", []))
            for sub, sub_ps in ps.get("properties", {}).items():
                out.append(
                    (
                        f"{prop}_{sub}",
                        sub_ps,
                        prop in required and sub in sub_required,
                    )
                )
        else:
            out.append((prop, ps, prop in required))
    return out


def compile_rules(
    entity: str, columns: list[str] | None = None
) -> dict[str, Column]:
    """Compile ``config/schemas/{entity}.json`` into named rules.

    ``columns`` (when given) restricts rules to properties present in the
    normalized frame — schema properties the engine doesn't materialize
    (e.g. ``spatial``) produce no rule rather than a crash."""
    schema = load_schema(entity)
    rules: dict[str, Column] = {}
    for col_name, ps, is_required in _scalar_paths(schema):
        if columns is not None and col_name not in columns:
            continue
        col = F.col(col_name)
        if is_required:
            rules[f"{entity}_{col_name}_required"] = col.isNotNull()
        ok = _value_ok(col, ps)
        if ok is not None:
            rules[f"{entity}_{col_name}_{_rule_suffix(ps)}"] = (
                col.isNull() | ok
            )
    return rules


def schema_constraint_inventory(entity: str) -> dict[str, set[str]]:
    """For tests: which constraint kinds the schema declares per column —
    lets a test assert every declared constraint produced a rule."""
    schema = load_schema(entity)
    out: dict[str, set[str]] = {}
    for col_name, ps, is_required in _scalar_paths(schema):
        kinds: set[str] = set()
        if is_required:
            kinds.add("required")
        branches = ps.get("anyOf", [ps])
        if any(_is_constrained(b) for b in branches):
            kinds.add(_rule_suffix(ps))
        if kinds:
            out[col_name] = kinds
    return out
