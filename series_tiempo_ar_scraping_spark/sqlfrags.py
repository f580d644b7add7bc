"""Shared DuckDB-SQL fragments mirroring the engine's text expressions.

Leaf module (no intra-package imports) so every query batch can use the
fragments without joining the ``queries*`` circular-import dance: the
oracle SQL for tokenization/shingling must stay lockstep with
``operators/textops.py``'s Column expressions, and living in one place
is what keeps them lockstep.
"""

from __future__ import annotations

_NORM_SQL = (
    "trim(regexp_replace(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'),"
    " ' +', ' ', 'g'))"
)
_TOKS_SQL = "regexp_split_to_array(trim({c}), '\\s+')"
_HEX60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

_SHINGLES_SQL = """
  list_distinct(list_transform(
    generate_series(0, greatest(len({t}) - 3, 0)),
    i -> concat_ws(' ', {t}[i+1], {t}[i+2], {t}[i+3])))
"""


def _toks_of_norm(col: str) -> str:
    return _TOKS_SQL.format(c=_NORM_SQL.format(c=col))
