"""K2/K3 — publishable catalog metadata writers.

The reference rewrites the filtered catalog after processing: ``data.json``
via pydatajson ``write_json_catalog`` (``base.py:494-498``) and
``catalog.xlsx`` via ``metadata.to_xlsx`` (``base.py:500-504``). Here the
normalized frames re-nest via ``renest_catalog`` (collect_list(struct)
bottom-up) for the JSON form, and the 5-sheet relational form writes
directly through the stdlib OOXML writer. Catalog metadata is tiny, so
both sinks are driver-side collects by design.
"""

from __future__ import annotations

import json

from series_tiempo_ar_scraping_spark.sinks.atomic import atomic_output_path
from series_tiempo_ar_scraping_spark.sources.catalog_json import renest_catalog
from series_tiempo_ar_scraping_spark.sources.xlsx import write_xlsx_frames


def _prune_nulls(obj):
    """Drop null keys/entries — pydatajson omits absent metadata keys
    rather than writing ``null``."""
    if isinstance(obj, dict):
        return {k: _prune_nulls(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, list):
        return [_prune_nulls(v) for v in obj if v is not None]
    return obj


def write_json_catalog(frames: dict, path: str) -> str:
    """K2 — re-nest the (published) frames → one ``data.json``."""
    nested = renest_catalog(
        {
            "catalogs": frames["catalogs"],
            "datasets": frames["datasets"],
            "distributions": frames.get(
                "distributions_published", frames["distributions"]
            ),
            "fields": frames.get("fields_published", frames["fields"]),
            "themes": frames.get("themes"),
        }
    )
    rows = [json.loads(r) for r in nested.toJSON().collect()]
    doc = _prune_nulls(rows[0]) if rows else {}
    if "catalog_id" in doc:
        doc["identifier"] = doc.pop("catalog_id")
    # stage + atomic replace: a crash mid-dump must never leave a
    # truncated data.json at the path consumers read
    with atomic_output_path(path) as tmp:
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(
                doc, fh, ensure_ascii=False, indent=2, sort_keys=True
            )
    return path


def write_xlsx_catalog(frames: dict, path: str) -> str:
    """K3 — 5-sheet ``catalog.xlsx`` in the pydatajson sheet layout
    (sheet order ``catalog/dataset/distribution/field/theme`` as in
    ``tests/project/mock/test2.xlsx``)."""
    sheets = {
        "catalog": frames["catalogs"],
        "dataset": frames["datasets"],
        "distribution": frames.get(
            "distributions_published", frames["distributions"]
        ),
        "field": frames.get("fields_published", frames["fields"]),
    }
    if "themes" in frames:
        sheets["theme"] = frames["themes"]
    return write_xlsx_frames(path, sheets)
