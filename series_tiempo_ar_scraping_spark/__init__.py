"""series_tiempo_ar_scraping_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query / data-processing
capabilities of ``datosgobar/series-tiempo-ar-scraping`` (reference snapshot
at ``/root/reference``, cited as ``file:line`` in docstrings), extended with
the operators a large-scale (100 TB) training-data pipeline needs:
deduplication, similarity search, text analysis, and multimodal column
plumbing.

Design stance (SURVEY.md §7):

- Central data-plane abstraction: the **long-form observations table**
  ``(catalog_id, dataset_id, distribution_id, series_id, ts DATE,
  value DOUBLE)``; the reference's wide per-distribution CSV is a pivot at
  the sink, not the in-flight representation.
- Metadata is **normalized relational frames** (``catalogs``, ``datasets``,
  ``distributions``, ``fields``, ``themes``) instead of the reference's
  mutable object tree (``base.py:63-96``).
- Every stage returns ``(data, errors)``; statuses ``OK/WARNING/ERROR`` are
  data, never exceptions (reference ``base.py:198-207``).
- Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
  pruning, join selection, and AQE; Python UDFs only where built-ins cannot
  express the semantics (workbook cell extraction, multimodal decode).
"""

__version__ = "0.1.0"
