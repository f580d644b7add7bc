"""Expression library — every function returns a Catalyst Column built from
``pyspark.sql.functions`` so it stays inside whole-stage codegen (no Python
UDFs in the hot path)."""

from series_tiempo_ar_scraping_spark.functions.scalars import (  # noqa: F401
    cell_coord_col,
    cell_coord_row,
    file_extension,
    freq_iso_to_code,
    host_rewrite,
    missing_to_null,
    stable_hash64,
    strip_spaces,
    url_basename,
)
