"""Driver-contract robustness: the grading driver imports
``__spark_entry__`` from an arbitrary cwd with a vanilla SparkSession.
This caught a real bug (executor Python workers couldn't import the
package for the stateful sessionizer when cwd != repo root), so the
whole class is pinned with a subprocess that runs OUTSIDE the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
assert len(e.entry(spark).collect()) > 0
qs = e.queries()
# one representative per executor-Python class: mapInPandas kernel,
# applyInPandasWithState, Arrow UDAF, Python UDTF, Python DataSource-free
for name in ("multimodal_frame_sample", "streaming_stateful_sessions",
             "weighted_avg_discount_udaf", "udtf_expand_series_calendar"):
    assert len(qs[name](spark, "/root/testdata/sf0.001").collect()) > 0, name
print("DRIVER_CONTRACT_OK")
"""


def test_entry_and_python_islands_from_foreign_cwd(tmp_path):
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
        env={**os.environ, "SPARK_GRAFT_CACHE_TABLES": "0"},
    )
    assert "DRIVER_CONTRACT_OK" in out.stdout, out.stderr[-3000:]
