"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()``   — the catalog from openskidata_processor_spark.plans
                  (one entry per SURVEY.md §2 operator class + the
                  training-data-pipeline operators).
``oracle_sql()``— matching DuckDB SQL for every exactly-reproducible query;
                  approximate operators (MinHash-LSH / SimHash / LSH-ANN /
                  IVF-ANN / PQ-ANN / sketches) are intentionally
                  oracle-free (rows-only checks, recall-harness-pinned).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from openskidata_processor_spark.plans import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["a2_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
