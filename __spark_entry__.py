"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship DataS selection query (percentile
band + stride sample + gather — SURVEY §2.5) at sf0.001.
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle (see datas_spark/registry.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datas_spark.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's entire
    main.py flow — embedding column → KMeans clusters → per-cluster
    percentile-band confidence filter → stride sample → gather back to
    full document rows (SURVEY §3.1)."""
    return QUERIES["datas_full_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
