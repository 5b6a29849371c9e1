"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — name → (spark, sf_dir) -> DataFrame, one per implemented
operator surface (see SURVEY.md §2 and fermor_spark/queries.py).
``oracle_sql()`` — matching DuckDB-runnable ANSI SQL per query name.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fermor_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the collaborative-filtering
    recommender over the star property graph (2-hop co-purchase expansion +
    per-origin anti-join + grouped-count ranking)."""
    return _q.g_recommender(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    return _q.all_oracles()
