"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end experiment slice on
sf0.001; ``queries()`` maps SURVEY §2 operator ids to Spark callables;
``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL for each.
Implementation lives in
``knowledge_graph_aware_recommender_systems_with_dbpedia_spark/plans/driver_queries.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knowledge_graph_aware_recommender_systems_with_dbpedia_spark.plans import (  # noqa: E402
    ORACLES,
    QUERIES,
    flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
