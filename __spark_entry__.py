"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check at sf0.001.
queries()    — one entry per implemented operator from SURVEY.md §2 plus the
               LLM-pipeline operators (dedup/similarity/text analysis).
oracle_sql() — matching DuckDB SQL per query (column names aliased to match).

All real logic lives in the hadoop_3_0_0_beta1_gaia_spark package.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hadoop_3_0_0_beta1_gaia_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hadoop_3_0_0_beta1_gaia_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
