"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``typesense_spark.gate``, which holds one
(Spark callable, DuckDB oracle SQL) pair per implemented operator from
SURVEY.md §2 plus the training-data pipeline ops (dedup / ANN / text
analysis). See gate.py docstrings for the operator ↔ reference-code
mapping.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: multi-term AND with BM25 top-k on sf0.001."""
    from typesense_spark.gate import q_multi_and

    return q_multi_and(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from typesense_spark.gate import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from typesense_spark.gate import build_oracles

    return build_oracles()
