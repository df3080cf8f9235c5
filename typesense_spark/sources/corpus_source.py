"""Corpus source adapter — reads the north-rule input table
``(repo, path, commit, lang, content)`` from Iceberg (production) or
parquet (this sandbox, which carries no Iceberg runtime jar).

Iceberg is the production target because the build exploits exactly
what it provides: snapshot-isolated reads (the checkpointed build's
determinism contract needs ONE immutable input snapshot across resume
attempts), partition pruning on repo/lang predicates, and metadata
tables for file-level lineage. On a cluster, add
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and pass a
catalog table name; everything downstream is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """``source`` = Iceberg table name (catalog.db.table) or a parquet
    path. ``snapshot_id`` pins an Iceberg snapshot (resume determinism).
    """
    if "/" in source or source.endswith(".parquet"):
        df = spark.read.parquet(source)
    else:
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        df = reader.load(source)
    if validate:
        missing = [c for c in CORPUS_COLUMNS if c not in df.columns]
        if missing:
            raise ValueError(f"corpus source missing columns: {missing}")
        df = df.select(*CORPUS_COLUMNS, *[c for c in df.columns if c not in CORPUS_COLUMNS])
    return df


def content_sha_check(df: DataFrame, expected_sha_col: str = "content_sha") -> DataFrame:
    """Per-row invariant vs the source table (input_hint): rows whose
    stored sha doesn't match ``sha2(content, 256)``. Empty = pass."""
    return df.where(
        F.col(expected_sha_col).isNotNull()
        & (F.sha2(F.col("content"), 256) != F.col(expected_sha_col))
    )
