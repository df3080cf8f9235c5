from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from typesense_spark import get_spark  # noqa: E402
from typesense_spark.corpus import generate_rows  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="typesense-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    """Deterministic 300-doc code corpus (FIXTURES.md F1 'tiny'+)."""
    return generate_rows(300, seed=42)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_rows):
    from typesense_spark.corpus import CORPUS_SCHEMA

    return spark.createDataFrame(corpus_rows, schema=CORPUS_SCHEMA)


@pytest.fixture(scope="session")
def built_index(spark, corpus_df):
    from typesense_spark.index import build_index

    return build_index(
        spark,
        corpus_df,
        fields=["content"],
        key_cols=["repo", "path", "commit"],
        num_buckets=8,
        block_size=32,  # small blocks → many blocks → exercises block logic
        salt_threshold=100,  # hot terms (import/return/...) get salted
        n_salts=4,
    )


@pytest.fixture(scope="session")
def oracle_index(built_index):
    """Pure-Python oracle over the SAME doc_ids the engine assigned."""
    from typesense_spark import oracle

    rows = [
        (r["doc_id"], r["content"], r["repo"], r["lang"])
        for r in built_index.docs.select("doc_id", "content", "repo", "lang").collect()
    ]
    attrs = {d: {"repo": rp, "lang": lg} for d, _, rp, lg in rows}
    return oracle.build([(d, c) for d, c, _, _ in rows], attrs)
