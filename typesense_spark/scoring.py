"""Pinned BM25 scorer spec — frozen here, used EVERYWHERE.

The reference does NOT implement BM25 (its relevance is a packed integer
``(words_present<<16)|(255-typo_cost)<<8|proximity``,
``/root/reference/include/match_score.h:49-57``); per SURVEY.md §0.1 and
the north rule we pin a BM25 spec used identically by:

- the Spark engine (contributions computed AT BUILD TIME per
  (term, doc) and stored quantized in the postings blocks),
- the DuckDB oracle SQL in ``__spark_entry__``,
- the pure-Python oracle (``typesense_spark.oracle``).

Spec (Lucene-flavoured, k1=1.2, b=0.75):

    idf(N, df)            = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(tf, dl, avgdl) = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    contrib_milli          = floor(idf * tf_norm * 1e6 + 0.5)  # int64
    score_milli(doc)       = Σ_qtoken max_candidate contrib_milli

Quantizing per-(term,doc) contributions to int64 **before** any
aggregation makes distributed sums exact (long addition is associative)
— no float summation-order divergence between Spark partitions, DuckDB,
and the Python oracle (SURVEY.md §7 "Rank-identity under distribution").

Ties break like the reference: score DESC, then doc_id DESC
(``/root/reference/include/topster.h:254-257``;
``test/collection_test.cpp:116``).
"""

from __future__ import annotations

import math

K1 = 1.2
B = 0.75
SCALE = 1_000_000  # milli… micro really: 1e6 quantization


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: int, dl: int, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def contrib_milli(tf: int, dl: int, df: int, n_docs: int, avgdl: float) -> int:
    """Quantized per-(term, doc) BM25 contribution (exact int64)."""
    return int(math.floor(idf(n_docs, df) * tf_norm(tf, dl, avgdl) * SCALE + 0.5))


def spark_contrib_expr(tf_col, dl_col, df_col, n_docs: int, avgdl: float):
    """The identical formula as a Spark Column (JVM, codegen'd)."""
    from pyspark.sql import functions as F

    idf_c = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - df_col + F.lit(0.5)) / (df_col + F.lit(0.5))
    )
    tfn_c = (tf_col * F.lit(K1 + 1.0)) / (
        tf_col + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dl_col / F.lit(float(avgdl)))
    )
    return F.floor(idf_c * tfn_c * F.lit(float(SCALE)) + F.lit(0.5)).cast("long")


def duckdb_contrib_sql(tf: str, dl: str, df: str, n_docs: str, avgdl: str) -> str:
    """The identical formula as DuckDB SQL (oracle side)."""
    # parenthesization mirrors the numpy evaluation order in the pack
    # UDF exactly: idf * ( (tf*(k1+1)) / (tf + k1*(1-b+b*dl/avgdl)) )
    return (
        f"CAST(floor(ln(1.0 + ({n_docs} - {df} + 0.5) / ({df} + 0.5)) * "
        f"((({tf}) * {K1 + 1.0}) / (({tf}) + {K1} * ({1.0 - B} + {B} * ({dl}) / ({avgdl})))) "
        f"* {SCALE}.0 + 0.5) AS BIGINT)"
    )
