"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against all vectors, dot products computed JVM-side with
``posexplode`` / ``zip_with`` + ``aggregate`` (whole-stage codegen, no
Python).

Scale path: IVF-style partition pruning — vectors are grouped into
coarse cells (here the ``label`` column plays the centroid-assignment
role; in production a k-means pass would assign it), the query probes
only its nearest cell, shrinking the scan by the cell count. An LSH
variant (random-hyperplane signs) is the alternative when cells are
unavailable; both keep the per-bucket work a plain equi-join.

Determinism (pinned): vectors are quantized to int64 milli units
(``floor(x·1000 + 0.5)``) BEFORE any arithmetic. Dot products and
squared norms are then exact integer sums (associative → partition-
order invariant), and ``cos = dot / (sqrt(na)·sqrt(nb))`` uses only
correctly-rounded IEEE ops — bit-identical in Spark, DuckDB, and
Python. The 1e-3 quantization is harmless for near-dup detection and
is what makes cross-engine rank-identity provable rather than
probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000  # milli quantization of embedding values


def quantize_vec(col):
    """array<float> → array<long>, x → floor(x·1000 + 0.5)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"))


def _dot_q(a, b):
    """Exact integer dot product of two quantized vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_q(a, b):
    """cos over quantized vectors: int dot / (sqrt·sqrt) — bit-exact."""
    return _dot_q(a, b).cast("double") / (
        F.sqrt(_dot_q(a, a).cast("double")) * F.sqrt(_dot_q(b, b).cast("double"))
    )


def cosine_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: (query_id, rank, neighbor_id, cos_micro).

    The query side is tiny → broadcast; the scan side streams once,
    entirely in codegen'd JVM expressions. Ties: cos DESC, neighbor ASC.
    """
    base = embeddings.select(id_col, quantize_vec(F.col(vec_col)).alias("qv"))
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("qv").alias("qvec")
    )
    pairs = (
        base.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine_q(F.col("qvec"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col(id_col).alias("neighbor_id"),
            F.floor(F.col("cos") * 1_000_000 + F.lit(0.5)).cast("long").alias("cos_micro"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-bucketed ANN: probe only the query's nearest cell.

    Cell centroids = elementwise integer mean of quantized vectors
    (``sum div count`` — exact), computed via posexplode + groupBy so
    it scales to any dimension. Centroids are broadcast (cell count is
    small); the final scan touches one cell per query.
    """
    base = embeddings.select(id_col, cell_col, quantize_vec(F.col(vec_col)).alias("qv"))
    exploded = base.select(cell_col, F.posexplode("qv").alias("dim", "val"))
    # floor(double division): matches SQL floor-division semantics for
    # negative sums too (Spark's integer `div` truncates toward zero)
    centroids = (
        exploded.groupBy(cell_col, "dim")
        .agg(F.floor(F.sum("val").cast("double") / F.count("*")).cast("long").alias("cval"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "cval"))).alias("pairs"))
        .select(cell_col, F.transform("pairs", lambda s: s["cval"]).alias("cvec"))
    )
    q = base.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("qv").alias("qvec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("ccos").desc(), F.col(cell_col))
    best_cell = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", cosine_q(F.col("qvec"), F.col("cvec")))
        .withColumn("crank", F.row_number().over(wq))
        .where(F.col("crank") == 1)
        .select("query_id", "qvec", cell_col)
    )
    pairs = (
        base.join(F.broadcast(best_cell), cell_col)
        .where(F.col(id_col) != F.col("query_id"))
        .withColumn("cos", cosine_q(F.col("qvec"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col(id_col).alias("neighbor_id"))
    )


def cosine_dup_pairs(
    embeddings: DataFrame,
    threshold_micro: int = 900_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cos_micro ≥ threshold, ids only.

    Gate-scale quadratic join; the scale path pre-buckets by IVF cell
    or LSH band so only same-bucket pairs are scored.
    """
    base = embeddings.select(id_col, quantize_vec(F.col(vec_col)).alias("qv"))
    a = base.select(F.col(id_col).alias("vec_a"), F.col("qv").alias("va"))
    b = base.select(F.col(id_col).alias("vec_b"), F.col("qv").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cos_micro",
            F.floor(cosine_q(F.col("va"), F.col("vb")) * 1_000_000 + F.lit(0.5)).cast("long"),
        )
        .where(F.col("cos_micro") >= threshold_micro)
        .select("vec_a", "vec_b", "cos_micro")
    )
