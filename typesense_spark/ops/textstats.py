"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting — all JVM-expression based (no
Python in the plan), integer-quantized where fractional so the DuckDB
oracle matches exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from typesense_spark.ops import spread_small_input
from typesense_spark.tokenizer import explode_tokens

# pinned stopword marker lists per language (tiny, heuristic — the
# point is the deterministic distributed scoring shape, not NLP
# accuracy; mirrored literally in the oracle SQL)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to"],
    "es": ["el", "la", "de", "y", "que"],
    "de": ["der", "die", "das", "und", "nicht"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "shi", "le", "zai", "you"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

FP_MOD = 2147483647  # fingerprint modulus (2^31-1)


def language_id(docs: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Marker-token voting language-ID: (doc_id, pred_lang, marker_hits).

    Per doc, count marker-token occurrences per language; highest count
    wins (ties by language code ASC); zero markers → 'und'.
    """
    spark = docs.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        schema="cand_lang string, marker string",
    )
    tok = explode_tokens(docs.select(id_col, text_col), text_col, id_col)
    votes = (
        tok.join(F.broadcast(markers), tok["term"] == markers["marker"])
        .groupBy(F.col(id_col).alias("doc_id"), "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("cand_lang"))
    best = (
        votes.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"), F.col("hits").alias("marker_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("marker_hits", F.lit(0)).cast("long").alias("marker_hits"),
        )
    )


def quality_scores(docs: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features per doc (all exact integers):

    - n_tokens, n_chars
    - avg_token_len_micro = floor(1e6·Σlen(term)/n_tokens)
    - stopword_ratio_micro = floor(1e6·stopword_tokens/n_tokens)
    - alnum_ratio_micro = floor(1e6·alnum_chars/n_chars)
    """
    tok = explode_tokens(docs.select(id_col, text_col), text_col, id_col)
    per_doc = tok.groupBy(F.col(id_col).alias("doc_id")).agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.length("term")).alias("sum_term_len"),
        F.sum(F.when(F.col("term").isin(STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z0-9]", "")).cast("long").alias("n_alnum"),
    )
    return per_doc.join(chars, "doc_id").select(
        "doc_id",
        "n_tokens",
        "n_chars",
        F.floor(F.lit(1_000_000) * F.col("sum_term_len") / F.col("n_tokens")).cast("long").alias("avg_token_len_micro"),
        F.floor(F.lit(1_000_000) * F.col("n_stop") / F.col("n_tokens")).cast("long").alias("stopword_ratio_micro"),
        F.floor(F.lit(1_000_000) * F.col("n_alnum") / F.col("n_chars")).cast("long").alias("alnum_ratio_micro"),
    )


def token_counts(docs: DataFrame, text_col: str, id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways per doc:

    - ws_tokens: pinned-tokenizer token count (whitespace based)
    - bpe_tokens: BPE-ish segment count — runs of [a-z]+ / [0-9]+ after
      lowercasing (a letters/digits boundary starts a new piece, like a
      byte-level BPE pre-tokenizer)
    """
    tok = explode_tokens(docs.select(id_col, text_col), text_col, id_col)
    ws = tok.groupBy(F.col(id_col).alias("doc_id")).agg(F.count("*").alias("ws_tokens"))
    bpe = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+|[0-9]+"), F.lit(0))
        ).cast("long").alias("bpe_tokens"),
    )
    return ws.join(bpe, "doc_id").select("doc_id", "ws_tokens", "bpe_tokens")


def fingerprints(
    docs: DataFrame, text_col: str, id_col: str = "doc_id", use_hash_ids: bool = True
) -> DataFrame:
    """Positional document fingerprint (rolling-hash flavoured):

    fp = Σ_tokens (pos+1) · tid  mod p — order-sensitive (a permuted
    doc fingerprints differently) yet order-independent to COMPUTE
    (each token contributes independently → map-side combinable).
    Term ids: xxhash64 (scale) or dense_rank (oracle parity).
    """
    tok = explode_tokens(
        spread_small_input(docs.select(id_col, text_col)), text_col, id_col
    )
    if use_hash_ids:
        tok = tok.withColumn("tid", F.pmod(F.xxhash64("term"), F.lit(FP_MOD)))
    else:
        terms = tok.select("term").distinct()
        w = Window.orderBy("term")
        tids = terms.withColumn("tid", F.dense_rank().over(w).cast("long"))
        tok = tok.join(tids, "term")
    return (
        tok.withColumn("c", ((F.col("pos") + 1) * F.col("tid")) % F.lit(FP_MOD))
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg((F.sum("c") % F.lit(FP_MOD)).alias("fingerprint"))
    )


# PII patterns pinned to the Java/RE2 common regex subset (no
# backreferences or lookaround) so Spark's regexp_* and DuckDB's RE2
# engine match the SAME spans — the oracle mirrors these literally.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def scrub_pii(
    docs: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    kinds: tuple[str, ...] = ("email", "phone", "ipv4"),
) -> DataFrame:
    """Training-pipeline PII redaction: (doc_id, n_<kind>..., scrubbed).

    Counts are taken on the ORIGINAL text (so kind counts are
    independent of replacement order), then each kind's spans are
    replaced by a ``<KIND>`` placeholder, email → phone → ipv4. All
    JVM ``regexp_extract_all`` / ``regexp_replace`` expressions —
    map-side only, zero shuffle, scales as a pure scan.
    """
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    counts = [
        F.size(F.regexp_extract_all("_t", F.lit(PII_PATTERNS[k]), F.lit(0))).alias(
            f"n_{k}"
        )
        for k in kinds
    ]
    scrubbed = F.col("_t")
    for k in kinds:
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[k], f"<{k.upper()}>")
    return out.select("doc_id", *counts, scrubbed.alias("scrubbed"))
