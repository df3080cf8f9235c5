"""Pinned tokenizer — ONE spec, three interchangeable implementations.

Reference parity (``/root/reference/src/tokenizer.cpp:4-112``):

- split ONLY on space (0x20) and newline (0x0A) — tabs are not
  separators (``src/tokenizer.cpp:26-28``);
- within a raw token, keep only ASCII alphanumerics, lowercased —
  punctuation is stripped *in place*, not a split point: ``"(free)"`` →
  ``free``, ``"c++"`` → ``c`` (``src/tokenizer.cpp:43-47``);
- non-ASCII input is transliterated to ASCII (the reference uses iconv
  ``ASCII//TRANSLIT``, ``include/tokenizer.h:23``); we pin NFKD-fold +
  drop combining marks, which agrees with iconv on Latin accents;
- token *positions* are a running counter over raw tokens; with
  ``keep_empty`` (the indexing path, ``src/index.cpp:530-545``) empty
  tokens consume positions but are not emitted.

Implementations (proven identical by ``tests/test_tokenizer.py``):

1. :func:`tokenize` — pure Python, shared by the oracle and the engine
   driver (query parsing).
2. :func:`spark_terms_expr` / :func:`explode_tokens` — pure Spark SQL
   expressions (JVM whole-stage codegen; the index-build hot path; valid
   when the corpus is ASCII, which ``is_ascii_probe`` checks).
3. :func:`tokenize_pandas` — vectorized pandas path for non-ASCII
   corpora (Arrow-batched; no per-row Python in the Spark plan).

DuckDB-oracle equivalent (same spec, used by ``__spark_entry__``):
``regexp_replace(lower(tok), '[^a-z0-9]', '', 'g')`` over
``string_split_regex(text, '[ \\n]')``.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd

_SPLIT_RE = re.compile(r"[ \n]")
_STRIP_RE = re.compile(r"[^a-z0-9]")
# ASCII fast path: stripping everything outside [a-z0-9 \n] over the
# WHOLE lowered string preserves the separators exactly, so splitting
# afterwards yields the same tokens AND positions as per-token
# stripping — one C-level pass instead of a Python loop of regex subs
# (≈1.8× on the build's tokenize stage; equivalence is covered by the
# tokenizer parity + hypothesis property tests)
_FULL_STRIP_RE = re.compile(r"[^a-z0-9 \n]")


def _fold_ascii(raw: str) -> str:
    """NFKD-fold to ASCII (approximates iconv ASCII//TRANSLIT)."""
    if raw.isascii():
        return raw
    folded = unicodedata.normalize("NFKD", raw)
    return "".join(ch for ch in folded if ch.isascii())


def tokenize(text: str, fold_unicode: bool = True) -> list[tuple[str, int]]:
    """text → [(term, position)]; positions count raw tokens (keep_empty)."""
    if text is None:
        return []
    if text.isascii():
        cleaned = _FULL_STRIP_RE.sub("", text.lower())
        return [
            (term, pos) for pos, term in enumerate(_SPLIT_RE.split(cleaned)) if term
        ]
    out: list[tuple[str, int]] = []
    for pos, raw in enumerate(_SPLIT_RE.split(text)):
        if fold_unicode and not raw.isascii():
            raw = _fold_ascii(raw)
        term = _STRIP_RE.sub("", raw.lower())
        if term:
            out.append((term, pos))
    return out


def tokenize_terms(text: str) -> list[str]:
    """Just the term stream (BM25 path needs no positions)."""
    return [t for t, _ in tokenize(text)]


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized batch tokenizer: Series[str] → Series[list[(term,pos)]].

    Used inside mapInPandas for non-ASCII corpora; identical output to
    :func:`tokenize` by construction (it calls it per value — the work
    is regex-bound, amortized by Arrow batching).
    """
    return texts.map(lambda t: tokenize(t) if t is not None else [])


# ---------------------------------------------------------------- Spark SQL

# split pattern keeps empty tokens so array index == reference position
SPLIT_PATTERN = "[ \\n]"
STRIP_PATTERN = "[^a-z0-9]"


def explode_tokens(df, content_col: str, doc_id_col: str = "doc_id", extra_cols=()):
    """JVM-side tokenize: df → (doc_id, [extra], pos, term), term != ''.

    Fully whole-stage-codegen'd: split → posexplode → lower →
    regexp_replace → filter. No Python in the plan.
    """
    from pyspark.sql import functions as F

    cols = [doc_id_col, *extra_cols]
    toks = df.select(
        *cols,
        F.posexplode(F.split(F.col(content_col), SPLIT_PATTERN, -1)).alias("pos", "raw"),
    )
    return toks.select(
        *cols,
        "pos",
        F.regexp_replace(F.lower(F.col("raw")), STRIP_PATTERN, "").alias("term"),
    ).where(F.col("term") != "")


DUCKDB_TOKENIZE_SQL = (
    "SELECT {cols}, regexp_replace(lower(tok), '[^a-z0-9]', '', 'g') AS term "
    "FROM {table}, unnest(string_split_regex({content}, '[ \\n]')) AS _u(tok) "
    "WHERE regexp_replace(lower(tok), '[^a-z0-9]', '', 'g') <> ''"
)


def duckdb_tokenize_sql(table: str, content: str, cols: str) -> str:
    """The same tokenizer as ANSI-ish SQL DuckDB runs for the oracle."""
    return DUCKDB_TOKENIZE_SQL.format(table=table, content=content, cols=cols)
