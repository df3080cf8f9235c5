"""Pure-Python single-process oracle — the obviously-correct reference
implementation of the pinned tokenizer + BM25 + retrieval semantics.

Used by pytest golden tests (FIXTURES.md F3): the Spark engine must be
rank-identical (doc ids AND quantized scores) to this oracle on every
query. It shares :mod:`typesense_spark.tokenizer` and the expansion
spec in :mod:`typesense_spark.search.expand`, but reimplements scoring
and set logic with plain dicts/loops — no Spark, no SQL, no numpy in
the scoring path (``math`` doubles are the same IEEE ops the pack UDF
uses; exactness comes from the int64 quantization, scoring.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from typesense_spark import scoring
from typesense_spark.search.expand import expand_query
from typesense_spark.tokenizer import tokenize


@dataclass
class OracleIndex:
    n_docs: int = 0
    avgdl: float = 0.0
    dl: dict[int, int] = field(default_factory=dict)
    tf: dict[str, dict[int, int]] = field(default_factory=dict)  # term → {doc: tf}
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)
    docs: dict[int, dict] = field(default_factory=dict)  # doc_id → attributes

    @property
    def term_df(self) -> dict[str, int]:
        return {t: len(d) for t, d in self.tf.items()}


def build(rows: list[tuple[int, str]], attrs: dict[int, dict] | None = None) -> OracleIndex:
    """rows: [(doc_id, text)] → index (keep_empty position semantics)."""
    ix = OracleIndex()
    total = 0
    for doc_id, text in rows:
        toks = tokenize(text)
        if not toks:
            continue
        ix.dl[doc_id] = len(toks)
        total += len(toks)
        for term, pos in toks:
            ix.tf.setdefault(term, {}).setdefault(doc_id, 0)
            ix.tf[term][doc_id] += 1
            ix.positions.setdefault(term, {}).setdefault(doc_id, []).append(pos)
    ix.n_docs = len(ix.dl)
    ix.avgdl = total / ix.n_docs if ix.n_docs else 0.0
    ix.docs = attrs or {}
    return ix


def contrib(ix: OracleIndex, term: str, doc_id: int) -> int:
    tf = ix.tf[term][doc_id]
    dfv = len(ix.tf[term])
    idf = math.log(1.0 + (ix.n_docs - dfv + 0.5) / (dfv + 0.5))
    tfn = tf * (scoring.K1 + 1.0) / (
        tf + scoring.K1 * (1.0 - scoring.B + scoring.B * ix.dl[doc_id] / ix.avgdl)
    )
    return int(math.floor(idf * tfn * scoring.SCALE + 0.5))


def search(
    ix: OracleIndex,
    tokens: list[str],
    num_typos: int = 0,
    prefix_last: bool = True,  # reference default (src/core_api.cpp:299)
    mode: str = "and",
    excludes: list[str] | None = None,
    k: int = 10,
    filter_fn=None,
) -> list[tuple[int, int]]:
    """→ [(doc_id, score_milli)] sorted score DESC, doc_id DESC, top k.

    Same drop-tokens enumeration as the engine
    (reference /root/reference/src/index.cpp:1757-1783).
    """
    n = len(tokens)
    plan = [tokens] + [
        tokens[: n - d] if d <= n // 2 else tokens[d - n // 2 :] for d in range(1, n)
    ]
    best: dict[int, int] = {}
    for attempt in plan:
        cand = expand_query(attempt, ix.term_df, num_typos, prefix_last)
        if mode == "and" and any(not cand[t] for t in attempt):
            continue
        per_doc: dict[int, dict[int, int]] = {}
        for qidx, tok in enumerate(attempt):
            for term, _cost in cand[tok]:
                for doc_id in ix.tf.get(term, {}):
                    c = contrib(ix, term, doc_id)
                    slot = per_doc.setdefault(doc_id, {})
                    slot[qidx] = max(slot.get(qidx, 0), c)
        for doc_id, toks_scores in per_doc.items():
            if mode == "and" and len(toks_scores) != len(attempt):
                continue
            s = sum(toks_scores.values())
            if s > best.get(doc_id, -1):
                best[doc_id] = s
        if len(best) >= 10:  # drop_tokens_threshold
            break
    if excludes:
        ex_docs = set()
        for t in excludes:
            ex_docs |= set(ix.tf.get(t, {}))
        best = {d: s for d, s in best.items() if d not in ex_docs}
    if filter_fn is not None:
        best = {d: s for d, s in best.items() if filter_fn(ix.docs.get(d, {}))}
    ranked = sorted(best.items(), key=lambda kv: (-kv[1], -kv[0]))
    return ranked[:k]
