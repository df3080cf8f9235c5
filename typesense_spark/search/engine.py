"""Query engine — the read path (SURVEY.md §2.3 Q1-Q25).

Maps the reference's hand-rolled pipeline onto declarative Spark:

- Q1 parse (driver), Q3 typo expansion (``expand.py``), Q6/Q7/Q8
  AND/OR/ANDNOT as joins + aggregation over decoded postings,
- Q9 filters = plain ``WHERE`` on the docs table + semi-join,
- Q10 wildcard = docs scan + sort,
- Q13/Q14 sort + top-k = ``ORDER BY score DESC, doc_id DESC LIMIT k``
  (Spark's ``TakeOrderedAndProject`` IS the distributed Topster,
  ``/root/reference/include/topster.h:92-267``),
- Q15 grouped top-k = window ``row_number() <= group_limit``,
- Q16 drop-tokens = driver retry loop
  (``/root/reference/src/index.cpp:1757-1783``),
- Q17-Q19 facets = groupBy counts + min/max/sum/avg stats
  (``/root/reference/src/index.cpp:608-816``),
- Q22 pagination, Q24 projection, Q25 hydration = offset/limit +
  ``select`` + join back to docs.

Scoring: per-(term,doc) BM25 contributions are int64 milli values baked
into the postings at build time (``scoring.py``); a doc's score for a
query token is the MAX over that token's typo/prefix candidates, summed
across tokens — all exact long arithmetic, so results are identical
across partition counts, the DuckDB oracle, and the Python oracle.
Ties: score DESC then doc_id DESC, like the reference
(``include/topster.h:254-257``).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from typesense_spark.index.build import Index
from typesense_spark.search.expand import expand_query, expand_query_spark
from typesense_spark.tokenizer import tokenize_terms

DEFAULT_PER_PAGE = 10  # reference: src/core_api.cpp:351
TEXT_MATCH_FIELD = "_text_match"  # reference: sort_field_const::text_match
MAX_HITS = 250  # reference: src/core_api.cpp:324-329
PER_PAGE_MAX = 250  # reference: include/collection.h:414
GROUP_LIMIT_MAX = 99  # reference: include/collection.h:416
MAX_SORT_FIELDS = 3  # reference: src/collection.cpp:726-731
# above this many distinct terms the driver-dict expansion path would
# collect a dictionary that belongs on executors (SCALE.md: 5e8-5e9
# terms at 100 TB) — auto-route through expand_query_spark instead
EXPAND_COLLECT_THRESHOLD = 2_000_000


@dataclass
class SearchRequest:
    q: str
    fields: tuple[str, ...] = ("content",)
    mode: str = "and"  # AND intersection (reference default) | 'or'
    filter_expr: str | None = None  # SQL boolean over docs columns (Q9)
    # Q9 reference filter DSL ('lang := en && n_chars: [>=200, <50] &&
    # text: batch window') — see search/filters.py; composable with
    # filter_expr (both AND into the keep set)
    filter_by: str | None = None
    facet_by: tuple[str, ...] = ()
    facet_stats_for: tuple[str, ...] = ()  # numeric cols → min/max/sum/avg
    max_facet_values: int = 10  # reference: src/core_api.cpp:316
    group_by: tuple[str, ...] = ()
    group_limit: int = 3  # reference: src/core_api.cpp:376
    num_typos: int = 2  # reference: src/core_api.cpp:295
    # reference default: the LAST query token is prefix-matched
    # (prefix=true, src/core_api.cpp:299 — the autocomplete default);
    # pass False for whole-token-only matching on the last token
    prefix_last: bool = True
    # Q3/Q4 typo_tokens_threshold (reference Index::TYPO_TOKENS_THRESHOLD
    # = 100; search_candidates stops once results reach it,
    # src/index.cpp:947-950). Pinned Spark adaptation: iterative COST
    # deepening — score candidates of cost ≤ c for ascending c and stop
    # as soon as the match count reaches the threshold (coarser than the
    # reference's per-combination break — combination enumeration is
    # driver control flow a set engine shouldn't do — same user
    # contract: typo corrections surface only when closer matches are
    # scarce). None (pinned default) disables deepening: all candidate
    # costs score in one pass, which is what every oracle models.
    typo_tokens_threshold: int | None = None
    # typo metric: pinned default 'levenshtein' (Spark/DuckDB builtin
    # parity); 'osa' matches the reference's Damerau-OSA traversal
    # (transpositions cost 1, src/art.cpp:1149-1177)
    typo_distance: str = "levenshtein"
    # candidate ordering within each typo-cost level: 'frequency' (df,
    # the reference default) or 'max_score' (max static score over the
    # term's docs — requires the index built with score_col;
    # reference token_ordering, include/art.h:124-127)
    rank_tokens_by: str = "frequency"
    drop_tokens_threshold: int = 10  # reference: src/index.cpp:305
    page: int = 1
    per_page: int = DEFAULT_PER_PAGE
    sort_by: tuple[tuple[str, str], ...] = ()  # [(col, 'asc'|'desc')]; wildcard
    include_fields: tuple[str, ...] = ()
    # reference exclude_fields (src/core_api.cpp:366-369): strip these
    # doc columns from the hits. With include_fields empty it means
    # "every doc column except these"; with include_fields set it
    # subtracts from that list.
    exclude_fields: tuple[str, ...] = ()
    use_wand: bool = False
    # Q12 per-field weights, parallel to `fields`. Empty = the pinned
    # unweighted max-over-fields aggregation. Pass the reference's
    # default explicitly (N..1 by field order: (N, ..., 1)) to match
    # its multi-field ranking (src/collection.cpp:593-597).
    query_by_weights: tuple[int, ...] = ()
    # Q2 single-token synonyms: {token: [alternates]} — alternates join
    # the token's candidate set at cost 0 (fast path for the common
    # 1→1 case; full window semantics below)
    synonyms: dict = dc_field(default_factory=dict)
    # Q2 multi-token synonym windows: a SynonymStore of one-way /
    # multi-way rules; the query is rewritten to variant token vectors
    # (synonyms.synonym_reduction), each searched like the original and
    # merged by max score (reference src/collection.cpp:1929-2064 +
    # src/index.cpp:1443-1487). Pinned deviation: drop-tokens fallback
    # applies to the original vector only, not to variants.
    synonym_store: object | None = None
    # Q20 curation: pinned {doc_id: 1-based position} force-included at
    # fixed positions; hidden doc_ids excluded (reference overrides,
    # src/collection.cpp:427-493, splice src/collection.cpp:897-922)
    pinned: dict = dc_field(default_factory=dict)
    hidden: tuple = ()
    # Q20 stored override rules (curation.OverrideStore): matched
    # against the query string (exact|contains) and resolved into
    # pinned/hidden before the search; explicit pinned/hidden above
    # take precedence (reference populate_overrides)
    override_store: object | None = None
    # Q11 second-stage proximity re-rank: order becomes
    # (match_score DESC, score_milli DESC, doc_id DESC) — the packed
    # proximity score is the reference's primary relevance
    # (match_score.h:49-57); here it re-ranks the BM25 candidate set
    rerank_proximity: bool = False
    # Text-match-PRIMARY parity mode (r4 VERDICT #4): rank by the full
    # packed score INCLUDING the typo-cost byte —
    # (words<<16)|(255-total_cost)<<8|distance, the reference's DEFAULT
    # primary key (_text_match injected at src/collection.cpp:713-728;
    # packing include/match_score.h:49-57). Sort-field resolution
    # follows src/collection.cpp:708-728: '_text_match' may appear
    # ANYWHERE in sort_by (user-sort-primary when listed after user
    # fields); absent and < 3 fields → appended last; sort_by empty →
    # text_match leads with BM25 as the default_sorting_field stand-in.
    # Unlike rerank_proximity (cost
    # byte fixed at 255), the cost byte carries the sum of used
    # candidates' typo costs +1 per length-extension match
    # (src/index.cpp:2038-2040). Golden orderings from the reference's
    # own collection_test.cpp are asserted in tests/test_match.py.
    rank_by_text_match: bool = False


@dataclass
class SearchResult:
    hits: DataFrame  # rank, doc_id, score_milli (+include_fields)
    matched: DataFrame  # full candidate set (doc_id, score_milli)
    facets: dict = dc_field(default_factory=dict)
    facet_stats: dict = dc_field(default_factory=dict)
    attempts: list = dc_field(default_factory=list)
    grouped: DataFrame | None = None
    # Q20 × Q15: curated grouped page (group_pos, group_rank, doc_id,
    # score_milli, curated) — set when pinned/overrides AND group_by are
    # both present (reference grouped_hits, src/collection.cpp:890-922)
    grouped_hits: DataFrame | None = None
    _found: int | None = None

    def highlighted_hits(
        self, index: Index, field: str, query_terms: set[str], **hl_kw
    ) -> list[dict]:
        """Reference-shaped response rows: the hits page as dicts with a
        ``highlight`` entry (snippet / matched_tokens / value) computed
        driver-side over the ≤ per_page winners — the same place the
        reference shapes its JSON response (src/collection.cpp:960-1040).
        One hydration collect; match.highlight does the marking. Array
        string fields get the reference's per-element snippet list
        (match.highlight_array: snippets + indices sorted by per-element
        Match score)."""
        from typesense_spark.search.match import highlight, highlight_array

        rows = [r.asDict() for r in self.hits.collect()]
        if not rows:
            return rows
        contents = {
            r["doc_id"]: r[field]
            for r in index.docs.where(
                F.col("doc_id").isin([h["doc_id"] for h in rows])
            )
            .select("doc_id", field)
            .collect()
        }
        for h in rows:
            val = contents.get(h["doc_id"])
            if isinstance(val, list):
                h["highlight"] = highlight_array(val, query_terms, **hl_kw)
            else:
                h["highlight"] = highlight(val or "", query_terms, **hl_kw)
        return rows

    @property
    def found(self) -> int:
        """Total matched docs — computed lazily (it is its own Spark job;
        most callers only read the hits page)."""
        if self._found is None:
            self._found = self.matched.count()
        return self._found


# bounded registry of per-query persisted score relations: the
# drop-tokens fallback decision needs a count JOB over the merged score
# plan; persisting the narrow (doc_id, score_milli) rows lets the final
# hits/facets actions reuse the materialized scores instead of
# re-running the scan→decode→score pipeline. Handles are released
# LRU-style so long sessions don't accumulate executor storage.
# Keyed by SparkSession (ADVICE r3): evicting another session's handles
# attempts a best-effort unpersist (ADVICE r4 — the other session may
# still be LIVE), with failures swallowed so a stopped/replaced session
# (test suites, long-lived processes) can't make a later search raise.
_SCORE_CACHE_KEEP = 8
_score_cache: dict[int, list[DataFrame]] = {}


def _persist_scored(df: DataFrame) -> DataFrame:
    df = df.persist()
    key = id(df.sparkSession)
    for k in [k for k in _score_cache if k != key]:
        # r4 ADVICE: a key mismatch does not mean the other session is
        # dead — two live sessions alternating searches would otherwise
        # leak each other's persisted score relations. Try to unpersist
        # each evicted handle; a stopped session's JVM call just fails
        # into the except (the old behavior).
        for old in _score_cache.pop(k):
            try:
                old.unpersist()
            except Exception:
                pass  # session died under the handle — nothing to release
    cache = _score_cache.setdefault(key, [])
    cache.append(df)
    while len(cache) > _SCORE_CACHE_KEEP:
        old = cache.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass  # session died under the handle — nothing to release
    return df


def parse_query(q: str) -> tuple[list[str], list[str]]:
    """Reference Q1: '-tok' → exclude list; '*' → wildcard
    (src/collection.cpp:1166-1195). Tokens are run through the pinned
    tokenizer so query-side normalization == index-side. An empty
    include list (exclusion-only query like '-rocket', or an empty /
    all-punctuation q) promotes to wildcard, exactly the reference's
    q_include_tokens fallback (src/collection.cpp:1189-1192) — the
    excludes then subtract from the doc universe."""
    include, exclude = [], []
    for raw in q.split(" "):
        if raw.startswith("-") and len(raw) > 1:
            exclude.extend(tokenize_terms(raw[1:]))
        elif raw == "*":
            include.append("*")
        else:
            include.extend(tokenize_terms(raw))
    if not include:
        include.append("*")
    return include, exclude


def _terms_agg(index: Index, fields: tuple[str, ...]) -> DataFrame:
    """Per-term df (+ max_score when built) aggregated over the queried
    fields (stays distributed)."""
    aggs = [F.sum("df").alias("df")]
    if "max_score" in index.terms.columns:
        aggs.append(F.max("max_score").alias("max_score"))
    return (
        index.terms.where(F.col("field").isin(list(fields)))
        .groupBy("term")
        .agg(*aggs)
    )


def _get_term_rank(index: Index, fields: tuple[str, ...]) -> dict[str, int]:
    """Driver-side {term: max_score} for rank_tokens_by='max_score'
    (cached; same size bound as the df dict)."""
    if "max_score" not in index.terms.columns:
        raise ValueError(
            "rank_tokens_by='max_score' needs an index built with score_col"
        )
    cache = getattr(index, "_term_rank_cache", None)
    if cache is None:
        cache = {}
        index._term_rank_cache = cache
    key = tuple(sorted(fields))
    if key not in cache:
        rows = _terms_agg(index, fields).collect()
        cache[key] = {r["term"]: int(r["max_score"]) for r in rows}
    return cache[key]


def _n_terms(index: Index, fields: tuple[str, ...]) -> int:
    """Dictionary size for the queried fields (cached per field set) —
    the routing signal between driver-dict and Spark-join expansion."""
    cache = getattr(index, "_n_terms_cache", None)
    if cache is None:
        cache = {}
        index._n_terms_cache = cache
    key = tuple(sorted(fields))
    if key not in cache:
        cache[key] = _terms_agg(index, fields).count()
    return cache[key]


def _use_spark_expand(index: Index, fields: tuple[str, ...]) -> bool:
    threshold = getattr(index, "expand_collect_threshold", EXPAND_COLLECT_THRESHOLD)
    return _n_terms(index, fields) > threshold


def _get_term_df(index: Index, fields: tuple[str, ...]) -> dict[str, int]:
    """Driver-side term dictionary {term: df} (cached per field set).

    Only reachable below EXPAND_COLLECT_THRESHOLD; above it ``search()``
    routes expansion through ``expand.expand_query_spark`` (an
    F.levenshtein join against the distributed terms table), so no
    full-dictionary ``collect()`` exists on the scale path.
    """
    cache = getattr(index, "_term_df_cache", None)
    if cache is None:
        cache = {}
        index._term_df_cache = cache
    key = tuple(sorted(fields))
    if key not in cache:
        rows = _terms_agg(index, fields).collect()
        cache[key] = {r["term"]: int(r["df"]) for r in rows}
    return cache[key]


# below this many (qidx, term) pairs the candidate map attaches as a
# LITERAL map expression (pure projection — no createDataFrame driver
# round-trip, no BroadcastExchange stage per query); larger maps (batch
# paths, huge expansions) keep the broadcast join
_QIDX_LITERAL_MAX = 256


def _attach_qidx(index: Index, decoded: DataFrame, pairs: list[tuple[int, str]]) -> DataFrame:
    if len(pairs) <= _QIDX_LITERAL_MAX:
        by_term: dict[str, list[int]] = {}
        for i, t in pairs:
            by_term.setdefault(t, []).append(i)
        map_expr = F.map_from_arrays(
            F.array(*[F.lit(t) for t in by_term]),
            F.array(
                *[F.array(*[F.lit(i) for i in ids]) for ids in by_term.values()]
            ),
        )
        # explode drops rows whose term is absent from the map — the
        # same rows an inner join would drop
        return decoded.withColumn(
            "qidx", F.explode(F.element_at(map_expr, F.col("term")))
        )
    tmap = index.spark.createDataFrame(pairs, schema="qidx int, term string")
    return decoded.join(F.broadcast(tmap), "term")


def _score_tokens(
    index: Index,
    tokens: list[str],
    cand_map: dict[str, list[tuple[str, int]]],
    fields: tuple[str, ...],
    mode: str,
    use_wand: bool = False,
    weights: tuple[int, ...] = (),
    keep_ids: DataFrame | None = None,
) -> DataFrame | None:
    """Candidate postings → (doc_id, score_milli). None if no candidates.

    ``keep_ids`` only matters under WAND: the pruning threshold τ is
    computed over the filter-restricted seed set (filter-first, like
    the reference — see ``wand.prune_blocks``)."""
    pairs = [
        (i, term) for i, tok in enumerate(tokens) for term, _ in cand_map.get(tok, [])
    ]
    if not pairs or (mode == "and" and any(not cand_map.get(t) for t in tokens)):
        return None
    all_terms = sorted({t for _, t in pairs})
    if use_wand and mode == "or":
        from typesense_spark.index.build import decode_postings
        from typesense_spark.search.wand import prune_blocks

        pruned = prune_blocks(
            index, tokens, cand_map, fields, k=MAX_HITS, keep_ids=keep_ids
        )
        decoded = decode_postings(pruned)
    else:
        decoded = index.decoded(all_terms, list(fields))
    joined = _attach_qidx(index, decoded, pairs)
    if weights:
        # Q12 query_by_weights: per-field best candidate per token, then
        # the doc score sums field-wise WEIGHTED bests (the reference
        # sums weighted per-field scores, src/index.cpp:1543-1560;
        # default weights are N..1 by field order,
        # src/collection.cpp:593-597). A token counts as matched if any
        # field has it (distinct qidx), like the unweighted path.
        wmap = F.create_map(
            *[x for f, w in zip(fields, weights) for x in (F.lit(f), F.lit(int(w)))]
        )
        per_ft = joined.groupBy("doc_id", "field", "qidx").agg(
            F.max("contrib").alias("best")
        )
        scored = (
            per_ft.withColumn("ws", F.element_at(wmap, F.col("field")) * F.col("best"))
            .groupBy("doc_id")
            .agg(
                F.sum("ws").alias("score_milli"),
                F.countDistinct("qidx").alias("nmatch"),
            )
        )
    else:
        per_tok = (
            # multi-field: a token's score for a doc is its best field's
            # best candidate (reference aggregates best per-field scores,
            # src/index.cpp:1495-1593; pinned: max over fields×candidates)
            joined.groupBy("doc_id", "qidx").agg(F.max("contrib").alias("tok_score"))
        )
        scored = per_tok.groupBy("doc_id").agg(
            F.sum("tok_score").alias("score_milli"), F.count("*").alias("nmatch")
        )
    if mode == "and":
        scored = scored.where(F.col("nmatch") == len(tokens))
    return scored.select("doc_id", "score_milli")


def _deepen_level(
    index: Index,
    attempt: list[str],
    cand: dict[str, list[tuple[str, int]]],
    fields: tuple[str, ...],
    mode: str,
    threshold: int,
    narrow,
) -> int:
    """Q4 typo-deepening stop level in ONE probe job (r4 VERDICT #8).

    The reference stops enumerating costlier suggestions once results
    reach typo_tokens_threshold (src/index.cpp:947-950). The old driver
    loop here ran one narrowed count job per cost level; this is the
    batch path's conditional-aggregation shape ported back: every
    decision level's narrowed match count is one aggregate column over
    the SAME candidate-posting rows, collected as a single row. Returns
    the first level whose count reaches ``threshold``, else the max
    candidate cost (= no early stop). ``narrow`` applies the same
    excludes/filters/hidden the engine counts with (the reference's
    threshold compares against filtered results)."""
    max_cost = max((cost for lst in cand.values() for _, cost in lst), default=0)
    if max_cost == 0:
        return 0
    levels = list(range(max_cost))  # decision levels 0..max_cost-1
    pairs = sorted(
        {(i, t, c) for i, tok in enumerate(attempt) for t, c in cand.get(tok, [])}
    )
    decoded = index.decoded(sorted({t for _, t, _ in pairs}), list(fields))
    tmap = index.spark.createDataFrame(pairs, schema="qidx int, term string, cost int")
    per_tok = decoded.join(F.broadcast(tmap), "term").groupBy("doc_id", "qidx").agg(
        *[F.max(F.when(F.col("cost") <= c, F.lit(1))).alias(f"h{c}") for c in levels]
    )
    per_doc = per_tok.groupBy("doc_id").agg(
        *[F.count(f"h{c}").alias(f"om{c}") for c in levels]
    )

    def _matched(col: str):
        return F.col(col) == len(attempt) if mode == "and" else F.col(col) >= 1

    row = (
        narrow(per_doc)
        .agg(*[F.sum(_matched(f"om{c}").cast("long")).alias(f"n{c}") for c in levels])
        .collect()[0]
    )
    for c in levels:
        if (row[f"n{c}"] or 0) >= threshold:
            return c
    return max_cost


def _apply_excludes(
    index: Index, scored: DataFrame, excludes: list[str], fields: tuple[str, ...]
) -> DataFrame:
    """Q8 ANDNOT: anti-join docs containing any excluded (exact) term
    (reference excludes exact tokens, src/index.cpp:1357-1376)."""
    if not excludes:
        return scored
    ex_docs = index.decoded(sorted(set(excludes)), list(fields)).select("doc_id").distinct()
    return scored.join(ex_docs, "doc_id", "left_anti")


def facet_value_query(
    index: Index,
    matched: DataFrame,
    facet_col: str,
    fquery: str,
    num_typos: int = 1,
    max_values: int = 10,
    start_tag: str = "<mark>",
    end_tag: str = "</mark>",
) -> DataFrame:
    """Q18 facet-value autocomplete: count facet values over the matched
    set, keeping only values whose tokens prefix- or fuzzy-match the
    facet query (reference src/index.cpp:672-713, cost 0/1 against the
    shadow facet trie — here a plain scan of the distinct values).

    Also emits ``highlighted``: per value TOKEN, the matched prefix
    (facet-query length, capped at the token length) wrapped in the
    mark tags — the reference's facet-match highlighting
    (``src/collection.cpp:1099-1123``). All JVM expressions.
    """
    fq = fquery.lower()
    vals = (
        matched.join(index.docs, "doc_id")
        .groupBy(F.col(facet_col).alias("facet_value"))
        .agg(F.count("*").alias("facet_count"))
    )
    m = F.lower(F.col("facet_value"))
    cond = m.startswith(fq) | (F.levenshtein(m, F.lit(fq)) <= num_typos)

    def _mark_token(tok):
        hit = F.lower(tok).startswith(fq) | (
            F.levenshtein(F.lower(tok), F.lit(fq)) <= num_typos
        )
        cut = F.least(F.lit(len(fq)), F.length(tok))
        marked = F.concat(
            F.lit(start_tag),
            tok.substr(F.lit(1), cut),
            F.lit(end_tag),
            tok.substr(cut + 1, F.length(tok)),
        )
        return F.when(hit, marked).otherwise(tok)

    highlighted = F.array_join(
        F.transform(F.split(F.col("facet_value"), " ", -1), _mark_token), " "
    )
    return (
        vals.where(cond)
        .withColumn("highlighted", highlighted)
        .orderBy(F.col("facet_count").desc(), F.col("facet_value"))
        .limit(max_values)
    )


def validate_request(req: SearchRequest) -> None:
    """Reference request limits (src/collection.cpp:726-748):
    per_page ≤ 250, group_limit ≤ 99, ≤ 3 sort_by fields, page ≥ 1."""
    if req.per_page > PER_PAGE_MAX:
        raise ValueError(f"Only upto {PER_PAGE_MAX} hits can be fetched per page.")
    if req.group_limit > GROUP_LIMIT_MAX:
        raise ValueError(f"Value of group_limit must be <= {GROUP_LIMIT_MAX}.")
    if len(req.sort_by) > MAX_SORT_FIELDS:
        raise ValueError(f"Only upto {MAX_SORT_FIELDS} sort_by fields can be specified.")
    if req.page < 1 or req.per_page < 1:
        raise ValueError("page and per_page must be >= 1.")


def _grouped_curated_splice(
    index: Index,
    hydrated: DataFrame,
    matched: DataFrame,
    order: list,
    pinned: dict,
    req: SearchRequest,
) -> DataFrame:
    """Q20 under group_by: curated ids form SYNTHETIC groups (up to
    group_limit claimants per position, claim order) spliced at GROUP
    positions; organic groups exclude curated docs and rank by their
    top hit (reference merge of override_result_kvs into
    result_group_kvs, src/collection.cpp:890-922; expectations from
    test/collection_override_test.cpp PinnedHitsGrouping). Driver-side
    splice over ≤ page·per_page groups — same scale as the ungrouped
    pinned splice."""
    ids_per_pos = max(1, req.group_limit)
    by_pos: dict[int, list[int]] = {}
    for d, p in pinned.items():
        lst = by_pos.setdefault(p, [])
        if len(lst) < ids_per_pos:
            lst.append(d)
    curated = [d for lst in by_pos.values() for d in lst]
    top_groups = req.page * req.per_page

    org = hydrated.where(~F.col("doc_id").isin(curated))
    wg = Window.partitionBy(*req.group_by).orderBy(*order)
    wkey = Window.partitionBy(*req.group_by)
    gdf = (
        org.withColumn("group_rank", F.row_number().over(wg))
        .where(F.col("group_rank") <= req.group_limit)
        # group ordering key = the rank-1 member's (score, doc_id) —
        # the reference sorts groups by their top KV
        .withColumn(
            "g_score",
            F.max(F.when(F.col("group_rank") == 1, F.col("score_milli"))).over(wkey),
        )
        .withColumn(
            "g_doc",
            F.max(F.when(F.col("group_rank") == 1, F.col("doc_id"))).over(wkey),
        )
    )
    rows = (
        gdf.orderBy(F.col("g_score").desc(), F.col("g_doc").desc(), "group_rank")
        .limit((top_groups + len(by_pos)) * max(req.group_limit, 1))
        .select("doc_id", "score_milli", "group_rank", "g_score", "g_doc")
        .collect()
    )
    groups: dict[tuple, list[tuple[int, int]]] = {}
    order_keys: list[tuple] = []
    for r in rows:
        k = (r["g_score"], r["g_doc"])
        if k not in groups:
            groups[k] = []
            order_keys.append(k)
        groups[k].append((int(r["doc_id"]), int(r["score_milli"])))
    sc = {
        r["doc_id"]: int(r["score_milli"])
        for r in matched.where(F.col("doc_id").isin(curated)).collect()
    }
    queue = list(order_keys)
    remaining = dict(sorted(by_pos.items()))
    final: list[tuple[int, list[tuple[int, int]], bool]] = []
    pos = 1
    while len(final) < top_groups and (queue or remaining):
        if pos in remaining:
            members = [(d, sc.get(d, 0)) for d in remaining.pop(pos)]
            cur = True
        elif queue:
            members = groups[queue.pop(0)]
            cur = False
        else:
            members = [(d, sc.get(d, 0)) for d in remaining.pop(min(remaining))]
            cur = True
        final.append((pos, members, cur))
        pos += 1
    out_rows = [
        (gp, gr + 1, d, s, cur)
        for gp, members, cur in final[(req.page - 1) * req.per_page :]
        for gr, (d, s) in enumerate(members)
    ]
    return index.spark.createDataFrame(
        out_rows,
        schema="group_pos int, group_rank int, doc_id long, score_milli long, curated boolean",
    )


def search(index: Index, req: SearchRequest) -> SearchResult:
    validate_request(req)
    tokens, excludes = parse_query(req.q)
    docs = index.docs

    # Q20: stored override rules resolve to effective pinned/hidden;
    # under group_by, up to group_limit claimants per position survive
    # (they form synthetic curated groups — _grouped_curated_splice)
    pinned, hidden = req.pinned, req.hidden
    if req.override_store is not None:
        pinned, hidden = req.override_store.resolve(
            req.q, req.pinned, req.hidden,
            ids_per_pos=max(1, req.group_limit) if req.group_by else 1,
        )

    # Q9 keep-set, built once: reused by the final semi-join, by the
    # typo-deepening result counts (the reference counts results AFTER
    # filter intersection, src/index.cpp search_candidates), and by
    # WAND's filtered τ probes
    keep_ids = None
    if req.filter_expr or req.filter_by:
        keep = docs
        if req.filter_expr:
            keep = keep.where(req.filter_expr)
        if req.filter_by:
            from typesense_spark.search.filters import apply_filter_by

            keep = apply_filter_by(keep, req.filter_by)
        keep_ids = keep.select("doc_id")

    # WAND soundness: pruning is exact when (a) any post-search
    # narrowing is either absent or REFLECTED IN τ — attribute filters
    # are (filter-first τ probes, wand.prune_blocks), exclusion tokens
    # and hidden ids are not (fallback), (b) BM25 is the primary order
    # (an attribute sort or proximity re-rank could promote a pruned
    # doc), (c) no consumer needs the FULL matched set (facets / stats /
    # grouping / found are documented as full-set), and (d) the
    # requested page fits in the prune budget. Otherwise fall back to
    # the exhaustive plan. Under WAND, `found` is a lower bound.
    use_wand = (
        req.use_wand
        and req.mode == "or"
        and not (hidden or excludes)
        and not req.query_by_weights  # block maxima are unweighted
        and not req.sort_by
        and not req.rerank_proximity
        and not req.rank_by_text_match
        and not (req.facet_by or req.facet_stats_for or req.group_by)
        and req.page * req.per_page <= MAX_HITS
    )
    if req.query_by_weights and len(req.query_by_weights) != len(req.fields):
        raise ValueError("query_by_weights must be parallel to fields")

    if tokens == ["*"]:
        # Q10 wildcard: doc universe, scored 0, attribute-sorted.
        # Excludes still subtract ('* -tok', and the exclusion-only
        # promotion in parse_query) — reference wildcard path runs the
        # same exclusion filter as keyword search.
        matched = docs.select("doc_id", F.lit(0).cast("long").alias("score_milli"))
        matched = _apply_excludes(index, matched, excludes, req.fields)
        attempts = [["*"]]
        all_cands: dict[str, list[tuple[str, int]]] = {}
    else:
        spark_expand = _use_spark_expand(index, req.fields)
        term_df = None if spark_expand else _get_term_df(index, req.fields)
        by_score = req.rank_tokens_by == "max_score"

        def _expand(attempt: list[str]) -> dict[str, list[tuple[str, int]]]:
            if spark_expand:
                return expand_query_spark(
                    _terms_agg(index, req.fields), attempt, req.num_typos,
                    req.prefix_last, req.typo_distance,
                    rank_col="max_score" if by_score else "df",
                )
            return expand_query(
                attempt, term_df, req.num_typos, req.prefix_last, req.typo_distance,
                rank=_get_term_rank(index, req.fields) if by_score else None,
            )

        # Unindexed-token skip (reference SkipUnindexedTokensDuringPhrase-
        # Search): a token with ZERO candidates at every cost is ERASED
        # from the vector and the AND continues over the survivors
        # (src/index.cpp:1716-1726 erases from token_to_costs /
        # search_tokens / query_tokens, so the later drop-tokens
        # recursion also runs on the erased vector). Only when the
        # fallback is allowed to continue — with drop_tokens_threshold
        # <= 0 the reference aborts at the first cost-combination miss
        # (resume_typo_loop, src/index.cpp:1749-1752) and returns the
        # empty AND, which the un-erased vector reproduces below.
        raw_tokens = tokens  # synonym windows rewrite the RAW query —
        # the reference reduces synonyms at the collection layer BEFORE
        # the index-level skip (src/collection.cpp synonym reduction)
        cand0 = _expand(tokens)
        if req.drop_tokens_threshold > 0 and len(tokens) > 1:
            alive = [t for t in tokens if cand0.get(t)]
            if alive and len(alive) < len(tokens):
                tokens = alive
                cand0 = _expand(tokens)  # prefix may move to a new last token

        # Q16 drop-tokens driver loop (reference src/index.cpp:1757-1783):
        # for drop counter d = 1..n, keep tokens[:n-d] while d <= n//2
        # (right-drop), else tokens[d - n//2:] (left-drop — d reaches n
        # because the reference recurses while num_tokens_dropped < n
        # BEFORE incrementing, so 2 tokens try [t0] AND [t1]); results
        # accumulate across attempts (dedup by doc, max score); stop
        # once found >= threshold. Empty left-drops (n = 1) skipped.
        n = len(tokens)
        plan = [tokens]
        for d in range(1, n + 1):
            t = tokens[: n - d] if d <= n // 2 else tokens[d - n // 2 :]
            if t:
                plan.append(t)
        matched = None
        attempts = []
        all_cands = {}

        def _merge(acc: DataFrame | None, scored: DataFrame) -> DataFrame:
            if acc is None:
                return scored
            return (
                acc.unionByName(scored)
                .groupBy("doc_id")
                .agg(F.max("score_milli").alias("score_milli"))
            )

        def _restrict(cand: dict, c: int) -> dict:
            return {
                tok: [(t, cost) for t, cost in lst if cost <= c]
                for tok, lst in cand.items()
            }

        def _narrow_df(s: DataFrame) -> DataFrame:
            """Results as the USER sees them: excludes, filters, and
            hidden applied (the reference's deepening threshold compares
            against filtered result counts)."""
            out = _apply_excludes(index, s, excludes, req.fields)
            if keep_ids is not None:
                out = out.join(keep_ids, "doc_id", "left_semi")
            if hidden:
                out = out.where(~F.col("doc_id").isin(list(hidden)))
            return out

        for attempt in plan:
            # attempt 0 IS the (possibly erased) full vector — its
            # expansion was already computed by the skip probe above
            cand = dict(cand0) if attempt is plan[0] else _expand(attempt)
            deep_scored: DataFrame | None = None
            if req.typo_tokens_threshold is not None and req.num_typos > 0:
                # ONE probe job picks the stop level (r4 VERDICT #8; the
                # probe runs exhaustively — a WAND-pruned set is a lower
                # bound and would make the stop decision depend on the
                # optimization flag)
                lvl = _deepen_level(
                    index, attempt, cand, req.fields, req.mode,
                    req.typo_tokens_threshold, _narrow_df,
                )
                cand_l = _restrict(cand, lvl)
                if cand_l != cand:
                    cand = cand_l  # enough close matches — stop deepening
                    deep_scored = _score_tokens(
                        index, attempt, cand, req.fields, req.mode, False,
                        req.query_by_weights,
                    )
            for tok, alts in (req.synonyms or {}).items():
                if tok in cand:
                    # driver path can cheaply drop alternates absent from
                    # the dictionary; the Spark path keeps them (absent
                    # terms decode to zero postings — same result)
                    extra = [
                        (a, 0) for a in alts if term_df is None or a in term_df
                    ]
                    cand[tok] = sorted(dict(cand[tok] + extra).items())
                    deep_scored = None  # candidate map changed — rescore
            all_cands.update(cand)
            scored = (
                deep_scored
                if deep_scored is not None
                else _score_tokens(
                    index, attempt, cand, req.fields, req.mode, use_wand,
                    req.query_by_weights, keep_ids,
                )
            )
            attempts.append(attempt)
            if scored is None:
                # unsatisfiable attempt (a token with zero candidates):
                # 0 results still only falls through to the next attempt
                # when the threshold allows it — the reference's rule is
                # `results < drop_tokens_threshold` (src/index.cpp:1757),
                # so threshold ≤ 0 NEVER drops tokens, even from zero
                if req.drop_tokens_threshold <= 0:
                    break
                continue
            if scored is not None:
                matched = _merge(matched, scored)
                if attempt is plan[-1] or req.drop_tokens_threshold <= 0:
                    # no further fallback possible (last attempt), or the
                    # fallback is disabled (threshold ≤ 0 always breaks
                    # here) — either way the count probe job is pure cost
                    break
                # the fallback decision is a count job over the full
                # score plan — persist the narrow merged rows so the
                # final hits/facets actions read the materialized
                # result instead of re-running scan→decode→score
                # (the count otherwise doubles every AND query's work)
                matched = _persist_scored(matched)
                if (
                    matched.limit(req.drop_tokens_threshold).count()
                    >= req.drop_tokens_threshold
                ):
                    break

        # Q2 synonym window variants: searched UNCONDITIONALLY (not part
        # of the fallback plan — the reference always runs them), merged
        # by max score like drop-token attempts
        if req.synonym_store is not None:
            from typesense_spark.search.synonyms import synonym_reduction

            for vtoks in synonym_reduction(raw_tokens, req.synonym_store):
                vcand = _expand(vtoks)
                all_cands.update(vcand)
                vscored = _score_tokens(
                    index, vtoks, vcand, req.fields, req.mode, use_wand,
                    req.query_by_weights, keep_ids,
                )
                attempts.append(vtoks)
                if vscored is not None:
                    matched = _merge(matched, vscored)

        if matched is None:
            matched = index.spark.createDataFrame(
                [], schema="doc_id long, score_milli long"
            )
        matched = _apply_excludes(index, matched, excludes, req.fields)

    if keep_ids is not None:
        # Q9: plain WHERE on docs (Catalyst pushdown) + semi-join;
        # filter_by compiles the reference DSL to the same Column form
        matched = matched.join(keep_ids, "doc_id", "left_semi")

    if hidden:
        # Q20 hidden hits: excluded before ranking/facets
        matched = matched.where(~F.col("doc_id").isin(list(hidden)))


    # Q17-Q19 facets over the FULL matched set (not just the page)
    facets, facet_stats = {}, {}
    if req.facet_by or req.facet_stats_for:
        mdocs = matched.join(docs, "doc_id")
        for col in req.facet_by:
            facets[col] = (
                mdocs.groupBy(F.col(col).alias("facet_value"))
                .agg(F.count("*").alias("facet_count"))
                .orderBy(F.col("facet_count").desc(), F.col("facet_value"))
                .limit(req.max_facet_values)
            )
        for col in req.facet_stats_for:
            # integer-exact stats; avg as micro-quantized integer division
            # so the SQL oracle matches bit-for-bit
            facet_stats[col] = mdocs.agg(
                F.min(col).cast("long").alias("stat_min"),
                F.max(col).cast("long").alias("stat_max"),
                F.sum(col).cast("long").alias("stat_sum"),
                F.count(col).alias("stat_count"),
            ).select(
                "stat_min",
                "stat_max",
                "stat_sum",
                "stat_count",
                F.expr("stat_sum * 1000000 div stat_count").alias("stat_avg_micro"),
            )

    # Text-match-primary parity mode: packed score incl. typo-cost byte
    # as the PRIMARY ranking key (see SearchRequest.rank_by_text_match;
    # takes precedence over rerank_proximity when both are set)
    if req.rank_by_text_match and tokens != ["*"]:
        from typesense_spark.search.match import text_match_rescore

        specs = [
            # the reference's +1 length-extension cost: a matched leaf
            # longer/shorter than the query token costs one extra
            # (next_suggestion, src/index.cpp:2038-2040)
            (term, i, cost + (1 if len(term) != len(tok) else 0))
            for i, tok in enumerate(tokens)
            for term, cost in all_cands.get(tok, [])
        ]
        prox = text_match_rescore(index, matched, specs, list(req.fields))
        matched = matched.join(prox, "doc_id", "left").withColumn(
            "match_score", F.coalesce("match_score", F.lit(0)).cast("long")
        )

    # Q11 optional second stage: decode stored positions for the
    # candidate docs only, compute the packed proximity score
    if req.rerank_proximity and not req.rank_by_text_match and tokens != ["*"]:
        from typesense_spark.search.match import proximity_rescore

        # a query token is "in the dictionary" iff its expansion yielded
        # a cost-0 exact candidate — no driver dictionary needed
        prox_terms = sorted(
            {
                t
                for attempt in attempts
                for t in attempt
                if any(c == t for c, _ in all_cands.get(t, []))
            }
        )
        prox = proximity_rescore(index, matched, prox_terms, list(req.fields))
        matched = matched.join(prox, "doc_id", "left").withColumn(
            "match_score", F.coalesce("match_score", F.lit(0)).cast("long")
        )

    # ordering: proximity re-rank leads when enabled (the reference's
    # Match score is the PRIMARY relevance key, match_score.h:49-57),
    # then explicit sort_by, then score DESC, doc_id DESC (reference
    # tie-break, topster.h:254-257)
    order = []
    if req.rank_by_text_match and tokens != ["*"]:
        # Reference sort-field resolution (src/collection.cpp:708-728):
        # the user may place `_text_match` ANYWHERE in sort_by
        # (user-sort-primary: sort_by points ASC → [points asc,
        # text_match desc] — CollectionSortingTest SortingOrder); when
        # absent and fewer than 3 fields are given, text_match is
        # APPENDED; with no sort_by at all it leads and BM25 plays the
        # default_sorting_field role. Final tie = seq id DESC
        # (topster.h:254-257) — BM25 (which the reference does not
        # compute) must NOT slip between sort_by ties and the doc_id
        # tie-break, or golden orderings like ExactSearchShouldBe-
        # Stable's points-tied run diverge.
        if req.sort_by:
            keys = list(req.sort_by)
            if TEXT_MATCH_FIELD not in [c for c, _ in keys] and len(keys) < 3:
                keys.append((TEXT_MATCH_FIELD, "desc"))
            for c, d in keys:
                col = F.col("match_score") if c == TEXT_MATCH_FIELD else F.col(c)
                order.append(col.desc() if d.lower() == "desc" else col.asc())
            order.append(F.col("doc_id").desc())
        else:
            order += [
                F.col("match_score").desc(),
                F.col("score_milli").desc(),
                F.col("doc_id").desc(),
            ]
    else:
        if req.rerank_proximity and tokens != ["*"]:
            order.append(F.col("match_score").desc())
        order += [
            (F.col(c).desc() if d.lower() == "desc" else F.col(c).asc())
            for c, d in req.sort_by
            if c != TEXT_MATCH_FIELD  # wildcard / BM25 modes: score 0 or N/A
        ]
        order += [F.col("score_milli").desc(), F.col("doc_id").desc()]

    # reference exclude_fields: resolve the effective projection list
    # (include minus exclude; bare exclude = all doc columns minus it)
    include_fields = req.include_fields
    if req.exclude_fields:
        base_cols = include_fields or tuple(
            c for c in docs.columns if c not in ("doc_id", "content_sha")
        )
        include_fields = tuple(
            c for c in base_cols if c not in req.exclude_fields
        )

    hydrated = matched.join(docs, "doc_id") if (req.sort_by or include_fields or req.group_by) else matched

    grouped = None
    grouped_hits = None
    if req.group_by:
        # Q15 grouped top-k
        wg = Window.partitionBy(*req.group_by).orderBy(*order)
        grouped = (
            hydrated.withColumn("group_rank", F.row_number().over(wg))
            .where(F.col("group_rank") <= req.group_limit)
            .select(*req.group_by, "doc_id", "score_milli", "group_rank")
        )
        if pinned:
            grouped_hits = _grouped_curated_splice(
                index, hydrated, matched, order, pinned, req
            )

    # Q14/Q22: distributed top-k (TakeOrderedAndProject) then page slice
    top_n = req.page * req.per_page
    proj = ["rank", "doc_id", "score_milli", *include_fields]
    if (req.rerank_proximity or req.rank_by_text_match) and tokens != ["*"]:
        # the reference returns the packed score with every hit
        # (`text_match` in the result JSON, src/collection.cpp:713-728)
        # — surface the ranking key, not just the order it induced
        proj.insert(2, "match_score")
    if pinned:
        # Q20 pinned hits: driver-side positional splice of the (small)
        # winner list, like the reference (src/collection.cpp:897-922).
        # One curated doc per position — the FIRST claimant wins
        # (ids_per_pos = 1 ungrouped, src/collection.cpp:570-584); later
        # claimants of a taken slot are NOT curated and rank organically
        # (test/collection_override_test.cpp:472-489). OverrideStore
        # already resolves this; raw req.pinned dicts get the same rule
        # here (dict insertion order = claim order).
        by_pos: dict[int, int] = {}
        for d, p in pinned.items():
            if p not in by_pos:
                by_pos[p] = d
        winners = set(by_pos.values())
        organic = hydrated.orderBy(*order).limit(top_n + len(winners)).collect()
        scores = {r["doc_id"]: r["score_milli"] for r in organic}
        has_ms = "match_score" in proj
        mscores = (
            {r["doc_id"]: r["match_score"] for r in organic} if has_ms else {}
        )
        queue = [r["doc_id"] for r in organic if r["doc_id"] not in winners]
        final: list[tuple] = []
        pos = 1
        while len(final) < top_n and (queue or by_pos):
            if pos in by_pos:
                d, curated = by_pos.pop(pos), True
            elif queue:
                d, curated = queue.pop(0), False
            else:
                d, curated = by_pos.pop(min(by_pos)), True
            row = (pos, d, scores.get(d, 0), curated)
            if has_ms:
                row = (pos, d, mscores.get(d, 0), scores.get(d, 0), curated)
            final.append(row)
            pos += 1
        page_rows = final[(req.page - 1) * req.per_page :]
        # `curated` marks splice-pinned docs, like the reference's
        # "curated": true hit annotation (src/collection.cpp:1027)
        schema = (
            "rank int, doc_id long, match_score long, score_milli long, curated boolean"
            if has_ms
            else "rank int, doc_id long, score_milli long, curated boolean"
        )
        hits = index.spark.createDataFrame(page_rows, schema=schema)
        if include_fields:
            hits = hits.join(
                docs.select("doc_id", *include_fields), "doc_id", "left"
            )
        hits = hits.select(*proj, "curated")
    else:
        top = hydrated.orderBy(*order).limit(top_n)
        w = Window.orderBy(*order)  # ≤ page*per_page rows — driver-scale
        hits = (
            top.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") > (req.page - 1) * req.per_page)
            .select(*proj)
        )
    return SearchResult(
        hits=hits,
        matched=matched,
        facets=facets,
        facet_stats=facet_stats,
        attempts=attempts,
        grouped=grouped,
        grouped_hits=grouped_hits,
    )
