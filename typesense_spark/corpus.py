"""Deterministic synthetic source-code corpus generator — the
BASELINE.json ``input_hint`` table shape:
``(repo, path, commit, lang, content)``.

Every value is a pure function of (seed, row index) via a splitmix64
counter-based hash — NO stateful RNG — so the corpus is identical
regardless of partitioning, generation order, or cluster size, and the
same rows can be produced by the pure-Python oracle, a local pandas
build, or a distributed ``spark.range(n).mapInPandas`` build.

Content has controlled term skew: hot keywords (``import``, ``return``,
``def``, ``class``, ``if``) drawn with Zipf-ish weights over a ~2k-term
identifier vocabulary, plus planted rare terms (typo/prefix targets,
FIXTURES.md F1).
"""

from __future__ import annotations

import numpy as np

LANGS = ["python", "java", "go", "cpp", "js", "rust"]
EXT = {"python": "py", "java": "java", "go": "go", "cpp": "cc", "js": "js", "rust": "rs"}

HOT_TERMS = ["import", "return", "def", "class", "if"]
HOT_WEIGHT = 40  # each hot term is ~40x more likely than a vocab term
RARE_TERMS = ["zygomorphic", "kumquatify", "xylographer"]  # typo/prefix targets
VOCAB_SIZE = 2000
MIN_TOKENS, MAX_TOKENS = 40, 260

_MASK = (1 << 64) - 1


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based hash (splitmix64) — vectorized, uint64."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return z ^ (z >> np.uint64(31))


def make_vocab() -> list[str]:
    """~2k deterministic identifier-ish terms + hot + rare."""
    stems = [
        "parse", "read", "write", "buffer", "token", "index", "merge",
        "block", "hash", "tree", "node", "list", "query", "score", "doc",
        "term", "field", "shard", "batch", "codec", "pack", "scan",
        "filter", "sort", "group", "count", "cache", "store", "load",
        "json", "utf", "byte", "char", "str", "int", "float", "bool",
    ]
    vocab = []
    i = 0
    while len(vocab) < VOCAB_SIZE - len(HOT_TERMS) - len(RARE_TERMS):
        vocab.append(f"{stems[i % len(stems)]}{i // len(stems)}")
        i += 1
    return vocab + HOT_TERMS + RARE_TERMS


_VOCAB = make_vocab()

# sampling table: hot terms weighted, rare terms weight 1 but only in
# docs whose index hash selects them (planted)
_WEIGHTS = np.ones(len(_VOCAB), dtype=np.float64)
for t in HOT_TERMS:
    _WEIGHTS[_VOCAB.index(t)] = HOT_WEIGHT
for t in RARE_TERMS:
    _WEIGHTS[_VOCAB.index(t)] = 0.0  # planted explicitly, not sampled
_CUM = np.cumsum(_WEIGHTS / _WEIGHTS.sum())


def row_fields(doc_index: int, seed: int = 42) -> tuple[str, str, str, str]:
    """(repo, path, commit, lang) for one row — pure function."""
    h = int(_splitmix64(np.array([doc_index * 1315423911 + seed], dtype=np.uint64))[0])
    org = h % 7
    rep = (h >> 8) % 23
    lang = LANGS[(h >> 16) % len(LANGS)]
    d = (h >> 24) % 50
    commit = f"{_splitmix64(np.array([h], dtype=np.uint64))[0]:016x}" * 2 + f"{h & 0xFFFFFFFF:08x}"
    return (
        f"org{org}/repo{rep}",
        f"src/dir{d}/file{doc_index}.{EXT[lang]}",
        commit[:40],
        lang,
    )


def row_content(doc_index: int, seed: int = 42) -> str:
    """Deterministic content for one row (shared with the oracle)."""
    base = np.uint64((doc_index * 0x5851F42D4C957F2D + seed) & _MASK)
    n_h = int(_splitmix64(np.array([base], dtype=np.uint64))[0])
    n_tokens = MIN_TOKENS + n_h % (MAX_TOKENS - MIN_TOKENS)
    ctr = base + np.uint64(1) + np.arange(n_tokens, dtype=np.uint64)
    u = _splitmix64(ctr).astype(np.float64) / float(_MASK)
    idx = np.searchsorted(_CUM, u, side="right")
    idx = np.minimum(idx, len(_VOCAB) - 1)
    toks = [_VOCAB[i] for i in idx]
    # plant rare terms in ~1/50 docs at position 3
    if n_h % 50 == 7 and n_tokens > 4:
        toks[3] = RARE_TERMS[n_h % len(RARE_TERMS)]
    # newline every 12 tokens (exercises the [ \n] split spec)
    parts = []
    for j, t in enumerate(toks):
        parts.append(t)
        parts.append("\n" if (j + 1) % 12 == 0 else " ")
    return "".join(parts[:-1])


def generate_rows(n: int, seed: int = 42, start: int = 0) -> list[tuple]:
    """Rows [start, start+n): (repo, path, commit, lang, content)."""
    out = []
    for i in range(start, start + n):
        repo, path, commit, lang = row_fields(i, seed)
        out.append((repo, path, commit, lang, row_content(i, seed)))
    return out


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def corpus_df(spark, n: int, seed: int = 42, partitions: int = 32):
    """Distributed generation: spark.range(n) → mapInPandas.

    Partition-count invariant by construction (row i depends only on
    (seed, i)); scales to any n without driver materialization.
    """
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            rows = [
                (*row_fields(int(i), seed), row_content(int(i), seed))
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(0, n, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )
