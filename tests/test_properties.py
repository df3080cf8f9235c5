"""Property-based tests (hypothesis): codec round-trips on arbitrary
inputs, tokenizer invariants, scoring quantization monotonicity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from typesense_spark import scoring
from typesense_spark.index.codec import (
    pack_block,
    unpack_block,
    varint_decode,
    varint_encode,
    varint_encode_split,
)
from typesense_spark.tokenizer import tokenize


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_any(values):
    v = np.array(values, dtype=np.uint64)
    assert varint_decode(varint_encode(v)).tolist() == values


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200, unique=True),
    st.data(),
)
@settings(max_examples=100, deadline=None)
def test_block_roundtrip_any(ids, data):
    ids = np.array(sorted(ids), dtype=np.uint64)
    n = ids.size
    tfs = np.array(data.draw(st.lists(st.integers(1, 10**6), min_size=n, max_size=n)), dtype=np.uint64)
    con = np.array(data.draw(st.lists(st.integers(0, 10**9), min_size=n, max_size=n)), dtype=np.uint64)
    i2, t2, c2, _ = unpack_block(*pack_block(ids, tfs, con, None))
    assert (i2 == ids).all() and (t2 == tfs).all() and (c2 == con).all()


@given(st.lists(st.lists(st.integers(0, 2**30), max_size=20), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_varint_split_concat_identity(rows):
    flat = np.array([x for r in rows for x in r], dtype=np.uint64)
    counts = np.array([len(r) for r in rows], dtype=np.int64)
    parts = varint_encode_split(flat, counts)
    assert len(parts) == len(rows)
    # concatenation of per-row slices decodes to the original stream
    assert varint_decode(b"".join(parts)).tolist() == flat.tolist()
    for part, row in zip(parts, rows):
        assert varint_decode(part).tolist() == row


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_tokenizer_invariants(text):
    import unicodedata

    toks = tokenize(text)
    raw_count = len(text.split(" ")) if text else 0
    for term, pos in toks:
        assert term  # never empty
        for c in term:
            if c.isascii():
                # ASCII content is always lowered alnum
                assert c.isalnum() and c == c.lower()
            else:
                # passthrough branch (reference keeps unmappable bytes,
                # src/tokenizer.cpp:79-81): must be a letter/number/mark
                # with NO ASCII NFKD projection, case PRESERVED verbatim
                folded = unicodedata.normalize("NFKD", c)
                assert not any(f.isascii() for f in folded)
                assert unicodedata.category(c)[0] in ("L", "N", "M")
        assert 0 <= pos
    positions = [p for _, p in toks]
    assert positions == sorted(positions)


@given(
    st.integers(1, 10**6),  # tf
    st.integers(1, 10**4),  # dl
    st.integers(1, 10**6),  # df
    st.integers(1, 10**9),  # N (>= df enforced below)
)
@settings(max_examples=300, deadline=None)
def test_contrib_quantization_sane(tf, dl, df, n):
    n = max(n, df)
    avgdl = max(dl / 2, 1.0)
    c = scoring.contrib_milli(tf, dl, df, n, avgdl)
    assert c >= 0
    # monotone in tf (same doc, more occurrences never scores lower)
    c2 = scoring.contrib_milli(tf + 1, dl, df, n, avgdl)
    assert c2 >= c
