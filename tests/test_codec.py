"""Posting-block codec round-trips (reference analogue:
test/sorted_array_test.cpp FOR append/decode)."""

import numpy as np
import pytest

from typesense_spark.index.codec import (
    delta_decode,
    delta_encode,
    pack_block,
    unpack_block,
    varint_decode,
    varint_encode,
)


def test_varint_edges():
    v = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32 - 1, 2**63], dtype=np.uint64)
    assert (varint_decode(varint_encode(v)) == v).all()


def test_varint_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_delta_roundtrip():
    ids = np.array([0, 1, 5, 6, 1000, 10**9], dtype=np.uint64)
    assert (delta_decode(delta_encode(ids)) == ids).all()


@pytest.mark.parametrize("trial", range(10))
def test_block_roundtrip_random(trial):
    rng = np.random.default_rng(trial)
    ids = np.unique(rng.integers(0, 10**12, size=rng.integers(1, 600)))
    tfs = rng.integers(1, 500, size=ids.size)
    con = rng.integers(0, 10**8, size=ids.size)
    pos = [
        np.sort(rng.choice(100_000, size=rng.integers(0, 12), replace=False))
        for _ in ids
    ]
    i2, t2, c2, p2 = unpack_block(*pack_block(ids, tfs, con, pos))
    assert (i2 == ids).all() and (t2 == tfs).all() and (c2 == con).all()
    for a, b in zip(pos, p2):
        assert (a == b).all()


def test_block_without_positions():
    ids = np.array([3, 9, 27], dtype=np.uint64)
    b = pack_block(ids, ids, ids, None)
    assert b[3] == b""
    i2, t2, c2, p2 = unpack_block(*b)
    assert (i2 == ids).all() and p2 is None


def test_compression_is_compact():
    # dense ascending ids → ~1 byte/doc after delta+varint
    ids = np.arange(10_000, dtype=np.uint64) * 3
    tfs = np.ones(ids.size, dtype=np.uint64)
    con = np.full(ids.size, 100, dtype=np.uint64)
    ids_bin, _, _, _ = pack_block(ids, tfs, con, None)
    assert len(ids_bin) < ids.size * 2
