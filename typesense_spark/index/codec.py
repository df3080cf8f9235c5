"""Posting-block codec: delta + varint (PForDelta-flavoured), numpy-vectorized.

Plays the role of the reference's Frame-of-Reference bit-packed posting
arrays (``/root/reference/src/sorted_array.cpp:5-69``,
``include/array_base.h:10-45``) — but append-only batch (SURVEY.md §2.2
B10: "our build is append-only batch, so no re-encode path").

Layout per block (all little-endian varint streams):

- ``ids_bin``      first doc_id raw, then deltas-1 of the ascending rest
- ``tfs_bin``      term frequencies, varint
- ``contribs_bin`` quantized BM25 contribution (int64 milli) per doc
- ``pos_bin``      optional positions: per doc, varint count then
                   delta-encoded positions (reference analogue:
                   offset_index + offsets, ``include/art.h:88-92``)

Encoding is vectorized with numpy (no per-row Python in the Spark plan:
this runs inside Arrow-batched ``applyInPandas``).
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 numpy array, vectorized.

    Fast paths for the dominant cases (every value 1 byte; mixed 1-2
    bytes — position deltas / tfs / small ids), then a generic
    byte-plane interleave — O(total_bytes) numpy work, no Python loop
    over values."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    vmax = int(v.max())
    if vmax < 0x80:
        return v.astype(np.uint8).tobytes()
    if vmax < 0x4000:
        two = v >= np.uint64(0x80)
        sizes = two.astype(np.int64) + 1
        starts = np.zeros(v.size, dtype=np.int64)
        np.cumsum(sizes[:-1], out=starts[1:])
        out = np.empty(int(starts[-1]) + int(sizes[-1]), dtype=np.uint8)
        first = (v & np.uint64(0x7F)).astype(np.uint8)
        first[two] |= np.uint8(0x80)
        out[starts] = first
        out[starts[two] + 1] = (v[two] >> np.uint64(7)).astype(np.uint8)
        return out.tobytes()
    nbytes = _varint_sizes(v)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    # offsets of each value's first byte
    starts = np.zeros(v.size, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    max_b = int(nbytes.max())
    for plane in range(max_b):
        sel = nbytes > plane
        idx = starts[sel] + plane
        chunk = (v[sel] >> np.uint64(7 * plane)) & np.uint64(0x7F)
        cont = (nbytes[sel] - 1) > plane
        out[idx] = chunk.astype(np.uint8) | (cont.astype(np.uint8) << 7)
    return out.tobytes()


def varint_decode(buf: bytes, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 stream → uint64 array, vectorized."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (raw & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    n = ends.size
    vals = np.zeros(n, dtype=np.uint64)
    lens = ends - starts + 1
    max_b = int(lens.max())
    for plane in range(max_b):
        sel = lens > plane
        b = raw[starts[sel] + plane].astype(np.uint64) & np.uint64(0x7F)
        vals[sel] |= b << np.uint64(7 * plane)
    if count is not None and n != count:
        raise ValueError(f"varint stream held {n} values, expected {count}")
    return vals


def _varint_sizes(v: np.ndarray) -> np.ndarray:
    """LEB128 byte count per value: 1 + one comparison per 7-bit
    threshold actually reached (no repeated shift/copy passes)."""
    sizes = np.ones(v.shape, dtype=np.int64)
    vmax = int(v.max()) if v.size else 0
    for shift in range(7, 64, 7):
        if vmax < (1 << shift):
            break
        sizes += v >= np.uint64(1 << shift)
    return sizes


def varint_encode_split(values: np.ndarray, row_value_counts: np.ndarray) -> list[bytes]:
    """Encode one flat value stream, then slice it into per-row byte
    strings (one numpy encode for a whole Arrow batch instead of one
    per row — the map-side position packer's hot path)."""
    buf, offsets = varint_encode_offsets(values, row_value_counts)
    return [buf[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def varint_encode_offsets(
    values: np.ndarray, row_value_counts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Encode one flat value stream and return ``(buffer, row_offsets)``
    where row i's bytes are ``buffer[row_offsets[i]:row_offsets[i+1]]``.

    The offsets form feeds an Arrow BinaryArray directly
    (``pa.Array.from_buffers``), so a 10M-row batch never materializes
    10M Python ``bytes`` objects — the r6 fix for the pack/tokenize
    mappers' last per-row Python loop."""
    v = np.asarray(values, dtype=np.uint64)
    counts = np.asarray(row_value_counts, dtype=np.int64)
    offsets = np.zeros(counts.size + 1, dtype=np.int64)
    if v.size == 0:
        return b"", offsets
    buf = varint_encode(v)
    byte_ends = np.cumsum(_varint_sizes(v))
    ve = np.cumsum(counts)  # value end index per row (inclusive count)
    # row end byte = byte_ends[last value index of the row]; an empty
    # row shares its predecessor's end (ve unchanged ⇒ zero-length
    # slice); rows before the first value end at 0
    offsets[1:] = np.where(ve > 0, byte_ends[np.maximum(ve, 1) - 1], 0)
    return buf, offsets


def segmented_delta_decode(deltas: np.ndarray, seg_sizes: np.ndarray) -> np.ndarray:
    """Concatenated per-segment ``[first, gap-1, gap-1, ...]`` id streams
    → absolute ids, vectorized across ALL segments at once (one cumsum +
    one repeat — no per-segment Python loop). The inverse of what the
    pack stage writes per block; the query-side batch decoder feeds it
    the whole Arrow batch's id stream with ``seg_sizes = n_docs`` per
    block."""
    d = np.asarray(deltas, dtype=np.uint64)
    sizes = np.asarray(seg_sizes, dtype=np.int64)
    if d.size == 0:
        return d
    if sizes.min() <= 0:
        raise ValueError("segments must be non-empty")
    starts = np.zeros(d.size, dtype=bool)
    starts[0] = True
    starts[np.cumsum(sizes)[:-1]] = True
    adj = d.copy()
    adj[~starts] += np.uint64(1)
    cs = np.cumsum(adj, dtype=np.uint64)
    start_idx = np.flatnonzero(starts)
    base = cs[start_idx] - adj[start_idx]
    return cs - np.repeat(base, sizes)


def segmented_cumsum(vals: np.ndarray, seg_sizes: np.ndarray) -> np.ndarray:
    """Per-segment cumulative sum over one flat value stream — the
    position-stream decode (``[first, diff, diff, ...]`` per doc),
    vectorized across every doc of an Arrow batch."""
    v = np.asarray(vals, dtype=np.uint64)
    sizes = np.asarray(seg_sizes, dtype=np.int64)
    if v.size == 0:
        return v
    if sizes.min() <= 0:
        raise ValueError("segments must be non-empty")
    cs = np.cumsum(v, dtype=np.uint64)
    start_idx = np.zeros(sizes.size, dtype=np.int64)
    np.cumsum(sizes[:-1], out=start_idx[1:])
    base = cs[start_idx] - v[start_idx]
    return cs - np.repeat(base, sizes)


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Strictly-ascending ids → [first, gap-1, gap-1, ...] (uint64)."""
    ids = np.asarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    out = np.empty_like(ids)
    out[0] = ids[0]
    out[1:] = np.diff(ids) - np.uint64(1)
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    d = np.asarray(deltas, dtype=np.uint64)
    if d.size == 0:
        return d
    out = d.copy()
    out[1:] += np.uint64(1)
    return np.cumsum(out, dtype=np.uint64)


def pack_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    contribs: np.ndarray,
    positions: list[np.ndarray] | None = None,
) -> tuple[bytes, bytes, bytes, bytes]:
    """Pack one block (ascending doc_ids) → (ids_bin, tfs_bin, contribs_bin, pos_bin)."""
    ids_bin = varint_encode(delta_encode(doc_ids))
    tfs_bin = varint_encode(np.asarray(tfs, dtype=np.uint64))
    contribs_bin = varint_encode(np.asarray(contribs, dtype=np.uint64))
    if positions is None:
        pos_bin = b""
    else:
        stream: list[np.ndarray] = []
        for p in positions:
            p = np.asarray(p, dtype=np.uint64)
            rec = np.empty(p.size + 1, dtype=np.uint64)
            rec[0] = p.size
            if p.size:
                rec[1] = p[0]
                rec[2:] = np.diff(p)
            stream.append(rec)
        pos_bin = varint_encode(np.concatenate(stream) if stream else np.empty(0, np.uint64))
    return ids_bin, tfs_bin, contribs_bin, pos_bin


def unpack_block(
    ids_bin: bytes,
    tfs_bin: bytes,
    contribs_bin: bytes,
    pos_bin: bytes = b"",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[np.ndarray] | None]:
    doc_ids = delta_decode(varint_decode(ids_bin))
    tfs = varint_decode(tfs_bin, count=doc_ids.size)
    contribs = varint_decode(contribs_bin, count=doc_ids.size)
    positions: list[np.ndarray] | None = None
    if pos_bin:
        flat = varint_decode(pos_bin)
        positions = []
        i = 0
        for _ in range(doc_ids.size):
            cnt = int(flat[i])
            i += 1
            rec = flat[i : i + cnt]
            positions.append(np.cumsum(rec, dtype=np.uint64))
            i += cnt
        if i != flat.size:
            raise ValueError("position stream length mismatch")
    return doc_ids, tfs, contribs, positions
