"""Delta + LEB128-varint posting-list codec (pure numpy, vectorized).

The on-disk posting format of the engine (SURVEY.md §1.3): doc_ids are
sorted ascending, delta-encoded (first value absolute), each delta written
as a little-endian base-128 varint (LEB128: 7 payload bits per byte, high
bit = continuation). Term frequencies are varint-encoded without deltas.

Golden vector (FIXTURES.md §4): ``[3, 7, 260]`` -> deltas ``[3, 4, 253]``
-> bytes ``03 04 FD 01``.

Everything here is uint64-safe and vectorized: encode is O(10) numpy
passes (one per possible varint byte position), decode is O(1) numpy
passes using ``np.add.reduceat`` over continuation-bit segments. No
per-element Python loops — these kernels run inside Arrow-batched pandas
UDFs on the executor hot path (BASELINE.json ``input_hint``: "no per-row
Python").
"""

from __future__ import annotations

import numpy as np

_U64_7 = np.uint64(7)
_U64_0x7F = np.uint64(0x7F)


def _varint_encode_arr(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Core LEB128 encoder -> (uint8 buffer, bytes-per-value array)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbytes = np.ones(n, dtype=np.int64)
    tmp = v >> _U64_7
    while True:
        nz = tmp != 0
        if not nz.any():
            break
        nbytes[nz] += 1
        tmp = tmp >> _U64_7
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(nbytes[:-1], out=starts[1:])
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    cur = v.copy()
    max_b = int(nbytes.max())
    for i in range(max_b):
        active = nbytes > i
        if not active.any():
            break
        payload = (cur[active] & _U64_0x7F).astype(np.uint8)
        more = (nbytes[active] > i + 1).astype(np.uint8) << 7
        out[starts[active] + i] = payload | more
        cur[active] = cur[active] >> _U64_7
    return out, nbytes


def encode_varint(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative integers (uint64 range)."""
    buf, _ = _varint_encode_arr(values)
    return buf.tobytes()


def encode_varint_grouped(
    values: np.ndarray, group_starts: np.ndarray
) -> list[bytes]:
    """Encode MANY groups in one vectorized pass -> one blob per group.

    ``group_starts`` are row offsets of each group within ``values``
    (strictly increasing, first element 0). The whole array is encoded
    once; per-group blobs are byte-slices of the shared buffer. This is
    what makes the streaming index builder O(vectorized passes) instead of
    O(one pandas UDF call per posting list).
    """
    buf, nbytes = _varint_encode_arr(values)
    if nbytes.size == 0:
        return [b"" for _ in range(len(group_starts))]
    gs = np.asarray(group_starts, dtype=np.int64)
    glens = np.add.reduceat(nbytes, gs)
    ends = np.cumsum(glens)
    starts = ends - glens
    return [buf[s:e].tobytes() for s, e in zip(starts, ends)]


def delta_encode_grouped(
    sorted_values: np.ndarray, group_starts: np.ndarray
) -> np.ndarray:
    """Per-group delta encoding (first of each group absolute), vectorized."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    out[group_starts] = v[group_starts]
    return out


def decode_varint(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (inverse of encode)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    if b[-1] & 0x80:
        raise ValueError("truncated varint stream: last byte has continuation bit")
    is_end = (b & 0x80) == 0
    ends = np.nonzero(is_end)[0]
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    payload = (b & 0x7F).astype(np.uint64)
    # shift[i] = 7 * (position within its varint)
    pos_in_group = np.arange(b.size, dtype=np.int64) - np.repeat(
        starts, ends - starts + 1
    )
    shifted = payload << (pos_in_group.astype(np.uint64) * _U64_7)
    return np.add.reduceat(shifted, starts)


def delta_encode(sorted_values: np.ndarray) -> np.ndarray:
    """Deltas with the first element absolute; input must be sorted asc."""
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0]
    np.subtract(v[1:], v[:-1], out=out[1:])
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    """Inverse of :func:`delta_encode` (cumulative sum)."""
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    return np.cumsum(d, dtype=np.uint64)


def encode_postings(doc_ids: np.ndarray) -> bytes:
    """Sorted doc_ids -> delta+varint blob."""
    return encode_varint(delta_encode(doc_ids))


def decode_postings(buf: bytes) -> np.ndarray:
    """delta+varint blob -> sorted doc_ids."""
    return delta_decode(decode_varint(buf))
