"""Codec unit + property tests (FIXTURES.md §4, SURVEY.md §5.3 item 3)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkfts.codec import (
    decode_postings,
    decode_varint,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_varint,
)


def test_golden_vector():
    # FIXTURES.md §4: [3, 7, 260] -> deltas [3, 4, 253] -> 03 04 FD 01
    ids = np.array([3, 7, 260], dtype=np.uint64)
    deltas = delta_encode(ids)
    assert deltas.tolist() == [3, 4, 253]
    blob = encode_varint(deltas)
    assert blob == bytes([0x03, 0x04, 0xFD, 0x01])
    assert decode_postings(blob).tolist() == [3, 7, 260]


def test_empty_and_single():
    assert encode_postings(np.array([], dtype=np.uint64)) == b""
    assert decode_postings(b"").tolist() == []
    assert decode_postings(encode_postings(np.array([0], dtype=np.uint64))).tolist() == [0]
    assert decode_varint(encode_varint(np.array([0], dtype=np.uint64))).tolist() == [0]


def test_max_values():
    big = np.array([0, 1, 2**63 - 1, 2**64 - 1], dtype=np.uint64)
    assert decode_varint(encode_varint(big)).tolist() == big.tolist()
    # max-gap posting list round-trips through delta
    ids = np.array([0, 2**63, 2**64 - 1], dtype=np.uint64)
    assert decode_postings(encode_postings(ids)).tolist() == ids.tolist()


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert decode_varint(encode_varint(arr)).tolist() == values


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**62), max_size=500, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_postings_roundtrip_sorted(values):
    arr = np.sort(np.array(values, dtype=np.uint64))
    out = decode_postings(encode_postings(arr))
    assert out.tolist() == arr.tolist()


def test_delta_requires_sorted_semantics():
    ids = np.arange(0, 100_000, 7, dtype=np.uint64)
    assert delta_decode(delta_encode(ids)).tolist() == ids.tolist()


def test_compression_wins_on_dense_lists():
    ids = np.arange(1_000_000, 1_010_000, dtype=np.uint64)  # dense: deltas=1
    blob = encode_postings(ids)
    assert len(blob) < ids.size * 2  # ~1 byte/posting + header delta
