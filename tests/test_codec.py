"""Codec round-trip tests (FIXTURES.md invariant 2), incl. property-based."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bugzilla_etl_spark.codec import (
    decode_sorted_docs,
    delta_decode,
    delta_encode,
    doc_id_to_u64,
    encode_sorted_docs,
    u64_to_doc_id,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**31, 2**32, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    assert np.array_equal(varint_decode(varint_encode(vals)), vals)


def test_varint_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@settings(max_examples=50, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_sorted_docs_roundtrip_property(vals):
    arr = np.array(sorted(vals), dtype=np.uint64)
    assert np.array_equal(decode_sorted_docs(encode_sorted_docs(arr)), arr)


def test_delta_roundtrip():
    arr = np.array([5, 5, 9, 100, 2**40], dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_doc_id_bijection():
    ids = np.array([-(2**63), -1, 0, 1, 2**63 - 1], dtype=np.int64)
    assert np.array_equal(u64_to_doc_id(doc_id_to_u64(ids)), ids)
    # int64 order and u64 order differ, but the mapping is monotone within sign
    u = doc_id_to_u64(ids)
    assert u.dtype == np.uint64


def test_levenshtein_matches_duckdb():
    """The fuzzy-expansion DP must agree with DuckDB's levenshtein()
    (the gate oracle's function): 300 seeded random pairs, plus the
    capped early-out form agreeing on threshold membership."""
    import random

    import duckdb

    from bugzilla_etl_spark.index.query import _levenshtein

    con = duckdb.connect(":memory:")
    rng = random.Random(5)
    for _ in range(300):
        a = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
        b = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
        want = con.sql(f"select levenshtein('{a}','{b}')").fetchone()[0]
        assert _levenshtein(a, b, 10) == want, (a, b)
        for cap in (0, 1, 2):
            assert (_levenshtein(a, b, cap) <= cap) == (want <= cap), (a, b, cap)
    con.close()
