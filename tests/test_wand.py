"""Block-max WAND correctness + pruning-effectiveness (pure Python).

FIXTURES.md invariant 3: WAND-pruned top-k == exhaustive top-k,
rank-identical ids and scores, on randomized corpora with a small
alphabet (forces hot terms and score ties).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from bugzilla_etl_spark.codec import doc_id_to_u64, varint_encode
from bugzilla_etl_spark.index.wand import Block, TermCursor, wand_topk
from bugzilla_etl_spark.oracle import BM25Oracle

K1, B = 1.2, 0.75


def _cursors_from_oracle(oracle: BM25Oracle, terms, block_size=4, n_salts=1):
    """Build TermCursors straight from the oracle's postings (same
    encode path as the SPIMI encoder, including salting sub-lists)."""
    from bugzilla_etl_spark.oracle import idf as idf_fn
    from bugzilla_etl_spark.oracle import impact

    avgdl = oracle.avgdl
    cursors = []
    for t in sorted(set(terms)):
        plist = oracle.postings.get(t)
        if not plist:
            continue
        w = idf_fn(oracle.n_docs, len(plist))
        for salt in range(n_salts):
            docs = sorted(
                (d for d in plist if d % n_salts == salt),
                key=lambda d: int(doc_id_to_u64(np.array([d], dtype=np.int64))[0]),
            )
            if not docs:
                continue
            du = doc_id_to_u64(np.array(docs, dtype=np.int64))
            tf = np.array([plist[d] for d in docs], dtype=np.uint64)
            dl = np.array([oracle.doc_len[d] for d in docs], dtype=np.uint64)
            blocks = []
            for off in range(0, len(du), block_size):
                hi = min(off + block_size, len(du))
                d = du[off:hi]
                gaps = np.empty_like(d)
                gaps[0] = d[0]
                np.subtract(d[1:], d[:-1], out=gaps[1:])
                imps = [
                    impact(int(tf[j]), int(dl[j]), avgdl) for j in range(off, hi)
                ]
                blocks.append(
                    Block(
                        first=d[0],
                        last=d[-1],
                        max_impact=max(imps),
                        gaps=varint_encode(gaps),
                        tfs=varint_encode(tf[off:hi]),
                        dls=varint_encode(dl[off:hi]),
                    )
                )
            cursors.append(TermCursor(t, salt, w, blocks, K1, B, avgdl))
    return cursors


def _mk_oracle(doc_tokens: list[list[str]]) -> BM25Oracle:
    o = BM25Oracle()
    for i, toks in enumerate(doc_tokens):
        o.add(i * 7919 - 3000, " ".join(toks))  # mixed-sign doc ids
    return o


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=1, max_size=30),
        min_size=1,
        max_size=60,
    ),
    st.lists(st.sampled_from("abcdefgz"), min_size=1, max_size=4),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=3),
)
def test_wand_equals_exhaustive(doc_tokens, query_terms, k, n_salts):
    oracle = _mk_oracle(doc_tokens)
    want = oracle.search(" ".join(query_terms), k)
    cursors = _cursors_from_oracle(oracle, query_terms, block_size=4, n_salts=n_salts)
    got = wand_topk(cursors, k)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9, (gd, gs, ws)


def test_wand_actually_skips_blocks():
    """A rare high-idf term + a huge hot term: WAND must finish without
    decoding every hot-term block."""
    rng = np.random.default_rng(7)
    docs = []
    for i in range(2000):
        toks = ["hot"] * int(rng.integers(1, 6))
        if i % 100 == 1:  # rare docs sprinkled early and throughout
            toks.append("rare")
        docs.append(toks)
    oracle = _mk_oracle(docs)
    cursors = _cursors_from_oracle(oracle, ["hot", "rare"], block_size=16)
    got = wand_topk(cursors, 3)
    want = oracle.search("hot rare", 3)
    assert [d for d, _ in got] == [d for d, _ in want]
    hot_cursor = next(c for c in cursors if c.term == "hot")
    assert hot_cursor.decoded_blocks < len(hot_cursor.blocks), (
        f"decoded {hot_cursor.decoded_blocks}/{len(hot_cursor.blocks)} — no pruning"
    )


def test_wand_seeded_fuzz_vs_exhaustive():
    """High-volume seeded fuzz (small alphabet, tiny blocks, mixed salts)
    — regression for two round-1 bugs: the missing BMW GetNewCandidate
    seek cap, and bound sums rounding one ulp below theta on exact score
    ties (both found by exactly this fuzz shape)."""
    import random

    rng = random.Random(42)
    for _ in range(3000):
        n_docs = rng.randint(1, 30)
        docs = [
            [rng.choice("abcd") for _ in range(rng.randint(1, 8))]
            for _ in range(n_docs)
        ]
        oracle = _mk_oracle(docs)
        qt = [rng.choice("abcd") for _ in range(rng.randint(1, 3))]
        k = rng.randint(1, 4)
        want = oracle.search(" ".join(qt), k)
        cursors = _cursors_from_oracle(
            oracle, qt, block_size=rng.choice([1, 2, 4]), n_salts=rng.choice([1, 2])
        )
        got = wand_topk(cursors, k)
        assert [d for d, _ in got] == [d for d, _ in want], (docs, qt, k, got, want)
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9


def test_wand_zero_and_k_larger_than_results():
    oracle = _mk_oracle([["a", "b"], ["b", "c"]])
    cursors = _cursors_from_oracle(oracle, ["a"])
    got = wand_topk(cursors, 10)
    assert len(got) == 1
    assert wand_topk([], 5) == []
