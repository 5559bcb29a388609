"""ES percolator as a Catalyst plan: stored Bool queries evaluated over
a docs DataFrame -> (doc_id, query_id) pairs, verified against a
brute-force Python evaluation of the same analyzed tokens. Also pins
the plan shape: no Python UDF, no exchange (map-side only)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bugzilla_etl_spark.index import Bool, percolate_df
from bugzilla_etl_spark.index.build import prepare_docs
from bugzilla_etl_spark.tokenize import py_analyze


@pytest.fixture(scope="module")
def perc_docs(spark, small_corpus):
    return prepare_docs(small_corpus, 4).select(
        "doc_id", "lang", F.col("content")
    )


@pytest.fixture(scope="module")
def perc_toks(perc_docs):
    rows = perc_docs.collect()
    return {
        r["doc_id"]: (py_analyze(r["content"], "code_v1"), r["lang"])
        for r in rows
    }


def _has_phrase(toks, seq):
    L = len(seq)
    return any(toks[i : i + L] == seq for i in range(len(toks) - L + 1))


def _ref_match(toks, lang, q: Bool) -> bool:
    ok = True
    musts = [sorted(set(py_analyze(t, "code_v1"))) for t in q.must]
    if q.operator == "and":
        needs = [len(ts) for ts in musts]
    elif q.min_should_match is not None:
        needs = [min(q.min_should_match, len(ts) + 1) for ts in musts]
    else:
        needs = [1] * len(musts)
    shoulds = sorted({t for x in q.should for t in py_analyze(x, "code_v1")})
    if not musts and not q.phrase and shoulds:
        musts, needs = [shoulds], [1]
    tset = set(toks)
    for ts, need in zip(musts, needs):
        ok &= len(tset & set(ts)) >= need
    for ph in q.phrase:
        ok &= _has_phrase(toks, py_analyze(ph, "code_v1"))
    for t in q.must_not:
        for tok in py_analyze(t, "code_v1"):
            ok &= tok not in tset
    for attr, op, val in q.filter:
        assert attr == "lang" and op == "=="
        ok &= lang == val
    return ok


QUERIES = [
    (0, Bool(must="for return", operator="and")),
    (1, Bool(must="for return int panic", min_should_match=2)),
    (2, Bool(phrase="return int")),
    (3, Bool(must="for", must_not="return")),
    (4, Bool(should="int")),
    (5, Bool(must="for", filter=(("lang", "==", "python"),))),
]


def test_percolate_matches_reference(spark, perc_docs, perc_toks):
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate_df(spark, QUERIES, perc_docs).collect()
    }
    want = {
        (d, qid)
        for d, (toks, lang) in perc_toks.items()
        for qid, q in QUERIES
        if _ref_match(toks, lang, q)
    }
    assert got == want
    # every stored query must be non-vacuous in this corpus except
    # possibly the must_not one; check broad coverage
    hit_qids = {q for _, q in got}
    assert {0, 1, 2, 4, 5} <= hit_qids


def test_percolate_plan_is_narrow(spark, perc_docs):
    df = percolate_df(spark, QUERIES, perc_docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "Exchange" not in plan  # map-side only: scales with docs


def test_percolate_empty_phrase_and_unmatchable(spark, perc_docs):
    rows = percolate_df(
        spark,
        [(0, Bool(phrase="...")), (1, Bool(must="a b c", min_should_match=9))],
        perc_docs,
    ).collect()
    assert rows == []


def test_percolate_no_queries(spark, perc_docs):
    df = percolate_df(spark, [], perc_docs)
    assert df.columns == ["doc_id", "query_id"]
    assert df.count() == 0


def test_percolate_validation(spark, perc_docs):
    with pytest.raises(ValueError, match="match decision"):
        percolate_df(
            spark,
            [(0, Bool(multi_match=("x",), mm_fields=("content",)))],
            perc_docs,
        )
    with pytest.raises(ValueError, match="slop"):
        percolate_df(spark, [(0, Bool(phrase="a b", slop=1))], perc_docs)
    with pytest.raises(ValueError, match="match_all"):
        percolate_df(spark, [(0, Bool())], perc_docs)


def test_percolate_streaming_composes(spark, perc_docs, tmp_path):
    """The percolation plan is stream-safe: the same Columns evaluate
    over a readStream source (the ES percolate-on-ingest shape)."""
    src = str(tmp_path / "stream_src")
    perc_docs.limit(50).write.parquet(src)
    stream = spark.readStream.schema(
        perc_docs.schema
    ).parquet(src)
    out = percolate_df(spark, QUERIES[:3], stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("perc_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batch = spark.sql("SELECT * FROM perc_mem").collect()
    want = percolate_df(spark, QUERIES[:3],
                        spark.read.parquet(src)).collect()
    assert {(r["doc_id"], r["query_id"]) for r in batch} == {
        (r["doc_id"], r["query_id"]) for r in want
    }


def test_percolate_query_string_entries(spark):
    """Stored queries registered as Lucene query strings parse through
    the shared grammar and lower to the same Catalyst conditions."""
    import pandas as pd

    from bugzilla_etl_spark.index import Bool, percolate_df

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "content": [
                    "alpha beta gamma",
                    "alpha delta",
                    "beta gamma delta",
                ],
            }
        )
    )
    got = (
        percolate_df(
            spark,
            [(0, '+alpha -delta'), (1, '"beta gamma"'),
             (2, Bool(must="delta"))],
            docs,
        )
        .orderBy("doc_id", "query_id")
        .collect()
    )
    pairs = [(r["doc_id"], r["query_id"]) for r in got]
    assert pairs == [(1, 0), (1, 1), (2, 2), (3, 1), (3, 2)]
    # index-dependent string features raise with the reason
    import pytest as _pytest

    with _pytest.raises(ValueError, match="dictionary"):
        percolate_df(spark, [(0, "alp*")], docs).collect()
    with _pytest.raises(ValueError, match="manifest"):
        percolate_df(spark, [(0, "lang:python")], docs).collect()
