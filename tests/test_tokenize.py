"""All four analyzer implementations must agree token-for-token."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from bugzilla_etl_spark.tokenize import (
    duckdb_tokens_sql,
    pandas_tokens,
    py_tokens,
    spark_tokens,
)

SAMPLES = [
    "def foo(bar): return bar + 1  # comment",
    "int main() { printf(\"%d\\n\", x_1); }",
    "UPPER lower MiXeD_case__ 123abc",
    "",
    "...",
    "a",
    "fn call::path -> Vec<u8>; let x = y == z;",
]


def test_python_vs_pandas():
    got = pandas_tokens(pd.Series(SAMPLES)).tolist()
    want = [py_tokens(s) for s in SAMPLES]
    assert got == want


def test_python_vs_spark(spark):
    df = spark.createDataFrame(pd.DataFrame({"content": SAMPLES}))
    got = [
        r["toks"] for r in
        df.select(spark_tokens(F.col("content")).alias("toks")).collect()
    ]
    want = [py_tokens(s) for s in SAMPLES]
    assert got == want


def test_python_vs_duckdb():
    con = duckdb.connect()
    frame = pd.DataFrame({"content": SAMPLES})
    con.register("t", frame)
    got = con.sql(f"select {duckdb_tokens_sql('content')} as toks from t").df()["toks"]
    want = [py_tokens(s) for s in SAMPLES]
    assert [list(x) for x in got] == want


def test_analyzer_chains_four_way_parity(spark):
    """stop / shingle chains: all four implementations agree token-for-
    token, including stopword edge cases and <2-token shingle inputs."""
    from bugzilla_etl_spark.tokenize import (
        ANALYZER_CHAINS,
        duckdb_analyze_sql,
        pandas_analyze,
        py_analyze,
        spark_analyze,
    )

    samples = SAMPLES + [
        "the quick brown fox and the lazy dog",
        "a an and are",            # all stopwords -> empty after filter
        "the x",                   # single survivor -> no bigrams
        "hash table merge the index for a query",
    ]
    pdf = pd.DataFrame({"content": samples})
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("t", pdf)
    for chain in ANALYZER_CHAINS:
        want = [py_analyze(s, chain) for s in samples]
        assert list(pandas_analyze(pd.Series(samples), chain)) == want, chain
        got_sp = [
            r[0] for r in df.select(spark_analyze(F.col("content"), chain)).collect()
        ]
        assert got_sp == want, chain
        got_dk = con.sql(
            f"select {duckdb_analyze_sql('content', chain)} as toks from t"
        ).df()["toks"]
        assert [list(x) for x in got_dk] == want, chain


def test_corpus_tokens_agree(spark, small_corpus, small_corpus_pdf):
    got = [
        r["toks"] for r in
        small_corpus.select(spark_tokens(F.col("content")).alias("toks")).collect()
    ]
    want = [py_tokens(s) for s in small_corpus_pdf["content"]]
    # spark may reorder rows; compare as multisets of tuples
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
