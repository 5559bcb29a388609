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


def test_path_chain_four_way_parity(spark):
    """The second pattern tokenizer (path_v1 x plain/stop/shingle): all
    four implementations (python, pandas, JVM, DuckDB SQL) agree — the
    same ONE-definition contract as code_v1 (bug_version.json:4-35)."""
    import duckdb
    import pandas as pd

    from bugzilla_etl_spark.tokenize import (
        duckdb_analyze_sql,
        pandas_analyze,
        py_analyze,
        spark_analyze,
    )

    texts = [
        "Hash_Table MERGE src/io_util.py",
        "the quick if for Foo_bar2",
        "",
        "a_b c-d e.f",
        "x __ _y_",
        "if the of to and",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for chain in ("path_v1", "path_v1_stop", "path_v1_shingle"):
        py = [py_analyze(t, chain) for t in texts]
        pnd = pandas_analyze(pd.Series(texts), chain).tolist()
        jvm = [
            r["toks"]
            for r in df.select(spark_analyze(df["t"], chain).alias("toks")).collect()
        ]
        con = duckdb.connect()
        duck = [
            r[0]
            for r in con.execute(
                f"SELECT {duckdb_analyze_sql('t', chain)} FROM (SELECT unnest(?) AS t)",
                [texts],
            ).fetchall()
        ]
        assert py == pnd == jvm == duck, chain


def test_unknown_chain_rejected():
    import pytest as _pytest

    from bugzilla_etl_spark.tokenize import py_analyze

    with _pytest.raises(ValueError, match="unknown analyzer chain"):
        py_analyze("x", "word_v9")
