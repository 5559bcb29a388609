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


def test_corpus_tokens_agree(spark, small_corpus, small_corpus_pdf):
    got = [
        r["toks"] for r in
        small_corpus.select(spark_tokens(F.col("content")).alias("toks")).collect()
    ]
    want = [py_tokens(s) for s in small_corpus_pdf["content"]]
    # spark may reorder rows; compare as multisets of tuples
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
