"""Readers for the driver-generated parquet tables (TESTDATA.md) and the
engine corpus.

The reference's source layer is ten hand-written MySQL scans
(bugzilla_to_json.ktr:785-1080); here Catalyst owns pushdown/pruning and
the "scans" are parquet reads. An Iceberg reader is stubbed behind an
import-try (the jars are not in this sandbox; on a cluster
``spark.read.format("iceberg")`` engages the same DataFrame code paths).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(
    spark: SparkSession, sf_dir: str, name: str, balance: bool = False
) -> DataFrame:
    """Read one driver table. ``balance=True`` is for CPU-heavy
    consumers (tokenize/shingle/hash): a small single-file,
    single-row-group parquet is UNSPLITTABLE, so its scan is one task
    and everything fused onto it runs on one core regardless of
    cluster size (measured: the sf0.1 documents table is 0.6 MB / one
    row group — the shingled BM25 twin spent ~7 s single-threaded).
    When the split count is far below the core count, one cheap
    round-robin repartition of the raw rows restores parallelism; on
    real multi-file tables (or any input at scale) the condition never
    triggers and the plan is untouched."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if balance:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, par // 2):
            df = df.repartition(par)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_corpus_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Iceberg source for the production corpus (repo,path,commit,lang,content).

    Requires the iceberg-spark runtime jar on the cluster classpath; in
    this sandbox parquet stands in (same DataFrame surface, same
    pushdown/pruning semantics via DSv2)."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as exc:  # jar absent in sandbox
        raise NotImplementedError(
            "iceberg-spark-runtime jar not on classpath; use parquet corpus "
            "or add --packages org.apache.iceberg:iceberg-spark-runtime"
        ) from exc
