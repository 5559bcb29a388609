"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship BM25 top-10 on sf0.001.
``queries()``/``oracle_sql()`` expose the operator inventory
(SURVEY.md §2 + the training-data-pipeline suite) with DuckDB oracles.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from bugzilla_etl_spark.operators import (  # noqa: E402
    dedup,
    fulltext,
    multimodal,
    reference_ops,
    relational,
    similarity,
    textstats,
)
from bugzilla_etl_spark.session import ship_package  # noqa: E402

_MODULES = [
    relational,
    fulltext,
    dedup,
    similarity,
    textstats,
    multimodal,
    reference_ops,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10."""
    ship_package(spark)
    return fulltext.ft_bm25_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
