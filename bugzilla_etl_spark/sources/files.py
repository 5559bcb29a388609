"""File sources/sinks from the reference's alias pipeline (SURVEY §2.1):

- S14 alias CSV scans (detect_new_aliases.ktr:89-372; 4 columns
  alias, alias_type, alias_count, bug_id);
- K3 CSV sinks with append (find_aliases.ktr:1133-1181, append=Y);
- K2 JSON-per-version debug sink (bugzilla_to_json.ktr:1431-1492) —
  the golden-output diff artifact, as ``df.write.json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType()),
        T.StructField("alias_type", T.StringType()),
        T.StructField("alias_count", T.LongType()),
        T.StructField("bug_id", T.LongType()),
    ]
)


def read_alias_csv(spark: SparkSession, path: str) -> DataFrame:
    """S14: explicit schema, no inference (prod discipline)."""
    return spark.read.csv(path, schema=ALIAS_SCHEMA, header=True, sep=";")


def write_alias_csv(df: DataFrame, path: str, append: bool = False) -> None:
    """K3: semicolon CSV, optional append (find_aliases.ktr append=Y)."""
    (
        df.select("alias", "alias_type", "alias_count", "bug_id")
        .write.mode("append" if append else "overwrite")
        .option("header", True)
        .option("sep", ";")
        .csv(path)
    )


def dump_versions_json(versions: DataFrame, path: str) -> None:
    """K2 golden-output debug sink: one JSON doc per version row
    (deterministic content thanks to the stabilize() sorts)."""
    versions.write.mode("overwrite").json(path)
