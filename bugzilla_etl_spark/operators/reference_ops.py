"""Reference-lifecycle operators exposed on the driver tables:
schema-inference scan (S11) and the history-replay fold (§2.7) driven
by a synthesized change-event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .replay import replay_history

EXCLUDED_COLUMNS = ["l_comment"]  # the BUGS_TABLE_COLUMNS exclusion-list analog


def s11_schema_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11 schema-inference scan: INFORMATION_SCHEMA.COLUMNS minus a
    fixed exclusion list, injected into downstream SQL as a variable
    (get_bugs_table_columns.ktr:152-156 -> ${BUGS_TABLE_COLUMNS}).
    Spark-side: plan-build-time ``df.columns`` introspection."""
    cols = [
        c
        for c in load_table(spark, sf_dir, "lineitem").columns
        if c not in EXCLUDED_COLUMNS
    ]
    out = spark.createDataFrame([(c,) for c in sorted(cols)], "column_name string")
    return out.withColumn(
        "columns_csv", F.lit(",".join(sorted(cols)))  # the ${VARIABLE} payload
    )


ORACLE_S11 = """
WITH cols AS (
  SELECT column_name FROM information_schema.columns
  WHERE table_name = 'lineitem' AND column_name NOT IN ('l_comment')
)
SELECT column_name,
       (SELECT string_agg(column_name, ',' ORDER BY column_name) FROM cols) AS columns_csv
FROM cols ORDER BY column_name
"""


def replay_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 history replay over a change-event stream synthesized from
    ``events``: each event is a scalar field change (field = event_type),
    grouped per user, reverse-replayed and re-emitted as SCD2 versions
    with expires_on chaining. The scalar validity-interval slice is
    SQL-checkable; the full nested-state output is exercised in pytest
    (tests/test_replay.py)."""
    ev = load_table(spark, sf_dir, "events")
    eav = ev.select(
        F.col("user_id").alias("bug_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("modified_ts"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("modified_by"),
        F.col("event_type").alias("field_name"),
        F.round("value", 2).cast("string").alias("field_value"),
        F.lit(None).cast("string").alias("field_value_removed"),
        F.lit(None).cast("long").alias("attach_id"),
        F.lit(9).cast("long").alias("_merge_order"),
    )
    versions = replay_history(eav)
    return versions.select(
        F.col("bug_id").alias("user_id"),
        F.col("bug_version_num").alias("version_num"),
        "modified_ts",
        "expires_on",
    ).filter(F.col("user_id") < 200)


ORACLE_REPLAY = """
WITH v AS (
  SELECT DISTINCT user_id, epoch_ms(ts) AS modified_ts FROM events
),
numbered AS (
  SELECT user_id, modified_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY modified_ts) AS version_num
  FROM v
)
SELECT user_id, version_num, modified_ts,
       coalesce(lead(modified_ts) OVER (PARTITION BY user_id ORDER BY modified_ts),
                9999999999000) AS expires_on
FROM numbered WHERE user_id < 200
"""


def p10_date_reformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 date reformatting surface (parse_bug_history.js:447-473),
    relationally: slash-date render, day render, epoch-ms string — the
    same three shapes the replay UDF normalizes."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return (
        ev.filter(F.col("event_id") < 500)
        .select(
            "event_id",
            F.date_format(ts, "yyyy-MM-dd").alias("day"),
            F.date_format(ts, "yyyy/MM/dd HH:mm:ss").alias("slash_dt"),
            F.unix_millis(ts).cast("string").alias("epoch_ms_str"),
            F.nullif(F.lit(""), F.lit("")).alias("empty_to_null"),
        )
    )


ORACLE_P10 = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS day,
       strftime(ts, '%Y/%m/%d %H:%M:%S') AS slash_dt,
       CAST(epoch_ms(ts) AS VARCHAR) AS epoch_ms_str,
       CAST(NULL AS VARCHAR) AS empty_to_null
FROM events WHERE event_id < 500
"""


QUERIES = {
    "s11_schema_inference": s11_schema_inference,
    "replay_versions": replay_versions,
    "p10_date_reformat": p10_date_reformat,
}

ORACLE = {
    "s11_schema_inference": ORACLE_S11,
    "replay_versions": ORACLE_REPLAY,
    "p10_date_reformat": ORACLE_P10,
}
