"""Reference-lifecycle operators exposed on the driver tables:
schema-inference scan (S11) and the history-replay fold (§2.7) driven
by a synthesized change-event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .replay import replay_history, versions_asof

EXCLUDED_COLUMNS = ["l_comment"]  # the BUGS_TABLE_COLUMNS exclusion-list analog

#: mid-corpus point-in-time: 2024-01-15T00:00:00Z (events span Jan 2024)
ASOF_TS = 1_705_276_800_000


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


def _events_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").alias("bug_id"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("modified_ts"),
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("modified_by"),
        F.col("event_type").alias("field_name"),
        F.round("value", 2).cast("string").alias("field_value"),
        F.lit(None).cast("string").alias("field_value_removed"),
        F.lit(None).cast("long").alias("attach_id"),
        F.lit(9).cast("long").alias("_merge_order"),
    )


def replay_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 history replay over a change-event stream synthesized from
    ``events``: each event is a scalar field change (field = event_type),
    grouped per user, reverse-replayed and re-emitted as SCD2 versions
    with expires_on chaining. The scalar validity-interval slice is
    SQL-checkable; the full nested-state output is exercised in pytest
    (tests/test_replay.py)."""
    versions = replay_history(_events_eav(spark, sf_dir))
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


def replay_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) query over validity intervals: the version
    of each entity active at ASOF_TS — the reference's query-side
    temporal filter ``modified_ts <= T < expires_on``
    (parse_bug_history.js:356-364; sentinel bug_version.json:221-224)."""
    versions = replay_history(_events_eav(spark, sf_dir))
    return versions_asof(versions, ASOF_TS).select(
        F.col("bug_id").alias("user_id"),
        F.col("bug_version_num").alias("version_num"),
        "modified_ts",
        "expires_on",
    ).filter(F.col("user_id") < 200)


ORACLE_ASOF = f"""
WITH v AS (
  SELECT DISTINCT user_id, epoch_ms(ts) AS modified_ts FROM events
),
numbered AS (
  SELECT user_id, modified_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY modified_ts) AS version_num,
         coalesce(lead(modified_ts) OVER (PARTITION BY user_id ORDER BY modified_ts),
                  9999999999000) AS expires_on
  FROM v
)
SELECT user_id, version_num, modified_ts, expires_on
FROM numbered
WHERE user_id < 200 AND modified_ts <= {ASOF_TS} AND expires_on > {ASOF_TS}
"""


def replay_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END_TIME-bounded replay (bugzilla_to_json.ktr:17-21,
    parse_bug_history.js:72-75, bin/rewind.sh): deltas after ASOF_TS are
    ignored, reproducing the exact historical version chain — the last
    surviving version stays open (sentinel expires_on)."""
    versions = replay_history(_events_eav(spark, sf_dir), end_time=ASOF_TS)
    return versions.select(
        F.col("bug_id").alias("user_id"),
        F.col("bug_version_num").alias("version_num"),
        "modified_ts",
        "expires_on",
    ).filter(F.col("user_id") < 200)


ORACLE_BOUNDED = f"""
WITH v AS (
  SELECT DISTINCT user_id, epoch_ms(ts) AS modified_ts FROM events
  WHERE epoch_ms(ts) <= {ASOF_TS}
),
numbered AS (
  SELECT user_id, modified_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY modified_ts) AS version_num,
         coalesce(lead(modified_ts) OVER (PARTITION BY user_id ORDER BY modified_ts),
                  9999999999000) AS expires_on
  FROM v
)
SELECT user_id, version_num, modified_ts, expires_on
FROM numbered WHERE user_id < 200
"""


def alias_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detect_new_aliases 3-way classification (SURVEY §3.3;
    detect_new_aliases.ktr:565-607 + the FilterRows cascade) over
    driver-table-derived alias lists: 'new' aliases from events, the
    curated 'old' list from customer, classified via the composed
    pipeline (J2 lookup with miss defaults + P7 routing), summarized
    per class."""
    from ..plans.aliases import classify_aliases

    ev = load_table(spark, sf_dir, "events")
    new_aliases = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("alias_count"), F.min("event_id").alias("bug_id"))
        .select(
            F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("alias"),
            F.when(F.col("user_id") % 3 == 0, F.lit("multi"))
            .otherwise(F.lit("single"))
            .alias("alias_type"),
            "alias_count",
            "bug_id",
            F.col("user_id"),
        )
    )
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 120)
    old_aliases = cust.select(
        F.concat(F.lit("u"), F.col("c_custkey").cast("string")).alias("alias"),
        F.when(F.col("c_custkey") % 4 == 1, F.lit("multi"))
        .when(F.col("c_custkey") % 4 == 2, F.lit("curated"))
        .otherwise(F.lit("single"))
        .alias("alias_type"),
        F.col("c_custkey").alias("alias_count"),
        F.col("c_custkey").alias("bug_id"),
    )
    classified = classify_aliases(new_aliases.drop("user_id"), old_aliases)
    return classified.groupBy("alias_class").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("alias_count").alias("sum_count"),
    )


ORACLE_ALIAS_CLASSIFY = """
WITH new_aliases AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS alias,
         CASE WHEN user_id % 3 = 0 THEN 'multi' ELSE 'single' END AS alias_type,
         count(*) AS alias_count
  FROM events GROUP BY user_id
),
old_aliases AS (
  SELECT 'u' || CAST(c_custkey AS VARCHAR) AS alias,
         CASE WHEN c_custkey % 4 = 1 THEN 'multi'
              WHEN c_custkey % 4 = 2 THEN 'curated'
              ELSE 'single' END AS old_type
  FROM customer WHERE c_custkey < 120
),
classified AS (
  SELECT n.alias_count,
         CASE WHEN n.alias_type = coalesce(o.old_type, 'missing') THEN 'existing'
              WHEN n.alias_type = 'multi' AND o.old_type = 'curated' THEN 'curated_multi'
              WHEN n.alias_type = 'multi' AND o.old_type = 'single' THEN 'single_to_multi'
              ELSE 'new' END AS alias_class
  FROM new_aliases n LEFT JOIN old_aliases o USING (alias)
)
SELECT alias_class, count(*) AS n, CAST(sum(alias_count) AS BIGINT) AS sum_count
FROM classified GROUP BY alias_class
"""


def alias_curated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The get_bz_aliases.ktr aggregation composed end-to-end
    (plans/aliases.aggregate_curated_aliases): a curated alias relation
    synthesized from ``customer`` — including 'multi' rows
    (:109-136) and degenerate 'undefined=' / '=undefined' endpoints
    (:137-164,441-468) that the filters must drop — then SUM per alias
    (:165-203). The same function feeds build_alias_map, whose output
    the replay's J5 reconciliation consults (pytest-verified)."""
    from ..plans.aliases import aggregate_curated_aliases

    cust = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    curated = cust.select(
        F.when(k % 11 == 0, F.concat(F.lit("undefined=u"), (k % 50).cast("string")))
        .when(k % 13 == 0, F.concat(F.lit("u"), (k % 50).cast("string"), F.lit("=undefined")))
        .otherwise(
            F.concat(
                F.lit("u"), (k % 50).cast("string"), F.lit("@x.com=v"),
                (k % 50).cast("string"), F.lit("@y.com"),
            )
        )
        .alias("alias"),
        F.when(k % 5 == 0, F.lit("multi")).otherwise(F.lit("single")).alias("alias_type"),
        (k % 7).alias("alias_count"),
        k.alias("bug_id"),
    )
    return aggregate_curated_aliases(curated)


ORACLE_ALIAS_AGG = """
WITH curated AS (
  SELECT CASE
           WHEN c_custkey % 11 = 0 THEN 'undefined=u' || CAST(c_custkey % 50 AS VARCHAR)
           WHEN c_custkey % 13 = 0 THEN 'u' || CAST(c_custkey % 50 AS VARCHAR) || '=undefined'
           ELSE 'u' || CAST(c_custkey % 50 AS VARCHAR) || '@x.com=v'
                || CAST(c_custkey % 50 AS VARCHAR) || '@y.com'
         END AS alias,
         CASE WHEN c_custkey % 5 = 0 THEN 'multi' ELSE 'single' END AS alias_type,
         c_custkey % 7 AS alias_count
  FROM customer
)
SELECT alias, CAST(sum(alias_count) AS BIGINT) AS alias_count
FROM curated
WHERE alias_type <> 'multi'
  AND alias NOT LIKE 'undefined=%'
  AND alias NOT LIKE '%=undefined'
GROUP BY alias
"""


def _events_eav_with_attachments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.7 change stream plus ATTACHMENT current-state rows
    (_merge_order=7, the 'Get attachments'/'Get flags' family): each
    user carries one attachment (attach_id = user_id % 5) whose flag is
    'review?(u<id>@x.com)' for user_id % 3 == 0, else
    'feedback+(u<id>@x.com)' — deterministic, so the nested-query oracle
    can recompute membership relationally."""
    base = _events_eav(spark, sf_dir)
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    uid = F.col("user_id")
    att = users.select(
        uid.alias("bug_id"),
        F.lit(0).cast("long").alias("modified_ts"),
        F.concat(F.lit("u"), uid.cast("string")).alias("modified_by"),
        F.lit("flags").alias("field_name"),
        F.when(
            uid % 3 == 0,
            F.concat(F.lit("review?(u"), uid.cast("string"), F.lit("@x.com)")),
        )
        .otherwise(
            F.concat(F.lit("feedback+(u"), uid.cast("string"), F.lit("@x.com)"))
        )
        .alias("field_value"),
        F.lit(None).cast("string").alias("field_value_removed"),
        (uid % 5).cast("long").alias("attach_id"),
        F.lit(7).cast("long").alias("_merge_order"),
    )
    return base.unionByName(att)


#: the ES nested-document schema slice the query filters on
_NESTED_SCHEMA = (
    "attachments array<struct<attach_id:long, flags:array<string>>>"
)


def replay_nested_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested attachment/flag query surface (the ES nested-query analog,
    bug_version.json:133-135,171-173): versions whose nested
    ``attachments[]`` carry a ``review?`` flag — ``from_json`` over the
    emitted document, ``exists()`` over the nested struct array, and the
    matching attachment exploded back out. This is the one reference
    query capability the scalar replay entries don't cover."""
    versions = replay_history(_events_eav_with_attachments(spark, sf_dir))
    parsed = versions.withColumn(
        "atts", F.from_json(F.col("state_json"), _NESTED_SCHEMA).getField("attachments")
    )
    has_review = F.exists(
        "atts",
        lambda a: F.exists(a.getField("flags"), lambda fl: fl.startswith("review?")),
    )
    hit = parsed.filter(has_review & (F.col("bug_id") < 200))
    matched = F.filter(
        "atts",
        lambda a: F.exists(a.getField("flags"), lambda fl: fl.startswith("review?")),
    )
    return hit.select(
        F.col("bug_id").alias("user_id"),
        F.col("bug_version_num").alias("version_num"),
        "modified_ts",
        F.element_at(matched, 1).getField("attach_id").alias("attach_id"),
        F.element_at(F.element_at(matched, 1).getField("flags"), 1).alias("flag"),
    )


ORACLE_NESTED = """
WITH v AS (
  SELECT DISTINCT user_id, epoch_ms(ts) AS modified_ts FROM events
),
numbered AS (
  SELECT user_id, modified_ts,
         row_number() OVER (PARTITION BY user_id ORDER BY modified_ts) AS version_num
  FROM v
)
SELECT user_id, version_num, modified_ts,
       CAST(user_id % 5 AS BIGINT) AS attach_id,
       'review?(u' || CAST(user_id AS VARCHAR) || '@x.com)' AS flag
FROM numbered
WHERE user_id < 200 AND user_id % 3 = 0
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
    "replay_asof": replay_asof,
    "replay_bounded": replay_bounded,
    "alias_classify": alias_classify,
    "alias_curated_agg": alias_curated_agg,
    "replay_nested_flags": replay_nested_flags,
    "p10_date_reformat": p10_date_reformat,
}

ORACLE = {
    "s11_schema_inference": ORACLE_S11,
    "replay_versions": ORACLE_REPLAY,
    "replay_asof": ORACLE_ASOF,
    "replay_bounded": ORACLE_BOUNDED,
    "alias_classify": ORACLE_ALIAS_CLASSIFY,
    "alias_curated_agg": ORACLE_ALIAS_AGG,
    "replay_nested_flags": ORACLE_NESTED,
    "p10_date_reformat": ORACLE_P10,
}
