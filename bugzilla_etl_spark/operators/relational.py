"""Relational operator inventory (SURVEY.md §2) over the driver tables.

Every entry re-expresses one reference operator idiomatically in Spark
and carries a DuckDB oracle (``ORACLE``) with identical column aliases.
Determinism rules for the value-hash gate: integer/string outputs where
possible; money via ``FLOOR(x*100)`` cents (IEEE-identical in both
engines); floats only as ``ROUND(x, 6)`` with a full (value, key)
ordering tie-break.

Reference citations are per-function; the §2 row ids (S1, P1, M1, ...)
map each query to SURVEY.md's inventory line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------- S1: star scan
def s1_star_join_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 `Get bugs` scan: 5-way LEFT JOIN star lookup + watermark filter
    (bugzilla_to_json.ktr:785-804). Dimensions broadcast (all tiny)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") >= "1998-01-01")
    # orders is the one non-tiny dimension: the planner's broadcast
    # (its pruned 2-column estimate sits under the 10 MB threshold at
    # bench scale) serializes a 1.5M-row hash-relation build on the
    # driver — A/B at sf1.0: broadcast 1.7-2.2 s vs shuffled-hash
    # 0.84-1.05 s for the whole query. SHUFFLE_HASH (guide §3.1) builds
    # the per-partition hash tables in parallel and stays the right
    # strategy at cluster scale, where orders outgrows any broadcast
    # cap but remains the smaller join side.
    orders = _t(spark, sf_dir, "orders").hint("shuffle_hash")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "left")
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey, "left")
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.floor(F.col("l_extendedprice") * 100)).alias("revenue_cents"),
        )
    )


ORACLE_S1 = """
SELECT r_name AS region_name,
       count(*) AS n_items,
       CAST(sum(FLOOR(l_extendedprice * 100)) AS BIGINT) AS revenue_cents
FROM lineitem
LEFT JOIN orders   ON l_orderkey = o_orderkey
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
GROUP BY r_name
"""


# ----------------------------------------------- S2/J3: semi-join reduction
def j3_changed_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 changed-bugs semi-join: secondary scans filter
    `bug_id IN (SELECT ... delta_ts > START_TIME)`
    (bugzilla_to_json.ktr:673-677): users with an error event are the
    "changed" set; count their other events."""
    ev = _t(spark, sf_dir, "events")
    changed = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    return (
        ev.join(changed, "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


ORACLE_J3 = """
SELECT event_type, count(*) AS n_events
FROM events
WHERE user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
GROUP BY event_type
"""


def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 set-diff via anti-join (detect_new_aliases.ktr hop graph):
    customers that never placed a high-value (>300k) order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


ORACLE_J_ANTI = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


# ----------------------------------------- S2: activities scan (full shape)
def s2_activities_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 `Get new activities` scan: semi-join against the changed set,
    broadcast dimension joins, EAV projection, ordered per entity
    (bugzilla_to_json.ktr:1061-1080): events of users who errored,
    joined to the customer dimension, emitted as ordered EAV change rows
    with `_merge_order=9`."""
    ev = _t(spark, sf_dir, "events")
    changed = ev.filter(F.col("event_type") == "error").select("user_id").distinct()
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_name").alias("user_name")
    )
    return (
        ev.join(changed, "user_id", "left_semi")
        .join(F.broadcast(cust), "user_id", "inner")
        .select(
            F.col("user_id").alias("bug_id"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias("modified_ts"),
            F.col("user_name").alias("modified_by"),
            F.col("event_type").alias("field_name"),
            F.floor(F.col("value") * 100).alias("value_cents"),
            F.lit(9).alias("_merge_order"),
        )
        .filter(F.col("bug_id") < 60)
    )


ORACLE_S2 = """
SELECT e.user_id AS bug_id,
       epoch_ms(e.ts) AS modified_ts,
       c.c_name AS modified_by,
       e.event_type AS field_name,
       CAST(FLOOR(e.value * 100) AS BIGINT) AS value_cents,
       9 AS _merge_order
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
WHERE e.user_id IN (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
  AND e.user_id < 60
"""


# -------------------------------------- S3: attachments scan (nested child)
def s3_attachments_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 `Get attachments` scan (bugzilla_to_json.ktr:661-681):
    child-table scan ⋈ submitter dimension, semi-joined to the changed
    parent set, keyed (parent, attach_id, creation_ts) — lineitems as
    the attachments of changed (high-value) orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    changed = orders.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    supp = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("s_name").alias("submitter")
    )
    return (
        li.join(changed, li.l_orderkey == changed.o_orderkey, "left_semi")
        .join(F.broadcast(supp), "l_suppkey", "inner")
        .select(
            F.col("l_orderkey").alias("bug_id"),
            F.col("l_linenumber").alias("attach_id"),
            F.unix_millis(F.col("l_shipdate").cast("timestamp")).alias("creation_ts"),
            "submitter",
            F.lit(7).alias("_merge_order"),
        )
    )


ORACLE_S3 = """
SELECT l_orderkey AS bug_id,
       l_linenumber AS attach_id,
       epoch_ms(l_shipdate) AS creation_ts,
       s_name AS submitter,
       7 AS _merge_order
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice > 400000)
"""


# ----------------------------------------- S5-S8: multi-value -> EAV scans
def s5_multivalue_eav_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5-S8 family (`Get cc/keywords/bug_groups/see_also`,
    bugzilla_to_json.ktr:829-844 etc.): child table ⋈ name dimension →
    EAV rows with a constant field_name and `_merge_order=2` — orders'
    customers as the cc list of each order-day 'bug'."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_name").alias("cc_name")
    )
    return (
        orders.join(F.broadcast(cust), "o_custkey", "inner")
        .select(
            F.col("o_orderkey").alias("bug_id"),
            F.lit("cc").alias("field_name"),
            F.col("cc_name").alias("field_value"),
            F.lit(None).cast("string").alias("field_value_removed"),
            F.lit(2).alias("_merge_order"),
        )
    )


ORACLE_S5 = """
SELECT o_orderkey AS bug_id,
       'cc' AS field_name,
       c_name AS field_value,
       CAST(NULL AS VARCHAR) AS field_value_removed,
       2 AS _merge_order
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderkey < 3000
"""


# ------------------------------------- S4: flag-string reconstruction scan
def s4_flag_concat_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 `Get flags` scan: reconstructs the flag string
    `CONCAT(name, status, IF(requestee IS NULL, '', CONCAT('(', login,
    ')')))` (bugzilla_to_json.ktr:977-996) over events: event_type as
    the flag name, value sign as status, requestee present only when
    the props payload k < 5."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'\{"k": (\d+)\}', 1).cast("long")
    status = F.when(F.col("value") >= 5.0, F.lit("+")).otherwise(F.lit("?"))
    requestee = F.when(
        k < 5, F.concat(F.lit("(u"), F.col("user_id").cast("string"), F.lit(")"))
    ).otherwise(F.lit(""))
    flag = F.concat(F.col("event_type"), status, requestee)
    return (
        ev.select(flag.alias("flag_string"))
        .groupBy("flag_string")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )


ORACLE_S4 = """
SELECT event_type
       || CASE WHEN value >= 5.0 THEN '+' ELSE '?' END
       || CASE WHEN CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS BIGINT) < 5
               THEN '(u' || CAST(user_id AS VARCHAR) || ')' ELSE '' END AS flag_string,
       count(*) AS n
FROM events GROUP BY 1 HAVING count(*) >= 3
"""


# ------------------------------------------ J2: stream-lookup with defaults
def j2_lookup_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 `Stream lookup` hash join with per-column miss defaults
    (detect_new_aliases.ktr:565-607, defaults old_type='missing',
    old_count=0): orders looked up against a small build side."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000).select(
        "c_custkey", F.col("c_mktsegment").alias("seg")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("seg"), F.lit("missing")).alias("segment"),
        )
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_J2 = """
SELECT coalesce(seg, 'missing') AS segment, count(*) AS n_orders
FROM orders
LEFT JOIN (SELECT c_custkey, c_mktsegment AS seg FROM customer WHERE c_acctbal > 9000) b
  ON o_custkey = c_custkey
GROUP BY 1
"""


# -------------------------------------------- S9/S10: bidirectional expansion
def s9_bidirectional_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/S10 bidirectional edge expansion + M3 UNION-dedup
    (bugzilla_to_json.ktr:869-952): each (part, supplier) edge emitted
    under both endpoints, deduplicated."""
    li = _t(spark, sf_dir, "lineitem")
    fwd = li.select(
        F.col("l_partkey").alias("src"),
        F.lit("supplied_by").alias("rel"),
        F.col("l_suppkey").alias("dst"),
    )
    rev = li.select(
        F.col("l_suppkey").alias("src"),
        F.lit("supplies").alias("rel"),
        F.col("l_partkey").alias("dst"),
    )
    return fwd.union(rev).distinct().groupBy("rel").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("src").alias("sum_src"),
        F.sum("dst").alias("sum_dst"),
    )


ORACLE_S9 = """
WITH edges AS (
  SELECT l_partkey AS src, 'supplied_by' AS rel, l_suppkey AS dst FROM lineitem
  UNION
  SELECT l_suppkey AS src, 'supplies' AS rel, l_partkey AS dst FROM lineitem
)
SELECT rel, count(*) AS n_edges,
       CAST(sum(src) AS BIGINT) AS sum_src, CAST(sum(dst) AS BIGINT) AS sum_dst
FROM edges GROUP BY rel
"""


# ------------------------------------------------------ S12/A4: watermark max
def s12_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12 watermark high read `SELECT MAX(UNIX_TIMESTAMP(delta_ts)*1000)`
    (get_run_timestamps.ktr:110) + P8 TZ-to-epoch normalization
    (bugzilla_to_json.ktr:662)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("next_start_time"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_S12 = """
SELECT max(epoch_ms(ts)) AS next_start_time, count(*) AS n_rows FROM events
"""


# --------------------------------------------------------- P1/P2: unpivot/melt
def p1_unpivot_eav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 `Flatten bugs record` UDJC: wide row -> EAV rows, skipping the
    '---' placeholder (bugzilla_to_json.ktr:538-550). Spark-native
    ``stack`` replaces the Java UDF; no sentinel row needed under
    grouped execution."""
    part = _t(spark, sf_dir, "part")
    eav = part.select(
        F.col("p_partkey").alias("entity_id"),
        F.expr(
            "stack(4, 'brand', p_brand, 'type', p_type, "
            "'size', CAST(p_size AS STRING), 'name', p_name) AS (field_name, field_value)"
        ),
    ).filter(F.col("field_value") != "---")
    return eav.groupBy("field_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("field_value").alias("min_value"),
        F.max("field_value").alias("max_value"),
    )


ORACLE_P1 = """
WITH eav AS (
  SELECT p_partkey AS entity_id, 'brand' AS field_name, p_brand AS field_value FROM part
  UNION ALL SELECT p_partkey, 'type', p_type FROM part
  UNION ALL SELECT p_partkey, 'size', CAST(p_size AS VARCHAR) FROM part
  UNION ALL SELECT p_partkey, 'name', p_name FROM part
)
SELECT field_name, count(*) AS n, min(field_value) AS min_value, max(field_value) AS max_value
FROM eav WHERE field_value <> '---' GROUP BY field_name
"""


# ---------------------------------------- P3/P4/P6: scalar projection surface
def p_scalar_projections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 Lower Case (bugzilla_to_json.ktr:1279-1323), P4 zero-pad
    number->string masks (:266,278), P6 Calculator concat (:196-240)."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey").alias("cust_id"),
        F.lower("c_mktsegment").alias("segment_lc"),
        F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("custkey_padded"),
        F.concat(F.lit("/etl/output/"), F.col("c_custkey").cast("string")).alias(
            "full_filename"
        ),
    ).filter(F.col("cust_id") <= 100)


ORACLE_P_SCALAR = """
SELECT c_custkey AS cust_id,
       lower(c_mktsegment) AS segment_lc,
       lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS custkey_padded,
       '/etl/output/' || CAST(c_custkey AS VARCHAR) AS full_filename
FROM customer WHERE c_custkey <= 100
"""


# ------------------------------------------------------ P7: filter fan-out
def p7_filter_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 FilterRows true/false fan-out (get_bz_aliases.ktr:109-164):
    every Kettle filter routes BOTH branches; modeled as complementary
    filters re-unioned with a branch tag."""
    ev = _t(spark, sf_dir, "events")
    cond = (F.col("event_type") == "error") & (F.col("value") > 5.0)
    hit = ev.filter(cond).select(F.lit("match").alias("branch"), "event_id")
    miss = ev.filter(~cond).select(F.lit("nomatch").alias("branch"), "event_id")
    return (
        hit.union(miss)
        .groupBy("branch")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("sum_ids"))
    )


ORACLE_P7 = """
SELECT CASE WHEN event_type = 'error' AND value > 5.0 THEN 'match' ELSE 'nomatch' END AS branch,
       count(*) AS n, CAST(sum(event_id) AS BIGINT) AS sum_ids
FROM events GROUP BY 1
"""


# ------------------------------------------- P11/P12: regex + multivalue split
def p11_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 flag parsing regex `^(.*)([?+-])(\\(([^)]*)\\))?$`
    (parse_bug_history.js:35,680-695) applied to the events props blob:
    extract the numeric payload of '{"k": NN}'."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.regexp_extract(F.col("props"), r'\{"k": (\d+)\}', 1)
            .cast("long")
            .alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("k_value") < 10)
    )


ORACLE_P11 = """
SELECT CAST(regexp_extract(props, '\\{"k": (\\d+)\\}', 1) AS BIGINT) AS k_value, count(*) AS n
FROM events GROUP BY 1 HAVING k_value < 10
"""


def p12_split_multivalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 multi-value split `split(/\\s*,\\s*/)` (parse_bug_history.js:
    780-786), on p_type's space-separated words."""
    part = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split(F.col("p_type"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_P12 = """
SELECT word, count(*) AS n FROM (
  SELECT unnest(regexp_split_to_array(p_type, '\\s+')) AS word FROM part
) GROUP BY word
"""


# ------------------------------------------------- M1/W1: merge + rownum
def m1_sorted_merge_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 10-way Sorted Merge on (bug_id, _merge_order)
    (bugzilla_to_json.ktr:1403-1429) + W1 Rownum restarting per bug_id
    (:1377-1401): two event-like streams merged per user in
    (merge_order, ts) order, then row_number per user."""
    ev = _t(spark, sf_dir, "events")
    s1 = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.lit(1).alias("_merge_order"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_id",
    )
    s2 = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.lit(2).alias("_merge_order"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_id",
    )
    merged = s1.unionByName(s2)
    w = Window.partitionBy("user_id").orderBy("_merge_order", "ts_ms", "event_id")
    return (
        merged.withColumn("rownum", F.row_number().over(w))
        .filter(F.col("rownum") <= 3)
        .select("user_id", "rownum", "event_id")
    )


ORACLE_M1 = """
WITH merged AS (
  SELECT user_id, 1 AS _merge_order, epoch_ms(ts) AS ts_ms, event_id
  FROM events WHERE event_type IN ('click','view')
  UNION ALL
  SELECT user_id, 2, epoch_ms(ts), event_id FROM events WHERE event_type = 'purchase'
)
SELECT user_id, rownum, event_id FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY _merge_order, ts_ms, event_id) AS rownum
  FROM merged
) WHERE rownum <= 3
"""


# ------------------------------------------- W3/W4: validity intervals (SCD2)
def w3_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 expires_on chaining: valid-to = next version's valid-from
    (parse_bug_history.js:356-364; null sentinel 9999999999000 per
    bug_version.json:221-224) — orders as per-customer version chains."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    return orders.select(
        "o_custkey",
        "o_orderkey",
        ms.alias("modified_ts"),
        F.coalesce(
            F.lead(ms).over(w), F.lit(9999999999000)
        ).alias("expires_on"),
    ).filter(F.col("o_custkey") <= 50)


ORACLE_W3 = """
SELECT o_custkey, o_orderkey,
       epoch_ms(o_orderdate) AS modified_ts,
       coalesce(
         lead(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         9999999999000) AS expires_on
FROM orders WHERE o_custkey <= 50
"""


def w4_lag_duration_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 previous_values duration tracking: floor-days between value
    changes (parse_bug_history.js:636-660, Math.floor(ms/86400000))."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ms = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    lagged = orders.select(
        "o_custkey",
        "o_orderkey",
        ms.alias("ts_ms"),
        F.lag(ms).over(w).alias("prev_ts_ms"),
    )
    return (
        lagged.filter(F.col("prev_ts_ms").isNotNull())
        .select(
            "o_custkey",
            "o_orderkey",
            F.floor((F.col("ts_ms") - F.col("prev_ts_ms")) / 86400000).alias(
                "duration_days"
            ),
        )
        .groupBy("duration_days")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_W4 = """
WITH lagged AS (
  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ts_ms,
         lag(epoch_ms(o_orderdate)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_ts_ms
  FROM orders
)
SELECT CAST(FLOOR((ts_ms - prev_ts_ms) / 86400000) AS BIGINT) AS duration_days, count(*) AS n
FROM lagged WHERE prev_ts_ms IS NOT NULL GROUP BY 1
"""


# --------------------------------------------------- A1/A2/A3: aggregations
def a1_string_agg_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A3 global CONCAT string-agg (get_bugs_table_columns.ktr:105-139,
    get_bz_aliases.ktr:73-108) — deterministic via sorted collect."""
    region = _t(spark, sf_dir, "region")
    return region.agg(
        F.array_join(F.array_sort(F.collect_list("r_name")), ",").alias("all_regions")
    )


ORACLE_A1 = """
SELECT string_agg(r_name, ',' ORDER BY r_name) AS all_regions FROM region
"""


def a2_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 sorted-input GroupBy SUM (get_bz_aliases.ktr:165-203) — Spark's
    hash aggregate replaces the sort requirement."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_A2 = """
SELECT l_returnflag, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape over the driver lineitem (the canonical groupBy+agg
    pattern the reference's GroupBy steps approximate); money in exact
    cents."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2005-09-02")
    disc = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(F.floor(F.col("l_extendedprice") * 100)).alias("sum_base_cents"),
            F.sum(disc).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(FLOOR(l_extendedprice * 100)) AS BIGINT) AS sum_base_cents,
       CAST(sum(FLOOR(l_extendedprice * (1 - l_discount) * 100)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2005-09-02'
GROUP BY l_returnflag, l_linestatus
"""


# ----------------------------------------------------- top-k / order-by
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 full-sort analog with bounded output: global top-k, exact
    tie-break by key (Spark executes as TakeOrderedAndProject — the
    bounded-heap pattern, no full sort materialized)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", F.floor(F.col("o_totalprice") * 100).alias("price_cents")
        )
        .orderBy(F.col("price_cents").desc(), F.col("o_orderkey"))
        .limit(20)
    )


ORACLE_TOPK = """
SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 20
"""


def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (window + row_number <= K) — the per-partition
    bounded-heap pattern of the query engine, relationally."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 2) & (F.col("o_custkey") <= 100))
        .select("o_custkey", "rk", "o_orderkey")
    )


ORACLE_W_TOPK = """
SELECT o_custkey, rk, o_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders
) WHERE rk <= 2 AND o_custkey <= 100
"""


# ------------------------------------------------------------ M5: set diff
def m5_set_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5 new-vs-old set diff (detect_new_aliases.ktr): users seen in
    clicks EXCEPT users seen in purchases."""
    ev = _t(spark, sf_dir, "events")
    big = F.col("value") > 100.0
    clickers = ev.filter((F.col("event_type") == "click") & big).select("user_id")
    buyers = ev.filter((F.col("event_type") == "purchase") & big).select("user_id")
    return clickers.distinct().exceptAll(buyers.distinct()).select(
        F.col("user_id").alias("click_only_user")
    )


ORACLE_M5 = """
SELECT DISTINCT user_id AS click_only_user
FROM events WHERE event_type = 'click' AND value > 100.0
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 100.0
"""


def w_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) + cumulative-sum over gap>30min markers —
    the batch analog of session_window (the common OLAP pattern; the
    reference's validity-interval chaining W3 generalized to gaps)."""
    ev = _t(spark, sf_dir, "events")
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = (
        ev.select("user_id", "event_id", ms.alias("ts_ms"))
        .withColumn("prev_ms", F.lag("ts_ms").over(w))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_ms").isNull()
                | (F.col("ts_ms") - F.col("prev_ms") > 1_800_000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_sess").over(wcum))
    )
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_ms").alias("session_start"),
            F.max("ts_ms").alias("session_end"),
        )
        .filter(F.col("user_id") < 100)
    )


ORACLE_SESSIONIZE = """
WITH marked AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
                OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
),
sess AS (
  SELECT user_id, event_id, ts_ms,
         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM marked
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts_ms) AS session_start, max(ts_ms) AS session_end
FROM sess WHERE user_id < 100
GROUP BY user_id, session_id
"""


QUERIES = {
    "w_sessionize": w_sessionize,
    "s1_star_join_scan": s1_star_join_scan,
    "s2_activities_scan": s2_activities_scan,
    "s3_attachments_scan": s3_attachments_scan,
    "s4_flag_concat_scan": s4_flag_concat_scan,
    "s5_multivalue_eav_scan": s5_multivalue_eav_scan,
    "j3_changed_semi_join": j3_changed_semi_join,
    "j_anti_join": j_anti_join,
    "j2_lookup_defaults": j2_lookup_defaults,
    "s9_bidirectional_edges": s9_bidirectional_edges,
    "s12_watermark_max": s12_watermark_max,
    "p1_unpivot_eav": p1_unpivot_eav,
    "p_scalar_projections": p_scalar_projections,
    "p7_filter_router": p7_filter_router,
    "p11_regex_extract": p11_regex_extract,
    "p12_split_multivalue": p12_split_multivalue,
    "m1_sorted_merge_rownum": m1_sorted_merge_rownum,
    "w3_validity_intervals": w3_validity_intervals,
    "w4_lag_duration_days": w4_lag_duration_days,
    "a1_string_agg_columns": a1_string_agg_columns,
    "a2_group_sum": a2_group_sum,
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "topk_orders_by_price": topk_orders_by_price,
    "w_topk_per_group": w_topk_per_group,
    "m5_set_diff": m5_set_diff,
}

ORACLE = {
    "w_sessionize": ORACLE_SESSIONIZE,
    "s1_star_join_scan": ORACLE_S1,
    "s2_activities_scan": ORACLE_S2,
    "s3_attachments_scan": ORACLE_S3,
    "s4_flag_concat_scan": ORACLE_S4,
    "s5_multivalue_eav_scan": ORACLE_S5,
    "j3_changed_semi_join": ORACLE_J3,
    "j_anti_join": ORACLE_J_ANTI,
    "j2_lookup_defaults": ORACLE_J2,
    "s9_bidirectional_edges": ORACLE_S9,
    "s12_watermark_max": ORACLE_S12,
    "p1_unpivot_eav": ORACLE_P1,
    "p_scalar_projections": ORACLE_P_SCALAR,
    "p7_filter_router": ORACLE_P7,
    "p11_regex_extract": ORACLE_P11,
    "p12_split_multivalue": ORACLE_P12,
    "m1_sorted_merge_rownum": ORACLE_M1,
    "w3_validity_intervals": ORACLE_W3,
    "w4_lag_duration_days": ORACLE_W4,
    "a1_string_agg_columns": ORACLE_A1,
    "a2_group_sum": ORACLE_A2,
    "tpch_q1_pricing_summary": ORACLE_TPCH_Q1,
    "topk_orders_by_price": ORACLE_TOPK,
    "w_topk_per_group": ORACLE_W_TOPK,
    "m5_set_diff": ORACLE_M5,
}
