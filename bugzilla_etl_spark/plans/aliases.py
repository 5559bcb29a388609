"""The composed alias-sweep pipeline (SURVEY §3.3).

Reference: ``find_aliases.ktr`` emits potential identity aliases from
flag-reconciliation misses; ``detect_new_aliases.ktr`` then classifies
them against the curated active list and appends the genuinely-new ones
to the updates file:

- Stream lookup of new rows against old rows on ``alias``, pulling
  old_type (default 'missing') and old_count (default 0)
  (detect_new_aliases.ktr:565-607) — J2 with miss defaults;
- ``filter exact matches``: alias_type == old_type -> existing (drop);
- ``filter curated multis``: multi vs curated -> curated (drop);
- ``filter single to multi``: multi vs single -> promotion (drop);
- everything else -> Save new aliases (K3 append sink,
  find_aliases.ktr:1133-1181).

Spark shape: ONE left broadcast join (the old list is small/curated) +
one CASE classification column; each reference filter branch is a
partition of the classified frame, so the whole 3-filter cascade is a
single narrow stage — no shuffle beyond the broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.replay import replay_aliases
from ..sources.files import read_alias_csv, write_alias_csv

#: classification labels, mirroring the reference's four hop targets
EXISTING = "existing"
CURATED_MULTI = "curated_multi"
SINGLE_TO_MULTI = "single_to_multi"
NEW = "new"


def classify_aliases(new_aliases: DataFrame, old_aliases: DataFrame) -> DataFrame:
    """J2 lookup + the 3-filter cascade as one classified frame.

    Returns new_aliases columns + old_type/old_count (miss defaults) +
    ``alias_class`` in {existing, curated_multi, single_to_multi, new}."""
    old = old_aliases.select(
        "alias",
        F.col("alias_type").alias("old_type"),
        F.col("alias_count").alias("old_count"),
    )
    joined = (
        new_aliases.join(F.broadcast(old), "alias", "left")
        .withColumn("old_type", F.coalesce(F.col("old_type"), F.lit("missing")))
        .withColumn("old_count", F.coalesce(F.col("old_count"), F.lit(0)))
    )
    return joined.withColumn(
        "alias_class",
        F.when(F.col("alias_type") == F.col("old_type"), F.lit(EXISTING))
        .when(
            (F.col("alias_type") == "multi") & (F.col("old_type") == "curated"),
            F.lit(CURATED_MULTI),
        )
        .when(
            (F.col("alias_type") == "multi") & (F.col("old_type") == "single"),
            F.lit(SINGLE_TO_MULTI),
        )
        .otherwise(F.lit(NEW)),
    )


def detect_new_aliases(
    new_aliases: DataFrame, old_aliases: DataFrame
) -> dict[str, DataFrame]:
    """The four hop targets of detect_new_aliases.ktr as named frames."""
    classified = classify_aliases(new_aliases, old_aliases)
    out_cols = ["alias", "alias_type", "alias_count", "bug_id"]
    return {
        cls: classified.filter(F.col("alias_class") == cls).select(*out_cols)
        for cls in (EXISTING, CURATED_MULTI, SINGLE_TO_MULTI, NEW)
    }


def aggregate_curated_aliases(curated: DataFrame) -> DataFrame:
    """The get_bz_aliases.ktr relational core, composed end-to-end:

    - drop ``multi`` rows (get_bz_aliases.ktr:109-136);
    - drop degenerate ``undefined=`` / ``=undefined`` endpoints
      (:137-164,441-468);
    - SUM alias_count per alias (:165-203, the sorted-input GroupBy —
      Spark's hash aggregate replaces the sort requirement).

    Returns (alias, alias_count) — the curated active-alias relation the
    comma-concat broadcast (:73-108) is built from."""
    return (
        curated.filter(F.col("alias_type") != "multi")
        .filter(~F.col("alias").startswith("undefined="))
        .filter(~F.col("alias").endswith("=undefined"))
        .groupBy("alias")
        .agg(F.sum("alias_count").cast("long").alias("alias_count"))
    )


def build_alias_map(spark: SparkSession, curated_csv: str) -> dict[str, str]:
    """Curated CSV -> the BZ_ALIASES broadcast map, end-to-end
    (run_full_update.kjb:169-197 chains get_bz_aliases.ktr before the
    main transform):

    aggregate (filters + SUM) -> global comma-concat into ONE scalar
    (:73-108; the A3 CONCAT_COMMA + setVariable boundary, :346-372) ->
    parsed into the equivalence map the replay's J5 reconciliation
    consults (parse_bug_history.js:788-800 splits the variable;
    :506-521 tries 'a=b' in BOTH directions — here both endpoints
    canonicalize to min(a,b), giving the same bidirectional equality).
    """
    agg = aggregate_curated_aliases(read_alias_csv(spark, curated_csv))
    bz = agg.agg(
        F.array_join(F.array_sort(F.collect_list("alias")), ",").alias("bz")
    ).collect()[0]["bz"]
    mapping: dict[str, str] = {}
    for pair in bz.split(",") if bz else []:
        a, sep, b = pair.partition("=")
        if not sep:
            continue
        canon = min(a, b).lower()
        mapping[a.lower()] = canon
        mapping[b.lower()] = canon
    return mapping


def run_alias_sweep(
    spark: SparkSession,
    eav: DataFrame,
    old_aliases_csv: str,
    updates_csv: str,
    aliases_map: dict[str, str] | None = None,
    curated_map_csv: str | None = None,
) -> dict[str, int]:
    """find_aliases -> detect_new_aliases -> append sink, end-to-end:
    replay the change history collecting reconciliation misses, classify
    against the active alias list, append the NEW class to the updates
    file (K3 append). Returns per-class row counts (the reference's
    LINES_WRITTEN channel telemetry).

    ``curated_map_csv``: when given (and no explicit ``aliases_map``),
    the BZ_ALIASES map is built from that curated file first — the full
    run_full_update.kjb chaining (get_bz_aliases -> main transform)."""
    if aliases_map is None and curated_map_csv is not None:
        aliases_map = build_alias_map(spark, curated_map_csv)
    potential = replay_aliases(eav, aliases=aliases_map)
    old = read_alias_csv(spark, old_aliases_csv)
    branches = detect_new_aliases(potential, old)
    counts = {cls: df.count() for cls, df in branches.items()}
    write_alias_csv(branches[NEW], updates_csv, append=True)
    return counts
