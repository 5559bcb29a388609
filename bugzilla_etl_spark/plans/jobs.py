"""Job orchestration: the reference's watermark-driven incremental loop
(SURVEY §3.1-§3.2) re-expressed over the index engine.

Reference mapping:
- ``get_run_timestamps.ktr`` (read BZ_LAST_RUN file + compute
  MAX(delta_ts) high watermark BEFORE processing)  -> ``read_watermark``
  + ``high_watermark``;
- ``run_full_update.kjb`` -> ``run_full_update`` (build everything);
- ``run_incremental_update.kjb`` -> ``run_incremental_update``
  (process rows with updated_ts > watermark, commit the new watermark
  ONLY on success — failure leaves the old watermark so the next run
  retries the same window: at-least-once, idempotent because doc ids
  are content-addressed, SURVEY §3.2);
- ``bin/rewind.sh`` -> ``rewind_watermark``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index import build_index, incremental_update
from ..index.manifest import IndexManifest

WATERMARK_FILE = "watermark.json"


def read_watermark(index_dir: str) -> int:
    """The BZ_LAST_RUN read (get_run_timestamps.ktr:124-219); 0 if absent."""
    path = os.path.join(index_dir, WATERMARK_FILE)
    if not os.path.exists(path):
        return 0
    with open(path) as f:
        return int(json.load(f)["last_run_ts"])


def commit_watermark(index_dir: str, ts: int) -> None:
    """Atomic commit, only called after a successful run
    (update_run_timestamp.ktr:104-165)."""
    path = os.path.join(index_dir, WATERMARK_FILE)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"last_run_ts": int(ts)}, f)
    os.replace(tmp, path)


def rewind_watermark(index_dir: str, ts: int) -> None:
    """bin/rewind.sh:18-27 — move the watermark back to replay a window."""
    commit_watermark(index_dir, ts)


def high_watermark(source: DataFrame, ts_col: str = "updated_ts") -> int:
    """MAX(delta_ts) captured BEFORE processing (get_run_timestamps.ktr:110):
    rows landing mid-run are re-processed next run (at-least-once)."""
    row = source.agg(F.max(ts_col).alias("hi")).collect()[0]
    return int(row["hi"] or 0)


def run_full_update(
    spark: SparkSession, source: DataFrame, index_dir: str, **build_kwargs
) -> IndexManifest:
    """run_full_update.kjb: full build + watermark initialization."""
    ts_col = build_kwargs.pop("ts_col", None)
    hi = high_watermark(source, ts_col) if ts_col else 0
    corpus = source.drop(ts_col) if ts_col else source
    m = build_index(spark, corpus, index_dir, **build_kwargs)
    commit_watermark(index_dir, hi)
    return m


def run_incremental_update(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    ts_col: str = "updated_ts",
    compact_max_segments: int | None = None,
) -> IndexManifest:
    """run_incremental_update.kjb: watermark window -> incremental segment
    -> commit watermark on success only.

    ``compact_max_segments``: the maintenance half of the reference's
    cron schedule (configuration/crontab.txt runs the incremental every
    10 minutes and a weekly sweep): when the 10-minute appends have
    accumulated more than this many segments, a size-tiered compaction
    folds the small tail AFTER the watermark commit — compaction is
    pure reorganization, so a crash mid-compact retries nothing (the
    committed watermark already covers the data)."""
    start = read_watermark(index_dir)
    hi = high_watermark(source, ts_col)
    changed = source.filter(F.col(ts_col) > start).drop(ts_col)
    m = incremental_update(spark, changed, index_dir)
    commit_watermark(index_dir, hi)  # reached only if the update succeeded
    if compact_max_segments is not None and len(m.segments) > compact_max_segments:
        from ..index import compact_tiered

        m = compact_tiered(spark, index_dir, max_segments=compact_max_segments)
    return m
