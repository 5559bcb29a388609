"""The composed reference pipeline: history replay -> fulltext index.

This is the reference's single most important end-to-end flow — Parse
Bug History feeding the ES bulk sink (bugzilla_to_json.ktr:1325-1375 ->
:1094-1277), with the deterministic per-version document id
``bug_id + "." + modified_ts`` (parse_bug_history.js:168) — recomposed
Spark-first: ``replay_history``'s version snapshots become the index
corpus (one document per version, content = the version's state JSON),
``modified_ts``/``expires_on`` ride along as docs-dimension attributes,
and the production query — fulltext over the versions ACTIVE at time T
— runs as a filtered top-k (``index.predicate``) with the temporal
interval predicate (``modified_ts <= T < expires_on``, js:356-364;
sentinel configuration/es/bug_version.json:221-224).

Incremental semantics (SURVEY §3.2 at-least-once idempotence): the
reference re-indexes changed versions by deterministic _id, which ES
upserts in place. Segments here are immutable, so ``upsert_versions``
realizes the same contract as tombstone-then-targeted-compact-then-
append: ids present in the incoming batch are deleted (physically, via
bloom-targeted compaction of only the affected segments) and re-added
with fresh content/attributes. This is exactly what the reopened-bug
case needs — a new version arriving CHANGES the previously-open
version's ``expires_on``, and the re-emitted older version (the
replay's incremental emission rule, parse_bug_history.js:480-483)
overwrites its stale interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: docs-dimension attributes every version document carries
VERSION_ATTRS = ["bug_id", "modified_ts", "expires_on"]


def versions_to_corpus(versions: DataFrame) -> DataFrame:
    """replay_history output -> index corpus rows.

    ``(repo='bugs', path=bug_id, commit=modified_ts)`` makes
    ``doc_id = xxhash64(repo, path, commit)`` the content-addressed
    analog of the reference's ``bug_id.modified_ts`` ES _id
    (parse_bug_history.js:168): re-replaying the same history yields
    byte-identical ids, so at-least-once delivery stays idempotent."""
    return versions.select(
        F.lit("bugs").alias("repo"),
        F.col("bug_id").cast("string").alias("path"),
        F.col("modified_ts").cast("string").alias("commit"),
        F.lit("bug_version").alias("lang"),
        F.col("state_json").alias("content"),
        "bug_id",
        "modified_ts",
        "expires_on",
    )


def build_version_index(
    spark: SparkSession,
    versions: DataFrame,
    index_dir: str,
    **build_kwargs,
) -> "object":
    """Initial build of the version index (replay output -> segments)."""
    from ..index import build_index

    corpus = versions_to_corpus(versions)
    build_kwargs.setdefault("doc_attrs", list(VERSION_ATTRS))
    return build_index(spark, corpus, index_dir, **build_kwargs)


#: documented ceiling on the per-upsert batch id collect: the batch is
#: the replay's WATERMARK-WINDOW re-emission, not the corpus, so real
#: batches sit orders of magnitude below this; the bound exists to fail
#: fast (with a clear instruction) on the full-corpus-replay misuse
#: that would otherwise OOM the driver (VERDICT r4 item 7)
MAX_UPSERT_BATCH_IDS = 2_000_000


def upsert_versions(
    spark: SparkSession,
    versions: DataFrame,
    index_dir: str,
    max_batch_ids: int = MAX_UPSERT_BATCH_IDS,
) -> "object":
    """Overwrite-by-deterministic-id append (the ES upsert analog).

    The incoming batch is the replay's incremental re-emission (changed
    + new versions — bounded by the watermark window, NOT the corpus):
    ids already indexed are tombstoned and physically compacted out of
    ONLY the bloom-hit segments (``delete_docs(auto_compact_ratio=0.0)``
    — compaction must be immediate, or the re-added id would be killed
    by its own global tombstone), then the whole batch appends as a
    fresh segment. Unchanged documents never rewrite.

    The id collect is bounded by ``max_batch_ids`` via limit-probe (the
    driver never materializes more than the bound + 1 rows): a batch
    over the bound raises with instructions to chunk — e.g. split the
    watermark window, or run a fresh ``build_version_index`` for a
    full-corpus replay (no deletes needed against a new index dir)."""
    from ..index.build import delete_docs, incremental_update

    corpus = versions_to_corpus(versions)
    ids = [
        int(r["doc_id"])
        for r in corpus.select(
            F.xxhash64("repo", "path", "commit").alias("doc_id")
        )
        .distinct()
        .limit(max_batch_ids + 1)
        .collect()
    ]
    if len(ids) > max_batch_ids:
        raise ValueError(
            f"upsert batch exceeds max_batch_ids={max_batch_ids}: this is "
            "a watermark-window operation — chunk the batch (smaller "
            "windows), raise max_batch_ids explicitly, or use "
            "build_version_index into a fresh dir for a full replay"
        )
    if ids:
        delete_docs(spark, index_dir, ids, auto_compact_ratio=0.0)
    return incremental_update(spark, corpus, index_dir)


def search_versions_asof(
    spark: SparkSession,
    index_dir: str,
    query: str,
    ts: int,
    k: int = 10,
    extra_predicate: list | None = None,
    must_not: list | None = None,
    operator: str = "or",
) -> list[tuple[int, float]]:
    """The reference's production query: BM25 over the versions ACTIVE
    at ``ts`` (point-in-time slice ``modified_ts <= ts < expires_on``),
    optionally AND-ed with further docs-dimension clauses (e.g.
    ``[("bug_id", "in", [...])]``), negative text terms (must_not), or
    operator="and" (every term must occur in the version)."""
    from ..index import search

    pred = [("modified_ts", "<=", int(ts)), ("expires_on", ">", int(ts))]
    if extra_predicate:
        pred = pred + list(extra_predicate)
    return search(
        spark, index_dir, query, k=k, predicate=pred,
        must_not=must_not, operator=operator,
    )


def phrase_search_versions_asof(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    ts: int,
    k: int = 10,
    extra_predicate: list | None = None,
    scoring: str = "gate",
) -> list[tuple[int, float]]:
    """Exact match_phrase over the versions ACTIVE at ``ts`` — the
    reference's analyzed-match + filter-context + temporal-range query
    shape (bug_version.json:57-65,221-224) with phrase semantics the
    shingle fields only approximate. Requires the version index built
    with positions=True (VERDICT r4 #4)."""
    from ..index import phrase_search

    pred = [("modified_ts", "<=", int(ts)), ("expires_on", ">", int(ts))]
    if extra_predicate:
        pred = pred + list(extra_predicate)
    return phrase_search(
        spark, index_dir, phrase, k=k, predicate=pred, scoring=scoring
    )
