"""Index build: tokenize -> postings -> SPIMI encode -> immutable segment.

Reference parity (see SURVEY.md §7.0):
- the ten-scan + flatten front end (bugzilla_to_json.ktr:440-648) becomes
  one corpus scan + vectorized tokenization exploded to postings EAV
  ``(term, doc_id, tf)``;
- the manual bug_id range partitioning (bin/import_bugs.sh:36-40) becomes
  doc-space sharding (``shard = pmod(doc_id, n_shards)``) with optional
  shard-batched builds, plus term-hash bucketing (``tb``) for query-side
  partition pruning and doc-salting (``n_salts``) to bound encoder group
  memory under hot-term skew;
- the per-group stateful replay (parse_bug_history.js) becomes the
  per-partition SPIMI encoder: ``groupBy(shard, tb, salt).applyInPandas``
  emitting delta-gap + varint blocks with per-block max-impact metadata;
- the ES bulk sink + alias swap (bugzilla_to_json.ktr:1094-1277,
  bin/import_bugs.sh:21-23) becomes immutable parquet segment shards +
  an atomically-committed manifest;
- the watermark/retry machinery (§3.2) becomes per-batch checkpoints in
  the manifest: a killed build resumes, skipping completed batches.

Layout per segment::

    <index_dir>/segments/<seg_id>/
        postings/shard=K/tb=J/*.parquet   # block rows (see BLOCK_SCHEMA)
        docs/shard=K/*.parquet            # doc dimension incl. sha256
        dict/*.parquet                    # (term, df, tb)

Scale notes (100 TB / 1000 executors): the only wide shuffles are the
(term, doc) partial-agg groupBy (map-side combine — each doc's tokens
live in one partition, so the combiner collapses almost everything
before the exchange) and the applyInPandas group shuffle keyed on
(shard, tb, salt) — cardinality n_shards*n_tb*n_salts, chosen >> executor
count; no driver-side collect of data anywhere in the build.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import doc_id_to_u64, u64_to_doc_id, varint_encode
from ..tokenize import pandas_tokens, spark_tokens
from .manifest import IndexManifest

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("tb", T.IntegerType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("max_impact", T.DoubleType()),
        T.StructField("gaps", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
    ]
)

DOCS_COLS = ["doc_id", "repo", "path", "commit", "lang", "doc_len", "sha256", "shard"]


def read_segment_union(spark: SparkSession, seg_dirs: list[str], sub: str) -> DataFrame:
    """Union one sub-table (docs/postings/dict) across segment dirs.

    Segments are separate partitioned roots; Spark requires loading them
    separately and unioning (partition discovery is per-root)."""
    parts = [spark.read.parquet(os.path.join(d, sub)) for d in seg_dirs]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------- stages
_TF_STRUCT = T.StructType(
    [
        T.StructField("doc_len", T.IntegerType()),
        T.StructField(
            "pairs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("term", T.StringType()),
                        T.StructField("tf", T.IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_TF_STRUCT)
def _tokenize_count(texts: pd.Series) -> pd.DataFrame:
    """Fused tokenize + term-count (the SPIMI map phase): one Arrow pass
    emits per-doc (doc_len, [(term, tf)...]) with terms pre-aggregated,
    so no token-granularity explode/shuffle ever happens. Terms emitted
    sorted for deterministic downstream encode order."""
    token_lists = pandas_tokens(texts)
    doc_lens, pairs = [], []
    for toks in token_lists:
        doc_lens.append(len(toks))
        if toks:
            s = pd.Series(toks, dtype=object).value_counts().sort_index()
            pairs.append(list(zip(s.index.tolist(), s.to_numpy().tolist())))
        else:
            pairs.append([])
    return pd.DataFrame({"doc_len": doc_lens, "pairs": pairs})


def prepare_docs(
    df: DataFrame, n_shards: int, tokenizer: str = "arrow"
) -> DataFrame:
    """corpus (repo,path,commit,lang,content) -> + doc_id, sha256,
    doc_len, shard, pairs (pre-counted term frequencies).

    ``doc_id = xxhash64(repo, path, commit)`` (content-addressed identity —
    the analog of the reference's deterministic ES doc id
    ``bug_id + "." + modified_ts``, parse_bug_history.js:168).
    ``sha256`` is the per-row invariant column (BASELINE.json input_hint).

    tokenizer='arrow': one fused Arrow UDF produces (doc_len, pairs).
    tokenizer='builtin': JVM split/explode path; pairs built with
    built-in expressions only (aggregate over array_distinct).
    """
    if tokenizer == "arrow":
        df = df.withColumn("_tc", _tokenize_count(F.col("content"))).select(
            "*", F.col("_tc.doc_len").alias("doc_len"), F.col("_tc.pairs").alias("pairs")
        ).drop("_tc")
    elif tokenizer == "builtin":
        toks = spark_tokens(F.col("content"))
        df = (
            df.withColumn("tokens", toks)
            .withColumn("doc_len", F.size("tokens"))
            .withColumn(
                "pairs",
                F.transform(
                    F.array_sort(F.array_distinct("tokens")),
                    lambda t: F.struct(
                        t.alias("term"),
                        F.size(F.filter("tokens", lambda x: x == t))
                        .cast("int")
                        .alias("tf"),
                    ),
                ),
            )
            .drop("tokens")
        )
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    return (
        df.withColumn("doc_id", F.xxhash64("repo", "path", "commit"))
        .withColumn("sha256", F.sha2("content", 256))
        .withColumn("shard", F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int"))
    )


def tokenize_postings(prepared: DataFrame, n_tb: int, n_salts: int = 1) -> DataFrame:
    """Explode the pre-counted pairs to the postings EAV:
    (shard, tb, salt, term, doc_id, tf, doc_len).

    The unpivot/flatten analog (bugzilla_to_json.ktr:440-648). tf was
    already counted map-side inside the tokenizer (no shuffle here);
    tb is the term-hash bucket used for query-time partition pruning;
    salt is a doc-space sub-split that bounds the encoder's pandas
    group size for Zipf-hot terms.
    """
    return (
        prepared.select(
            "shard", "doc_id", "doc_len", F.explode("pairs").alias("p")
        )
        .select(
            "shard",
            "doc_id",
            "doc_len",
            F.col("p.term").alias("term"),
            F.col("p.tf").alias("tf"),
        )
        .withColumn("tb", F.pmod(F.xxhash64("term"), F.lit(n_tb)).cast("int"))
        .withColumn("salt", F.pmod(F.col("doc_id"), F.lit(n_salts)).cast("int"))
    )


def _impact(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def _make_encoder(avgdl: float, k1: float, b: float, block_size: int):
    """SPIMI block encoder for one (shard, tb, salt) group.

    Deterministic output (the stabilize() discipline,
    parse_bug_history.js:671-678): postings sorted by (term, doc_u64),
    blocks emitted in (term, block_id) order, stable mergesort.
    """

    def encode(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard, tb, salt = int(key[0]), int(key[1]), int(key[2])
        du = doc_id_to_u64(pdf["doc_id"].to_numpy())
        order = pd.DataFrame({"t": pdf["term"].to_numpy(), "d": du}).sort_values(
            ["t", "d"], kind="mergesort"
        ).index.to_numpy()
        terms = pdf["term"].to_numpy()[order]
        du = du[order]
        tf = pdf["tf"].to_numpy()[order].astype(np.int64)
        dl = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        imp = _impact(tf, dl, avgdl, k1, b)

        # term run boundaries
        change = np.empty(len(terms), dtype=bool)
        change[0] = True
        change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], len(terms)]

        rows = []
        for s, e in zip(starts, ends):
            term = terms[s]
            for bi, off in enumerate(range(s, e, block_size)):
                hi = min(off + block_size, e)
                d = du[off:hi]
                gaps = np.empty_like(d)
                gaps[0] = d[0]
                np.subtract(d[1:], d[:-1], out=gaps[1:])
                rows.append(
                    (
                        shard,
                        tb,
                        salt,
                        term,
                        bi,
                        int(hi - off),
                        int(u64_to_doc_id(d[:1])[0]),
                        int(u64_to_doc_id(d[-1:])[0]),
                        float(imp[off:hi].max()),
                        varint_encode(gaps),
                        varint_encode(tf[off:hi].astype(np.uint64)),
                        varint_encode(dl[off:hi].astype(np.uint64)),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[f.name for f in BLOCK_SCHEMA.fields],
        )

    return encode


def encode_blocks(
    postings: DataFrame, avgdl: float, k1: float, b: float, block_size: int
) -> DataFrame:
    return postings.groupBy("shard", "tb", "salt").applyInPandas(
        _make_encoder(avgdl, k1, b, block_size), schema=BLOCK_SCHEMA
    )


# ----------------------------------------------------------- full build
def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_shards: int = 8,
    n_tb: int = 8,
    n_salts: int = 1,
    tokenizer: str = "arrow",
    block_size: int = 128,
    shard_batches: int = 1,
    k1: float = 1.2,
    b: float = 0.75,
    resume: bool = True,
    max_batches: int | None = None,
) -> IndexManifest:
    """Build the initial segment; resumable per shard-batch.

    ``shard_batches > 1`` reproduces the reference's range-batched driver
    loop (bin/import_bugs.sh:36-40): each batch scans/builds only its
    shard subset and commits a checkpoint; a killed run resumes from the
    first unfinished batch (``max_batches`` exists to simulate the kill
    in tests). At cluster scale the corpus scan per batch prunes by the
    source table's own partitioning.
    """
    m = IndexManifest.load_or_new(
        index_dir,
        k1=k1,
        b=b,
        n_shards=n_shards,
        n_tb=n_tb,
        n_salts=n_salts,
        block_size=block_size,
        tokenizer=f"code_v1:{tokenizer}",
    )
    if m.segments and not m.checkpoints:
        raise ValueError(f"{index_dir} already has a committed build; use incremental_update")

    prepared = prepare_docs(corpus, n_shards, tokenizer=tokenizer)
    if shard_batches == 1:
        # single-pass build: tokenize once, reuse for stats + postings + docs
        prepared = prepared.persist()

    # global stats must be computed over the FULL corpus before encoding
    # (avgdl feeds block-max impacts); one cheap agg pass.
    if "stats" not in m.checkpoints:
        stats = prepared.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        m.checkpoints["stats"] = {"n_docs": int(stats["n"]), "sum_doc_len": int(stats["s"] or 0)}
        m.commit(index_dir)
    avgdl = (
        m.checkpoints["stats"]["sum_doc_len"] / m.checkpoints["stats"]["n_docs"]
        if m.checkpoints["stats"]["n_docs"]
        else 1.0
    )

    seg_id = "seg00000"
    seg_dir = os.path.join(index_dir, "segments", seg_id)
    shard_groups = [list(range(n_shards))[i::shard_batches] for i in range(shard_batches)]

    done = 0
    for bi, shards in enumerate(shard_groups):
        key = f"batch{bi}"
        if key in m.checkpoints:
            continue
        if max_batches is not None and done >= max_batches:
            return m  # simulated kill: manifest holds the resume point
        t0 = time.monotonic()
        batch = prepared if shard_batches == 1 else prepared.filter(
            F.col("shard").isin(shards)
        )
        lineage = _build_batch(batch, seg_dir, m, avgdl)
        lineage.update(
            {
                "shards": shards,
                "elapsed_s": round(time.monotonic() - t0, 3),
            }
        )
        lineage["postings_per_s"] = round(
            lineage["postings"] / max(lineage["elapsed_s"], 1e-9), 1
        )
        m.checkpoints[key] = lineage
        m.commit(index_dir)
        done += 1

    if shard_batches == 1:
        prepared.unpersist()

    # finalize: promote checkpoints to the committed segment (alias swap)
    batch_lineage = {k: v for k, v in m.checkpoints.items() if k.startswith("batch")}
    m.n_docs = m.checkpoints["stats"]["n_docs"]
    m.sum_doc_len = m.checkpoints["stats"]["sum_doc_len"]
    m.segments.append(
        {
            "id": seg_id,
            "n_docs": m.n_docs,
            "postings": sum(v["postings"] for v in batch_lineage.values()),
            "lineage": batch_lineage,
        }
    )
    m.checkpoints = {}
    m.commit(index_dir)
    return m


def _build_batch(
    prepared_batch: DataFrame, seg_dir: str, m: IndexManifest, avgdl: float
) -> dict:
    """One shard-batch: write postings blocks + docs dim + dict shard.

    Physical layout (scale-informed): postings directory-partitioned by
    ``tb`` ONLY — that is the key queries prune on; ``shard`` stays a
    data column (queries read every doc-shard anyway, so sharding the
    directories would multiply files/commit overhead for no pruning
    benefit — measured 10x write slowdown at 512 dirs). Within each tb
    dir, rows are term-sorted so parquet row-group min/max statistics
    give term-level skipping on read.
    """
    was_cached = prepared_batch.is_cached
    if not was_cached:
        prepared_batch = prepared_batch.persist()
    postings = tokenize_postings(prepared_batch, m.n_tb, m.n_salts).persist()
    try:
        n_postings = postings.count()
        blocks = encode_blocks(postings, avgdl, m.k1, m.b, m.block_size)
        (
            blocks.sortWithinPartitions("tb", "term", "salt", "block_id")
            .write.partitionBy("tb")
            .mode("append")
            .parquet(os.path.join(seg_dir, "postings"))
        )
        (
            prepared_batch.select(*DOCS_COLS)
            .write.mode("append")
            .parquet(os.path.join(seg_dir, "docs"))
        )
        (
            postings.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"), F.first("tb").alias("tb"))
            .sort("term")
            .write.mode("append")
            .parquet(os.path.join(seg_dir, "dict"))
        )
    finally:
        postings.unpersist()
        if not was_cached:
            prepared_batch.unpersist()
    return {"postings": int(n_postings)}


# ---------------------------------------------------------- incremental
def incremental_update(
    spark: SparkSession, new_docs: DataFrame, index_dir: str
) -> IndexManifest:
    """Append a new immutable segment for docs not yet indexed.

    Doc identity is content-addressed (doc_id = xxhash64(repo,path,commit)),
    so re-submitting already-indexed rows is a no-op (the reference's
    at-least-once idempotence: re-index by deterministic _id overwrites,
    SURVEY.md §3.2). df/N stay additive because segments are doc-disjoint.
    """
    m = IndexManifest.load(index_dir)
    tokenizer = m.tokenizer.split(":", 1)[1]
    prepared = prepare_docs(new_docs, m.n_shards, tokenizer=tokenizer)
    existing = read_segment_union(spark, m.segment_dirs(index_dir), "docs").select(
        "doc_id"
    )
    fresh = prepared.join(existing, "doc_id", "left_anti")
    fresh.persist()
    try:
        stats = fresh.agg(
            F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        n_new, s_new = int(stats["n"]), int(stats["s"] or 0)
        if n_new == 0:
            return m
        # avgdl for block metadata = post-update global avgdl
        avgdl = (m.sum_doc_len + s_new) / (m.n_docs + n_new)
        seg_id = m.next_segment_id()
        seg_dir = os.path.join(index_dir, "segments", seg_id)
        t0 = time.monotonic()
        lineage = _build_batch(fresh, seg_dir, m, avgdl)
        lineage["elapsed_s"] = round(time.monotonic() - t0, 3)
        m.n_docs += n_new
        m.sum_doc_len += s_new
        m.segments.append(
            {"id": seg_id, "n_docs": n_new, "postings": lineage["postings"], "lineage": lineage}
        )
        m.commit(index_dir)
    finally:
        fresh.unpersist()
    return m


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int]) -> IndexManifest:
    """Logical delete via tombstones (compacted away by merge_segments)."""
    m = IndexManifest.load(index_dir)
    gone = read_segment_union(spark, m.segment_dirs(index_dir), "docs").filter(
        F.col("doc_id").isin(doc_ids)
    )
    stats = gone.agg(F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("s")).collect()[0]
    m.tombstones = sorted(set(m.tombstones) | set(doc_ids))
    m.n_docs -= int(stats["n"])
    m.sum_doc_len -= int(stats["s"] or 0)
    m.commit(index_dir)
    return m


# ------------------------------------------------------------ invariant
def verify_sha256(spark: SparkSession, corpus: DataFrame, index_dir: str) -> int:
    """Per-row invariant (BASELINE.json input_hint): every indexed doc's
    stored sha256 equals sha256(content) of the source row. Returns the
    number of verified rows; raises on any mismatch or missing doc."""
    m = IndexManifest.load(index_dir)
    src = corpus.select(
        F.xxhash64("repo", "path", "commit").alias("doc_id"),
        F.sha2("content", 256).alias("src_sha"),
    )
    docs = read_segment_union(spark, m.segment_dirs(index_dir), "docs").select(
        "doc_id", "sha256"
    )
    joined = docs.join(src, "doc_id", "left")
    bad = joined.filter(
        F.col("src_sha").isNull() | (F.col("src_sha") != F.col("sha256"))
    ).count()
    if bad:
        raise AssertionError(f"sha256 invariant violated for {bad} docs")
    return docs.count()
