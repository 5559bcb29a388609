"""Log-structured multi-way segment merge.

The reference's Sorted Merge (bugzilla_to_json.ktr:1403-1429) applied to
index segments instead of row streams: all committed segments' blocks for
a (shard, tb, salt) group are decoded, concatenated per term, tombstoned
docs dropped, doc-duplicates collapsed (content-addressed doc ids — the
same (repo,path,commit) re-indexed is byte-identical, keep-one), then
re-encoded into fresh blocks with block-max impacts recomputed against
the post-merge avgdl. The manifest swap that publishes the merged
segment is the alias-swap analog (bin/import_bugs.sh:21-23).

Distributed end-to-end: the heavy work is one applyInPandas over
(shard, tb, salt) groups — the same shuffle shape as the build — so the
merge scales with the index, not with the driver.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..codec import delta_decode, varint_decode
from .build import BLOCK_SCHEMA, _make_encoder, read_segment_union
from .manifest import IndexManifest

_EMPTY_BLOCKS = pd.DataFrame(
    {
        "shard": pd.Series(dtype="int32"),
        "tb": pd.Series(dtype="int32"),
        "salt": pd.Series(dtype="int32"),
        "field": pd.Series(dtype="object"),
        "term": pd.Series(dtype="object"),
        "block_id": pd.Series(dtype="int32"),
        "n": pd.Series(dtype="int32"),
        "first_doc": pd.Series(dtype="int64"),
        "last_doc": pd.Series(dtype="int64"),
        "max_impact": pd.Series(dtype="float64"),
        "gaps": pd.Series(dtype="object"),
        "tfs": pd.Series(dtype="object"),
        "dls": pd.Series(dtype="object"),
    }
)


def _make_block_merger(
    avgdl_by_field: dict[str, float],
    k1: float,
    b: float,
    block_size: int,
    tombstones: list[int],
):
    encoder = _make_encoder(avgdl_by_field, k1, b, block_size)
    tomb = np.array(sorted(tombstones), dtype=np.int64)

    def merge(key, pdf):  # (key, pd.DataFrame) -> pd.DataFrame
        terms, docs, tfs, dls = [], [], [], []
        for t, g, tf, dl in zip(
            pdf["term"].to_numpy(),
            pdf["gaps"].to_numpy(),
            pdf["tfs"].to_numpy(),
            pdf["dls"].to_numpy(),
        ):
            d = delta_decode(varint_decode(bytes(g))).view(np.int64)
            tf_a = varint_decode(bytes(tf))
            dl_a = varint_decode(bytes(dl))
            if tomb.size:
                keep = ~np.isin(d, tomb)
                if not keep.any():
                    continue
                d, tf_a, dl_a = d[keep], tf_a[keep], dl_a[keep]
            terms.append(np.full(len(d), t, dtype=object))
            docs.append(d)
            tfs.append(tf_a)
            dls.append(dl_a)
        if not docs:
            return _EMPTY_BLOCKS
        flat = pd.DataFrame(
            {
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(docs),
                "tf": np.concatenate(tfs).astype(np.int64),
                "doc_len": np.concatenate(dls).astype(np.int64),
            }
        ).drop_duplicates(["term", "doc_id"], keep="first")
        return encoder(key, flat)

    return merge


def merge_segments(spark: SparkSession, index_dir: str) -> IndexManifest:
    """Compact all segments (+ tombstones) into one fresh segment."""
    m = IndexManifest.load(index_dir)
    if not m.segments:
        return m
    seg_dirs = m.segment_dirs(index_dir)
    new_id = m.next_segment_id()
    new_dir = os.path.join(index_dir, "segments", new_id)

    from .build import _extra_len_col

    extra = sorted(m.fields)
    docs = read_segment_union(spark, seg_dirs, "docs").dropDuplicates(["doc_id"])
    if m.tombstones:
        docs = docs.filter(~F.col("doc_id").isin(m.tombstones))
    docs.persist()
    try:
        stats = docs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_len").alias("s"),
            *[F.sum(_extra_len_col(f)).alias(f"s__{f}") for f in extra],
        ).collect()[0]
        n_docs, sum_dl = int(stats["n"]), int(stats["s"] or 0)
        avgdl = sum_dl / n_docs if n_docs else 1.0
        field_sums = {f: int(stats[f"s__{f}"] or 0) for f in extra}
        avgdl_by_field = {"content": avgdl}
        for f in extra:
            avgdl_by_field[f] = field_sums[f] / n_docs if n_docs else 1.0

        from ..session import python_stage_tuning

        t0 = time.monotonic()
        blocks_in = read_segment_union(spark, seg_dirs, "postings")
        merger = _make_block_merger(
            avgdl_by_field, m.k1, m.b, m.block_size, m.tombstones
        )
        merged = blocks_in.groupBy("field", "shard", "tb", "salt").applyInPandas(
            merger, schema=BLOCK_SCHEMA
        )
        with python_stage_tuning(spark):
            merged.withColumn(
                "sb", F.pmod(F.col("shard"), F.lit(m.n_sb)).cast("int")
            ).sortWithinPartitions(
                "sb", "tb", "term", "field", "salt", "block_id"
            ).write.partitionBy("sb").mode("overwrite").parquet(
                os.path.join(new_dir, "postings")
            )
        docs.write.mode("overwrite").parquet(os.path.join(new_dir, "docs"))
        # dict rebuilt from the merged blocks so df reflects dedupe+tombstones
        _dict_from_blocks(spark, os.path.join(new_dir, "postings")).sort(
            "term"
        ).write.mode("overwrite").parquet(os.path.join(new_dir, "dict"))
        from .bloom import write_segment_blooms

        write_segment_blooms(spark, new_dir, m.n_shards)
        elapsed = round(time.monotonic() - t0, 3)

        old_dirs = list(seg_dirs)
        m.segments = [
            {
                "id": new_id,
                "n_docs": n_docs,
                "postings": None,
                "avgdl": avgdl,
                "field_avgdl": avgdl_by_field,
                "lineage": {
                    "merged_from": [os.path.basename(d) for d in old_dirs],
                    "elapsed_s": elapsed,
                },
            }
        ]
        m.tombstones = []
        m.n_docs = n_docs
        m.sum_doc_len = sum_dl
        m.field_sum_doc_len = field_sums
        m.commit(index_dir)  # alias swap: queries now see only the merged segment
        for d in old_dirs:
            shutil.rmtree(d, ignore_errors=True)
    finally:
        docs.unpersist()
    return m


def _dict_from_blocks(spark: SparkSession, postings_path: str) -> DataFrame:
    blocks = spark.read.parquet(postings_path)
    return blocks.groupBy("field", "term").agg(
        F.sum("n").alias("df"), F.first("tb").alias("tb")
    )
