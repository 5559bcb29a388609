"""BM25 top-k query execution over the segment format.

Lifecycle (SURVEY.md §3.4): tokenize the query with the SAME analyzer
used at build -> look up the term dictionary (df per term -> idf,
partition-pruned by term predicate pushdown) -> read only the postings
partitions whose term-hash bucket (``tb``) matches a query term
(directory-level partition pruning) -> score per doc-shard with a
bounded top-k heap (exhaustive-vectorized or block-max WAND) -> k-way
merge of per-shard top-ks on the driver -> (doc_id, score) top-k,
rank-identical to the exhaustive oracle.

The per-shard heap + driver merge is the reference's Sorted Merge
pattern (bugzilla_to_json.ktr:1403-1429) applied to scored results:
shards are doc-disjoint, so merging never deduplicates.

Scoring determinism: contributions are accumulated in sorted term
order in every path (exhaustive numpy, WAND, pure-Python oracle), so
scores are bit-identical across paths and across parallelism levels.
"""

from __future__ import annotations

import heapq
import os
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import delta_decode, u64_to_doc_id, varint_decode
from ..oracle import idf as _idf
from ..tokenize import py_tokens
from .manifest import IndexManifest
from .wand import Block, TermCursor, wand_topk

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def _read_postings(spark: SparkSession, m: IndexManifest, index_dir: str) -> DataFrame:
    from .build import read_segment_union

    return read_segment_union(spark, m.segment_dirs(index_dir), "postings")


def _lookup_terms(
    spark: SparkSession, m: IndexManifest, index_dir: str, terms: list[str]
) -> dict[str, tuple[int, int]]:
    """term -> (df, tb). Predicate pushdown on the sorted dict parquet;
    df sums across segments (segments are doc-disjoint)."""
    if not terms:
        return {}
    from .build import read_segment_union

    dict_df = read_segment_union(spark, m.segment_dirs(index_dir), "dict")
    rows = (
        dict_df.filter(F.col("term").isin(terms))
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.first("tb").alias("tb"))
        .collect()
    )
    return {r["term"]: (int(r["df"]), int(r["tb"])) for r in rows}


def _make_shard_scorer(
    queries: dict[int, tuple[list[str], int]],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    use_wand: bool,
):
    """Per-shard scorer: pandas group (all blocks of query terms in one
    doc-shard) in, per-query top-k rows out."""

    def score(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # group blocks by (term, salt)
        by_term_salt: dict[tuple[str, int], list] = defaultdict(list)
        for t, s, fd, ld, mi, g, tf, dl in zip(
            pdf["term"].to_numpy(),
            pdf["salt"].to_numpy(),
            pdf["first_doc"].to_numpy(),
            pdf["last_doc"].to_numpy(),
            pdf["max_impact"].to_numpy(),
            pdf["gaps"].to_numpy(),
            pdf["tfs"].to_numpy(),
            pdf["dls"].to_numpy(),
        ):
            by_term_salt[(t, int(s))].append(
                Block(
                    first=np.int64(fd).view(np.uint64),
                    last=np.int64(ld).view(np.uint64),
                    max_impact=float(mi),
                    gaps=bytes(g),
                    tfs=bytes(tf),
                    dls=bytes(dl),
                )
            )
        # decode every (term, salt) sub-list ONCE per shard group; all
        # queries share the decoded arrays (batched-query fast path)
        decoded: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        if not use_wand:
            for t in sorted({ts[0] for ts in by_term_salt}):
                docs_parts, imp_parts = [], []
                for (tt, _s), blocks in sorted(by_term_salt.items()):
                    if tt != t:
                        continue
                    for blk in sorted(blocks, key=lambda x: int(x.first)):
                        d = delta_decode(varint_decode(blk.gaps))
                        tf = varint_decode(blk.tfs).astype(np.float64)
                        dl = varint_decode(blk.dls).astype(np.float64)
                        imp = idfs[t] * (
                            tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
                        )
                        docs_parts.append(d)
                        imp_parts.append(imp)
                decoded[t] = (np.concatenate(docs_parts), np.concatenate(imp_parts))

        out_q, out_d, out_s = [], [], []
        for qid, (terms, k) in queries.items():
            present = sorted({ts[0] for ts in by_term_salt} & set(terms))
            if not present:
                continue
            if use_wand:
                topk = _score_wand(present, by_term_salt, idfs, avgdl, k1, b, tombstones, k)
            else:
                topk = _score_decoded(present, decoded, tombstones, k)
            for d, s in topk:
                out_q.append(qid)
                out_d.append(d)
                out_s.append(s)
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return score


def _score_decoded(
    terms: list[str],
    decoded: dict[str, tuple[np.ndarray, np.ndarray]],
    tombstones: np.ndarray,
    k: int,
) -> list[tuple[int, float]]:
    """Vectorized exact scoring over pre-decoded lists: union the doc
    space, accumulate per-term contributions in sorted term order,
    top-k with (score desc, doc_id asc)."""
    per_term = [(t, decoded[t][0], decoded[t][1]) for t in terms]  # sorted
    all_docs = np.concatenate([d for _, d, _ in per_term])
    uniq, inv = np.unique(all_docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    off = 0
    for _, d, imp in per_term:  # sorted term order -> deterministic sums
        np.add.at(acc, inv[off : off + len(d)], imp)
        off += len(d)
    docs_i64 = u64_to_doc_id(uniq)
    if tombstones.size:
        keep = ~np.isin(docs_i64, tombstones)
        docs_i64, acc = docs_i64[keep], acc[keep]
    if len(acc) == 0:
        return []
    kk = min(k, len(acc))
    # O(n) selection of candidates, widened to include boundary ties so
    # the (score desc, doc_id asc) tie-break stays exact
    if len(acc) > kk:
        kth = np.partition(-acc, kk - 1)[kk - 1]
        cand = np.flatnonzero(-acc <= kth)
    else:
        cand = np.arange(len(acc))
    order = np.lexsort((docs_i64[cand], -acc[cand]))[:kk]
    sel = cand[order]
    return list(zip(docs_i64[sel].tolist(), acc[sel].tolist()))


def _score_wand(
    terms: list[str],
    by_term_salt: dict,
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    k: int,
) -> list[tuple[int, float]]:
    # tombstones require over-fetch then filter (exact because tombstoned
    # docs only ever shrink the result set; merge compacts them away)
    extra = int(tombstones.size)
    cursors = [
        TermCursor(t, s, idfs[t], blocks, k1, b, avgdl)
        for (t, s), blocks in sorted(by_term_salt.items())
        if t in terms
    ]
    topk = wand_topk(cursors, k + extra)
    if extra:
        tomb = set(tombstones.tolist())
        topk = [(d, s) for d, s in topk if d not in tomb][:k]
    return topk


def search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    use_wand: bool = False,
) -> dict[int, list[tuple[int, float]]]:
    """Batch top-k: [(query_id, text, k)] -> {query_id: [(doc_id, score)]}.

    One Spark job scores every query against every doc-shard; the driver
    then k-way merges the per-shard bounded heaps per query.
    """
    m = IndexManifest.load(index_dir)
    qterms = {int(qid): (sorted(set(py_tokens(text))), int(k)) for qid, text, k in queries}
    all_terms = sorted({t for terms, _ in qterms.values() for t in terms})
    term_info = _lookup_terms(spark, m, index_dir, all_terms)
    results: dict[int, list[tuple[int, float]]] = {qid: [] for qid in qterms}
    live_terms = sorted(term_info)
    if not live_terms:
        return results

    idfs = {t: _idf(m.n_docs, df) for t, (df, _) in term_info.items()}
    tbs = sorted({tb for _, tb in term_info.values()})
    # keep only terms that exist in the index per query
    q_eff = {
        qid: ([t for t in terms if t in term_info], k)
        for qid, (terms, k) in qterms.items()
    }
    q_eff = {qid: v for qid, v in q_eff.items() if v[0]}

    blocks = (
        _read_postings(spark, m, index_dir)
        .filter(F.col("tb").isin(tbs) & F.col("term").isin(live_terms))
    )
    scorer = _make_shard_scorer(
        q_eff,
        idfs,
        m.avgdl,
        m.k1,
        m.b,
        np.array(sorted(m.tombstones), dtype=np.int64),
        use_wand,
    )
    from ..session import python_stage_tuning

    with python_stage_tuning(spark):
        rows = (
            blocks.groupBy("shard")
            .applyInPandas(scorer, schema=RESULT_SCHEMA)
            .collect()
        )
    # driver-side global k-way merge per query (shards are doc-disjoint)
    by_q: dict[int, list[tuple[float, int]]] = defaultdict(list)
    for r in rows:
        by_q[r["query_id"]].append((r["score"], r["doc_id"]))
    for qid, pairs in by_q.items():
        k = qterms[qid][1]
        best = heapq.nsmallest(k, pairs, key=lambda p: (-p[0], p[1]))
        results[qid] = [(d, s) for s, d in best]
    return results


def search(
    spark: SparkSession, index_dir: str, query: str, k: int = 10, use_wand: bool = False
) -> list[tuple[int, float]]:
    return search_many(spark, index_dir, [(0, query, k)], use_wand=use_wand)[0]
