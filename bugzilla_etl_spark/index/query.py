"""BM25 top-k query execution over the segment format.

Lifecycle (SURVEY.md §3.4): tokenize the query with the SAME analyzer
used at build -> driver-side term-dictionary lookup (pyarrow read with
term predicate pushdown, no Spark job) -> ONE Spark fan-out job, one
Python task per (segment, shard-bucket): each task reads its bucket's
posting files directly with pyarrow (directory pruning on ``sb``,
row-group pruning on ``term`` via parquet statistics), decodes each
query term's lists once, scores every query with a bounded top-k heap
(exhaustive-vectorized or block-max WAND) -> k-way merge of per-bucket
top-ks on the driver -> (doc_id, score) top-k, rank-identical to the
exhaustive oracle.

Why Python-native reads: the Arrow JVM->Python block transfer was the
query path's scaling ceiling (JVM stages cap ~2x on this host while
pure-Python scales at the hardware limit); with pyarrow in the worker
the executor is Python end-to-end and Spark is pure task fan-out. On a
cluster the same pyarrow reads hit shared storage (S3/HDFS filesystems
are first-class in pyarrow.dataset).

The per-bucket heap + driver merge is the reference's Sorted Merge
pattern (bugzilla_to_json.ktr:1403-1429) applied to scored results:
buckets are doc-disjoint, so merging never deduplicates.

Scoring determinism: contributions accumulate in sorted term order in
every path (exhaustive numpy, WAND, pure-Python oracle), so scores are
bit-identical across paths and across parallelism levels.
"""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..codec import delta_decode, u64_to_doc_id, varint_decode
from ..oracle import idf as _idf
from ..tokenize import py_analyze
from .manifest import IndexManifest
from .wand import Block, TermCursor, wand_topk

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
    ]
)

#: cost-based execution cutover (measured on a 2M-doc/100-segment
#: index): batches whose estimated posting volume is at or below this
#: run the bucket scorers in a driver-side thread pool — the pyarrow
#: reads dominate selective queries and release the GIL, so 8 rare-term
#: queries answer in 0.21s vs 0.95s through the Spark fan-out (whose
#: task-scheduling floor dwarfs the work). Above it, scoring is
#: numpy-orchestration-heavy (GIL-bound across threads: a 4-hot-query
#: batch measured 60s local vs 2.6s Spark) and the Spark fan-out — the
#: cluster path — engages. The estimate is exact plan-time data: df per
#: term from the dictionary (BM25: sum over query terms; phrase/nested:
#: the rarest term per query, which bounds the candidate volume).
LOCAL_MAX_POSTINGS = int(os.environ.get("SPARK_GRAFT_LOCAL_MAX_POSTINGS", "50000"))
LOCAL_MAX_BUCKETS = int(os.environ.get("SPARK_GRAFT_LOCAL_MAX_BUCKETS", "1024"))

_PD_DTYPE = {"integer": "int32", "long": "int64", "double": "float64",
             "string": "object"}


def _empty_like(schema: T.StructType) -> pd.DataFrame:
    return pd.DataFrame(
        {f.name: pd.Series(dtype=_PD_DTYPE[f.dataType.typeName()]) for f in schema.fields}
    )


def _execute_buckets(
    spark: SparkSession,
    work: list[tuple[str, int]],
    scorer,
    schema: T.StructType,
    est_postings: int,
    execution: str = "auto",
    local_workers: int = 1,
) -> pd.DataFrame:
    """Run one bucket scorer over every (segment, sb) work item.

    ``execution``: "spark" = mapInPandas fan-out (the cluster path),
    "local" = in-driver execution of the SAME scorer callables
    (bit-identical results — the scorer neither knows nor cares which
    harness calls it), "auto" = cost-based pick (see LOCAL_MAX_POSTINGS).

    ``local_workers``: in-driver parallelism, chosen BY THE CALLER from
    what its scorer does. Default 1 = serial: the postings scorers the
    cost gate routes here are Python-object/pyarrow-open overhead, and
    a thread pool is pure GIL thrash (measured on a 16-bucket agg
    request: 0.28 s/call serial vs 0.58 s/call at every pool width
    4-32). GIL-releasing scorers (the kNN matmul path) pass >1
    (measured: 0.12 s at 8 workers vs 0.40 s serial for an 8-query
    batch — numpy/pyarrow drop the GIL, so threads do scale there).
    """
    if execution not in ("auto", "spark", "local"):
        raise ValueError(f"execution must be auto|spark|local: {execution!r}")
    if execution == "local" or (
        execution == "auto"
        and est_postings <= LOCAL_MAX_POSTINGS
        and len(work) <= LOCAL_MAX_BUCKETS
    ):
        if local_workers > 1 and len(work) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                max_workers=min(local_workers, len(work))
            ) as ex:
                parts = [
                    p
                    for p in ex.map(
                        lambda w: scorer((w[0], int(w[1])), None), work
                    )
                    if len(p)
                ]
        else:
            parts = [
                p
                for p in (scorer((w[0], int(w[1])), None) for w in work)
                if len(p)
            ]
        if parts:
            return pd.concat(parts, ignore_index=True)
        return _empty_like(schema)
    return bucket_tasks_df(spark, work, scorer, schema).toPandas()


def bucket_tasks_df(spark: SparkSession, work: list[tuple[str, int]], scorer, schema):
    """Lazy DataFrame of one scorer task per (segment, sb) work item.

    Single-stage shape: ``spark.range`` pinned at one row per partition
    + ``mapInPandas`` — no work-row ``createDataFrame`` (driver->JVM
    conversion alone measured ~0.18 s) and no groupBy exchange, which
    together halve the per-batch job floor vs groupBy+applyInPandas
    (measured 0.25 s vs 0.50 s for a no-op over 16 buckets at
    local[32]). Parallelism is pinned by numPartitions — AQE coalescing
    never sees it (there is no exchange), so CPU-heavy Python tasks
    can't collapse onto too few cores. Composable: callers may attach
    further aggregations before collecting (the nested spark-merge
    paths do)."""
    items = [(w[0], int(w[1])) for w in work]

    def gen(batches):
        for pdf in batches:
            for i in pdf["id"].tolist():
                out = scorer(items[int(i)], None)
                if len(out):
                    yield out

    return spark.range(0, len(items), 1, numPartitions=len(items)).mapInPandas(
        gen, schema=schema
    )


# ----------------------------------------------------- dictionary lookup
def _candidate_dict_dirs(
    m: IndexManifest, index_dir: str, terms: list[str], fld: str = "content"
) -> list[str]:
    """Segments whose dict could contain ANY query term (in the queried
    field), via the per-segment term bloom sidecar (VERDICT r2 #8): the
    driver-side lookup cost stays flat as segment count grows because
    segments containing none of the terms are skipped without touching
    their dict files. Segments without a sidecar (pre-upgrade) are
    always candidates — pruning is pure optimization, never
    correctness. Only the term bitset is read (lazy npz member access,
    mtime-cached) — the docs bitsets in the same sidecar are never
    touched on the query path."""
    from .bloom import hash_field_terms, load_terms_bloom, maybe_contains

    keys = hash_field_terms(fld, terms)
    out = []
    for d in m.segment_dirs(index_dir):
        if not os.path.isdir(os.path.join(d, "dict")):
            continue
        bits = load_terms_bloom(d)
        if bits is None or maybe_contains(bits, keys).any():
            out.append(d)
    return out


def _lookup_terms(
    m: IndexManifest, index_dir: str, terms: list[str], fld: str = "content"
) -> dict[str, int]:
    """term -> df (within the queried field), summed across segments
    (doc-disjoint). Driver-side pyarrow read with a term predicate —
    dict files are term-sorted, so row-group statistics prune; no Spark
    job for a handful of terms. Segment set pre-pruned by the term
    blooms (_candidate_dict_dirs)."""
    import pyarrow.dataset as ds

    if not terms:
        return {}
    paths = [
        os.path.join(d, "dict")
        for d in _candidate_dict_dirs(m, index_dir, terms, fld)
    ]
    if not paths:
        return {}
    # per-path reads (not one union dataset): a pre-multi-field segment
    # has no `field` column — its rows ARE the primary 'content' field
    # (the only field that existed then), so it joins the lookup only
    # for fld=='content' and with the field clause dropped. Mixing
    # legacy and current segments in one index stays queryable.
    parts = []
    for p in paths:
        data = ds.dataset(p, format="parquet")
        flt = ds.field("term").isin(terms)
        if "field" in data.schema.names:
            flt = flt & (ds.field("field") == fld)
        elif fld != "content":
            continue
        parts.append(data.to_table(filter=flt, columns=["term", "df"]).to_pandas())
    if not parts:
        return {}
    pdf = pd.concat(parts, ignore_index=True)
    if pdf.empty:
        return {}
    return pdf.groupby("term")["df"].sum().astype(int).to_dict()


# ------------------------------------------------------ bucket executor
class _LazyTermList:
    """Per-term block store with lazy per-block decode + cache.

    The vectorized MaxScore path decodes a hot term's block ONLY when it
    contains a candidate doc; decoded blocks are cached so the 64-query
    batch shares work."""

    __slots__ = ("idf", "firsts", "lasts", "bmaxs", "gaps", "tfs", "dls",
                 "n_postings", "_cache", "k1", "b", "avgdl")

    def __init__(self, idf, k1, b, avgdl):
        self.idf, self.k1, self.b, self.avgdl = idf, k1, b, avgdl
        self.firsts, self.lasts, self.bmaxs = [], [], []
        self.gaps, self.tfs, self.dls = [], [], []
        self.n_postings = 0
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def add_block(self, first_u64, last_u64, bmax, gaps, tfs, dls, n):
        self.firsts.append(first_u64)
        self.lasts.append(last_u64)
        self.bmaxs.append(bmax)
        self.gaps.append(gaps)
        self.tfs.append(tfs)
        self.dls.append(dls)
        self.n_postings += n

    def seal(self):
        order = np.argsort(np.array(self.firsts, dtype=np.uint64), kind="stable")
        self.firsts = np.array(self.firsts, dtype=np.uint64)[order]
        self.lasts = np.array(self.lasts, dtype=np.uint64)[order]
        self.bmaxs = np.array(self.bmaxs, dtype=np.float64)[order]
        self.gaps = [self.gaps[i] for i in order]
        self.tfs = [self.tfs[i] for i in order]
        self.dls = [self.dls[i] for i in order]

    @property
    def ub(self) -> float:
        return float(self.idf * self.bmaxs.max())

    def _decode(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(i)
        if hit is not None:
            return hit
        d = delta_decode(varint_decode(self.gaps[i]))
        tf = varint_decode(self.tfs[i]).astype(np.float64)
        dl = varint_decode(self.dls[i]).astype(np.float64)
        imp = self.idf * (
            tf * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )
        self._cache[i] = (d, imp)
        return d, imp

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        parts = [self._decode(i) for i in range(len(self.firsts))]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def contributions_at(self, cand_u64: np.ndarray) -> np.ndarray:
        """Exact contribution of this term at each candidate (0 when the
        doc is not in the list); decodes only overlapping blocks."""
        out = np.zeros(len(cand_u64), dtype=np.float64)
        # block index potentially containing each candidate
        bi = np.searchsorted(self.firsts, cand_u64, side="right") - 1
        ok = (bi >= 0) & (cand_u64 <= self.lasts[np.clip(bi, 0, None)])
        for i in np.unique(bi[ok]):
            sel = np.flatnonzero(ok & (bi == i))
            docs, imps = self._decode(int(i))
            pos = np.searchsorted(docs, cand_u64[sel])
            pos = np.clip(pos, 0, len(docs) - 1)
            hit = docs[pos] == cand_u64[sel]
            out[sel[hit]] = imps[pos[hit]]
        return out


#: a term is "hot" in a bucket when its list exceeds this many postings;
#: hot lists are only block-decoded where candidates live (exact MaxScore)
HOT_POSTINGS = 4096


def _resolve_allowed(
    index_dir: str,
    seg_id: str,
    sb: int,
    predicate: list | None,
    n_shards: int,
    n_sb: int,
) -> np.ndarray | None:
    """Docs-dimension conjunction -> sorted allowed-doc u64 set for one
    bucket, resolved INSIDE the task (filter pushed to parquet row-group
    statistics, one column read). None = unfiltered; empty array = no
    doc in this bucket can match. Shared by the BM25 and phrase scorers
    — the reference combines analyzed match with not_analyzed term
    filters on every query shape (bug_version.json:57-65,221-224)."""
    if predicate is None:
        return None
    import pyarrow.dataset as ds

    from ..codec import doc_id_to_u64
    from .predicate import to_arrow

    docs_ds = ds.dataset(
        os.path.join(index_dir, "segments", seg_id, "docs"),
        format="parquet",
        partitioning="hive",
    )
    # the docs dim is not laid out by sb; the shard column is, and
    # sb = shard % n_sb, so an isin on the bucket's shards prunes row
    # groups via parquet stats
    bucket_shards = [s for s in range(n_shards) if s % n_sb == sb]
    ids = docs_ds.to_table(
        filter=to_arrow(predicate) & ds.field("shard").isin(bucket_shards),
        columns=["doc_id"],
    )["doc_id"].to_numpy()
    if len(ids) == 0:
        return ids.astype(np.uint64)
    return np.sort(doc_id_to_u64(np.ascontiguousarray(ids)))


def _make_bucket_scorer(
    index_dir: str,
    queries: dict[int, tuple[list[str], int]],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    use_wand: bool,
    seg_bound_scale: dict[str, float] | None = None,
    fld: str = "content",
    predicate: list | None = None,
    n_shards: int = 0,
    n_sb: int = 0,
    neg_terms: list[str] | None = None,
):
    """One work item = (segment_id, sb): read -> lazily decode -> score
    all queries (vectorized exact MaxScore) -> per-query top-k rows.

    ``neg_terms``: ES ``bool.must_not`` text terms — docs containing ANY
    of them are excluded from every query's results. Resolved per bucket
    by decoding the negative terms' doc lists (df-bounded — a hot
    negative term costs its list, exactly as in ES) and merging them
    into the tombstone exclusion set; like ES's filter context, the
    exclusion does NOT perturb the positive terms' statistics.

    ``seg_bound_scale``: per-segment factor applied to stored block
    max_impact bounds. Bounds are baked with the segment's BUILD-time
    avgdl; if the manifest avgdl has since risen (incremental updates /
    deletes), true impacts exceed stored bounds by at most
    avgdl_now/avgdl_build (the dl→∞, tf→min limit of the impact ratio),
    so scaling by max(1, that ratio) keeps every pruning path sound.
    Exact scores are unaffected (recomputed from tf/dl at decode).

    ``predicate``: docs-dimension conjunction (see index.predicate)
    resolved INSIDE the task against this bucket's slice of the docs
    parquet (filter pushed to row-group statistics, one column read)
    into a sorted allowed-doc set applied before every top-k heap —
    filtered search stays exact with zero driver-side work."""
    neg = sorted(set(neg_terms or ()))
    live_terms = sorted(set(idfs) | set(neg))
    empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
        {"query_id": "int32", "doc_id": "int64", "score": "float64"}
    )

    def score(key, _pdf):  # (key, pd.DataFrame) -> pd.DataFrame
        import pyarrow.dataset as ds

        seg_id, sb = key[0], int(key[1])
        allowed = _resolve_allowed(index_dir, seg_id, sb, predicate, n_shards, n_sb)
        if allowed is not None and not len(allowed):
            return empty.copy()
        bscale = (seg_bound_scale or {}).get(seg_id, 1.0)
        path = os.path.join(index_dir, "segments", seg_id, "postings")
        data = ds.dataset(path, format="parquet", partitioning="hive")
        flt = (ds.field("sb") == sb) & ds.field("term").isin(live_terms)
        # legacy segment (pre-field-column): its postings ARE the
        # primary 'content' field — no field clause; other fields
        # can't match it at all
        has_field = "field" in data.schema.names
        if has_field:
            flt = flt & (ds.field("field") == fld)
        elif fld != "content":
            return pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
                {"query_id": "int32", "doc_id": "int64", "score": "float64"}
            )
        tbl = data.to_table(
            filter=flt,
            columns=["term", "salt", "shard", "n", "first_doc", "last_doc",
                     "max_impact", "gaps", "tfs", "dls"],
        )
        if tbl.num_rows == 0:
            return empty.copy()
        pdf = tbl.to_pandas()

        lists: dict[str, dict[tuple[int, int], _LazyTermList]] = {}
        by_term_sub: dict[tuple[str, int, int], list[Block]] = defaultdict(list)
        for t, s, sh, n, fd, ld, mi, g, tf, dl in zip(
            pdf["term"], pdf["salt"], pdf["shard"], pdf["n"], pdf["first_doc"],
            pdf["last_doc"], pdf["max_impact"], pdf["gaps"], pdf["tfs"], pdf["dls"],
        ):
            fu = np.int64(fd).view(np.uint64)
            lu = np.int64(ld).view(np.uint64)
            if use_wand:
                by_term_sub[(t, int(s), int(sh))].append(
                    Block(first=fu, last=lu, max_impact=float(mi) * bscale,
                          gaps=bytes(g), tfs=bytes(tf), dls=bytes(dl))
                )
            else:
                # one lazy list per (term, salt, shard): one sb holds
                # n_shards/n_sb shards, and both salted and sharded
                # sub-lists have OVERLAPPING doc ranges — the sorted
                # non-overlap invariant of contributions_at/seek only
                # holds WITHIN a single (salt, shard) sub-list
                subs = lists.setdefault(t, {})
                key2 = (int(s), int(sh))
                tl = subs.get(key2)
                if tl is None:
                    # .get: negative (must_not) terms carry no idf — their
                    # lists are decoded for doc ids only, never scored
                    tl = subs[key2] = _LazyTermList(idfs.get(t, 0.0), k1, b, avgdl)
                tl.add_block(
                    fu, lu, float(mi) * bscale, bytes(g), bytes(tf), bytes(dl), int(n)
                )
        for subs in lists.values():
            for tl in subs.values():
                tl.seal()

        # must_not: decode the negative terms' doc lists once per bucket
        # and fold them into the tombstone exclusion set (identical
        # semantics: excluded from results, stats untouched)
        excl = tombstones
        if neg:
            neg_parts: list[np.ndarray] = []
            for t in neg:
                for tl in (lists.get(t) or {}).values():
                    neg_parts.append(tl.decode_all()[0])
                for (bt, _sa, _sh), bl in by_term_sub.items():
                    if bt == t:
                        for blk in bl:
                            neg_parts.append(
                                delta_decode(varint_decode(blk.gaps))
                            )
            if neg_parts:
                neg_i64 = u64_to_doc_id(np.concatenate(neg_parts))
                excl = np.union1d(tombstones, neg_i64)

        out_q, out_d, out_s = [], [], []
        pos_lists = {t: s for t, s in lists.items() if t not in neg}
        pos_subs = {
            k2: v for k2, v in by_term_sub.items() if k2[0] not in neg
        }
        present_terms = set(pos_lists) or {ts[0] for ts in pos_subs}
        for qid, (terms, k) in queries.items():
            present = sorted(present_terms & set(terms))
            if not present:
                continue
            if use_wand:
                topk = _score_wand(
                    present, pos_subs, idfs, avgdl, k1, b, excl, k,
                    allowed,
                )
            else:
                topk = _score_maxscore(present, pos_lists, excl, k, allowed)
            for d, s in topk:
                out_q.append(qid)
                out_d.append(d)
                out_s.append(s)
        return pd.DataFrame(
            {"query_id": out_q, "doc_id": out_d, "score": out_s}
        )

    return score


def _term_postings(subs: dict[int, _LazyTermList]) -> int:
    return sum(tl.n_postings for tl in subs.values())


def _term_ub(subs: dict[int, _LazyTermList]) -> float:
    # a doc lives in exactly one salt sub-list per term, so the term's
    # per-doc upper bound is the MAX over sub-lists
    return max(tl.ub for tl in subs.values())


def _term_decode_all(subs: dict[int, _LazyTermList]) -> tuple[np.ndarray, np.ndarray]:
    parts = [subs[s].decode_all() for s in sorted(subs)]
    return (
        np.concatenate([p[0] for p in parts]),
        np.concatenate([p[1] for p in parts]),
    )


def _term_contributions_at(
    subs: dict[int, _LazyTermList], cand_u64: np.ndarray
) -> np.ndarray:
    out = np.zeros(len(cand_u64), dtype=np.float64)
    for s in sorted(subs):
        out += subs[s].contributions_at(cand_u64)
    return out


def _allowed_mask(cand_u64: np.ndarray, allowed_u64: np.ndarray) -> np.ndarray:
    """Membership of candidates in the sorted allowed set (searchsorted
    probe — O(n log m), no hashing)."""
    if not len(cand_u64):
        return np.zeros(0, dtype=bool)
    pos = np.clip(np.searchsorted(allowed_u64, cand_u64), 0, len(allowed_u64) - 1)
    return allowed_u64[pos] == cand_u64


def _score_maxscore(
    terms: list[str],
    lists: dict[str, dict[int, _LazyTermList]],
    tombstones: np.ndarray,
    k: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k with hot-list block skipping (vectorized MaxScore).

    Selective terms (small lists) are fully decoded and their doc union
    is the candidate set; hot terms contribute only at candidate docs
    (per-block lazy decode, cached across the query batch). If the hot
    terms' combined upper bound could still reach the kth candidate
    score, or candidates are fewer than k, or tombstones intersect the
    candidates, fall back to full exhaustive scoring — the result is
    ALWAYS exact; pruning is pure optimization.

    ``allowed`` (sorted u64, filtered search): docs outside the set are
    dropped from every candidate stream BEFORE the heap, so the top-k is
    exact over the filtered doc space — never over-fetch-then-filter.
    Block-skipping stays sound: block upper bounds bound any doc in the
    block, allowed or not, so stopping when bound < theta(allowed
    candidates) can never drop an allowed doc."""
    sel = [t for t in terms if _term_postings(lists[t]) <= HOT_POSTINGS]
    hot = [t for t in terms if _term_postings(lists[t]) > HOT_POSTINGS]
    if len(terms) == 1 and hot and not tombstones.size and allowed is None:
        return _score_single_hot(lists[terms[0]], k)
    if hot and not sel:
        # ALL terms hot ("return int"): impact-ordered multi-term scorer
        return _score_multi_hot(terms, lists, tombstones, k, allowed)
    if sel and hot:
        cand = np.unique(
            np.concatenate([_term_decode_all(lists[t])[0] for t in sel])
        )
        if allowed is not None:
            cand = cand[_allowed_mask(cand, allowed)]
        acc = np.zeros(len(cand), dtype=np.float64)
        for t in terms:  # sorted order -> deterministic, oracle-identical sums
            acc += _term_contributions_at(lists[t], cand)
        theta = (
            float(-np.partition(-acc, k - 1)[k - 1])
            if len(cand) >= k
            else -np.inf
        )
        # clamp at 0: negative-idf terms (df > live N after deletes)
        # bound docs that CONTAIN them; absent docs contribute 0
        hot_ub = sum(max(0.0, _term_ub(lists[t])) for t in hot)
        if hot_ub < theta:
            docs_i64 = u64_to_doc_id(cand)
            if tombstones.size and np.isin(docs_i64, tombstones).any():
                # tombstoned candidates could re-open the top-k for
                # hot-only docs; be conservative
                return _score_full(terms, lists, tombstones, k, allowed)
            kk = min(k, len(cand))
            cidx = np.flatnonzero(-acc <= -theta)
            order = np.lexsort((docs_i64[cidx], -acc[cidx]))[:kk]
            pick = cidx[order]
            return list(zip(docs_i64[pick].tolist(), acc[pick].tolist()))
        # selective candidates couldn't rule the hot terms out: the
        # multi-hot scorer still skips low-impact hot blocks
        return _score_multi_hot(terms, lists, tombstones, k, allowed)
    return _score_full(terms, lists, tombstones, k, allowed)


def _score_multi_hot(
    terms: list[str],
    lists: dict[str, dict[tuple[int, int], _LazyTermList]],
    tombstones: np.ndarray,
    k: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact multi-term top-k with impact-ordered early termination —
    the generalization of _score_single_hot to >= 2 (hot) terms.

    Blocks of ALL terms are processed in globally descending
    idf*block_max order (which is also per-term descending). Docs seen
    in any processed block become candidates and get their EXACT score
    (contributions from every term, lazily decoding only blocks that
    contain candidates). A doc never seen is bounded by
    sum_t (next unprocessed block bound of t) — per-term descending
    order makes that the term's remaining maximum. Once that bound
    falls strictly below the kth candidate score, no unseen doc can
    enter the top-k and iteration stops; remaining blocks are never
    decoded.

    Exactness: candidate scores are exact (same sorted-term
    accumulation as the exhaustive path); the unseen-doc bound is
    summed left-to-right in the same sorted term order, so rounding
    monotonicity gives bound >= score bit-wise; the stop test is
    strict, so exact ties at theta are always materialized and the
    (score desc, doc_id asc) tie-break matches the oracle."""
    entries: list[tuple[float, str, tuple[int, int], int]] = []
    per_term_bounds: dict[str, list[float]] = {}
    for t in terms:
        subs = lists[t]
        tb = []
        for skey in sorted(subs):
            tl = subs[skey]
            for i in range(len(tl.firsts)):
                b = float(tl.idf * tl.bmaxs[i])
                entries.append((b, t, skey, i))
                tb.append(b)
        tb.sort(reverse=True)
        per_term_bounds[t] = tb
    entries.sort(key=lambda e: (-e[0], e[1], e[2], e[3]))

    n_proc = dict.fromkeys(terms, 0)
    seen = np.empty(0, dtype=np.uint64)  # sorted union of processed docs
    cand_docs: list[np.ndarray] = []     # non-tombstoned candidates
    cand_scores: list[np.ndarray] = []
    n_cand = 0
    theta = -np.inf
    pos = 0
    CHUNK = 16
    while pos < len(entries):
        if n_cand >= k:
            rem = 0.0
            for t in terms:  # sorted term order == score accumulation order
                pb = per_term_bounds[t]
                np_t = n_proc[t]
                # clamped: an unseen doc absent from a negative-idf term
                # scores 0 from it, above that term's (negative) bound
                b_t = pb[np_t] if np_t < len(pb) else 0.0
                rem += b_t if b_t > 0.0 else 0.0
            if rem < theta:
                break
        new_parts = []
        for bound, t, skey, i in entries[pos : pos + CHUNK]:
            d, _ = lists[t][skey]._decode(i)
            new_parts.append(d)
            n_proc[t] += 1
        pos += CHUNK
        nd = np.unique(np.concatenate(new_parts))
        if seen.size:
            at = np.searchsorted(seen, nd)
            at = np.clip(at, 0, len(seen) - 1)
            nd = nd[seen[at] != nd]
        if nd.size:
            # linear sorted-merge append (nd is sorted and disjoint from
            # seen): np.insert at searchsorted positions is one O(n+m)
            # pass, where the old per-chunk union1d re-sorted the whole
            # union — quadratic-ish across chunks for many-hot-term
            # queries (ADVICE r3)
            seen = np.insert(seen, np.searchsorted(seen, nd), nd)
            if tombstones.size:
                nd = nd[~np.isin(u64_to_doc_id(nd), tombstones)]
            if allowed is not None and nd.size:
                # filtered search: disallowed docs never become
                # candidates; the unseen-doc bound covers a superset of
                # the allowed unseen docs, so early stop stays sound
                nd = nd[_allowed_mask(nd, allowed)]
        if nd.size:
            acc = np.zeros(len(nd), dtype=np.float64)
            for t in terms:  # sorted term order -> oracle-identical sums
                acc += _term_contributions_at(lists[t], nd)
            cand_docs.append(nd)
            cand_scores.append(acc)
            n_cand += len(nd)
            if n_cand >= k:
                allsc = np.concatenate(cand_scores)
                theta = float(-np.partition(-allsc, k - 1)[k - 1])
    if not cand_docs:
        return []
    docs_i64 = u64_to_doc_id(np.concatenate(cand_docs))
    acc = np.concatenate(cand_scores)
    kk = min(k, len(acc))
    kth = np.partition(-acc, kk - 1)[kk - 1]
    cidx = np.flatnonzero(-acc <= kth)
    order = np.lexsort((docs_i64[cidx], -acc[cidx]))[:kk]
    pick = cidx[order]
    return list(zip(docs_i64[pick].tolist(), acc[pick].tolist()))


def _score_single_hot(
    subs: dict[int, _LazyTermList], k: int
) -> list[tuple[int, float]]:
    """Exact single-term top-k with impact-ordered early termination:
    blocks (across salt sub-lists) are processed in descending
    block-max-impact order; once the kth best score can no longer be
    beaten by any unprocessed block (strict bound, ties processed),
    the remaining blocks are never decoded."""
    entries = [
        (float(subs[s].idf * subs[s].bmaxs[i]), s, i)
        for s in subs
        for i in range(len(subs[s].firsts))
    ]
    entries.sort(key=lambda e: -e[0])
    docs_parts: list[np.ndarray] = []
    imp_parts: list[np.ndarray] = []
    theta = -np.inf
    n_seen = 0
    pos = 0
    CHUNK = 8
    while pos < len(entries):
        ub_next = entries[pos][0]
        if n_seen >= k and ub_next < theta:
            break  # strict: equal-bound blocks still processed (ties)
        for ub, s, i in entries[pos : pos + CHUNK]:
            if n_seen >= k and ub < theta:
                break
            d, imp = subs[s]._decode(i)
            docs_parts.append(d)
            imp_parts.append(imp)
            n_seen += len(d)
        pos += CHUNK
        if n_seen >= k:
            allimp = np.concatenate(imp_parts)
            theta = float(np.partition(-allimp, k - 1)[k - 1] * -1)
    if not docs_parts:
        return []
    docs = u64_to_doc_id(np.concatenate(docs_parts))
    imps = np.concatenate(imp_parts)
    kk = min(k, len(imps))
    kth = np.partition(-imps, kk - 1)[kk - 1]
    cand = np.flatnonzero(-imps <= kth)
    order = np.lexsort((docs[cand], -imps[cand]))[:kk]
    pick = cand[order]
    return list(zip(docs[pick].tolist(), imps[pick].tolist()))


def _score_full(
    terms: list[str],
    lists: dict[str, dict[int, _LazyTermList]],
    tombstones: np.ndarray,
    k: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    decoded = {t: _term_decode_all(lists[t]) for t in terms}
    return _score_decoded(terms, decoded, tombstones, k, allowed)


def _score_decoded(
    terms: list[str],
    decoded: dict[str, tuple[np.ndarray, np.ndarray]],
    tombstones: np.ndarray,
    k: int,
    allowed: np.ndarray | None = None,
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
    if allowed is not None:
        keep_a = _allowed_mask(uniq, allowed)
        uniq, acc = uniq[keep_a], acc[keep_a]
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
    by_term_sub: dict,
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    k: int,
    allowed: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    # one cursor per (term, salt, shard) sub-list: blocks only satisfy
    # the sorted non-overlap invariant within a single sub-list.
    # Tombstones and predicate sets are heap-insertion gates inside
    # wand_topk (exact over the filtered doc space, no over-fetch).
    cursors = [
        TermCursor(t, s, idfs[t], blocks, k1, b, avgdl)
        for (t, s, _sh), blocks in sorted(by_term_sub.items())
        if t in terms
    ]
    banned = (
        np.sort(tombstones.astype(np.int64).view(np.uint64))
        if tombstones.size
        else None
    )
    return wand_topk(cursors, k, allowed=allowed, banned=banned)


# -------------------------------------------------------------- fan-out
def search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    use_wand: bool = False,
    field: str = "content",
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
    operator: str = "or",
    min_should_match: int | None = None,
    should: list[str] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """Batch top-k: [(query_id, text, k)] -> {query_id: [(doc_id, score)]}.

    ``should``: ES bool {must, should} score-boosting terms — only
    meaningful with a gating clause (operator="and" or
    min_should_match): matching is unchanged, but a surviving doc
    containing a should term adds its BM25 contribution.

    ``operator``: ES match semantics — "or" (default): any query term
    matches, scored by the matching terms' BM25 sum; "and": EVERY term
    must occur in the doc (the ES ``match`` with ``operator: and``),
    scored by the same constituent sum (AND only shrinks the match
    set, never changes a surviving doc's score).

    ``min_should_match``: ES minimum_should_match (operator="or" only)
    — at least m of the query's terms must occur; surviving docs keep
    their should-semantics scores. m=1 is plain OR; m=len(terms) is
    AND; a query with fewer matchable terms than m returns nothing.

    ``must_not``: ES bool.must_not text terms (analyzed with the field's
    chain), applied to EVERY query in the batch: a doc containing any of
    them never appears in results; positive-term statistics are
    untouched (filter-context semantics, like ``predicate``).

    One Spark job: a (segment, sb) fan-out scored in Python workers;
    the driver k-way merges the per-bucket bounded heaps per query.
    Selective batches (plan-time df sum under LOCAL_MAX_POSTINGS) skip
    the fan-out and run the same scorers in a driver thread pool when
    ``execution="auto"`` (see _execute_buckets).

    ``field`` selects a field variant of a multi-field index (the
    reference's per-sub-field querying, bug_version.json:294-303): the
    query text is analyzed with THAT field's chain and scored against
    its postings/df/avgdl.

    ``predicate`` restricts scoring to docs matching a docs-dimension
    conjunction (see ``index.predicate``) — the reference's combined
    term-filter + fulltext query (ES filter context,
    bug_version.json:57-65,221-224). Applied per bucket BEFORE the
    top-k heap, so the k results are exact over the filtered doc space;
    BM25 statistics stay index-global, matching ES semantics. Both
    scorer families support it: the MaxScore family filters candidate
    streams, WAND gates heap insertion (wand.py) — no over-fetch in
    either path.
    """
    if operator not in ("or", "and"):
        raise ValueError(f"operator must be 'or' or 'and': {operator!r}")
    if min_should_match is not None:
        if operator == "and":
            raise ValueError(
                "min_should_match applies to operator='or' (AND already "
                "requires every term)"
            )
        if int(min_should_match) < 1:
            raise ValueError("min_should_match must be >= 1")
        # msm=1 normalizes to plain OR (pruned scorers) — EXCEPT when
        # should-boost terms ride on it: an explicitly-passed msm=1 is a
        # valid ES gating clause (ADVICE r5), and the boost contributions
        # only apply on the conjunctive/msm executor, so keep msm=1 there
        if int(min_should_match) == 1 and not should:
            min_should_match = None  # plain OR: keep the pruned scorers
    if should and operator != "and" and min_should_match is None:
        raise ValueError(
            "should terms boost scores alongside a gating clause - use "
            "operator='and' or min_should_match (plain OR already scores "
            "every query term)"
        )
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    if predicate is not None:
        from .predicate import validate, validate_types

        validate(predicate)
        # typed doc_attrs mapping (VERDICT r4 #6): literal/column type
        # coherence checked up front; legacy indexes (no recorded
        # types) skip the attr checks but still reject unknown columns
        validate_types(
            predicate, m.doc_attr_types,
            legacy_attrs=m.doc_attrs if not m.doc_attr_types else None,
        )
    # the query is analyzed with the FIELD's chain (same-analyzer contract
    # as the reference ES mapping): a shingled field analyzes "hash table"
    # to [hash, table, hash_table] — phrase-ish matching for free
    chain = m.field_chain(field)
    # a query's text may be a pre-analyzed TERM LIST (internal callers:
    # prefix expansion — dict terms are post-analysis tokens and must
    # not round-trip the analyzer, which could re-split them)
    qterms = {
        int(qid): (
            sorted(set(text))
            if isinstance(text, (list, tuple))
            else sorted(set(py_analyze(text, chain))),
            int(k),
        )
        for qid, text, k in queries
    }
    # negative terms analyzed with the SAME chain; absent ones are no-ops
    neg_raw = sorted(
        {t for q in (must_not or ()) for t in py_analyze(q, chain)}
    )
    all_terms = sorted({t for terms, _ in qterms.values() for t in terms})
    dfs = _lookup_terms(m, index_dir, all_terms, field)
    results: dict[int, list[tuple[int, float]]] = {qid: [] for qid in qterms}
    if not dfs:
        return results
    neg_dfs = _lookup_terms(m, index_dir, neg_raw, field) if neg_raw else {}
    neg_eff = sorted(set(neg_raw) & set(neg_dfs))
    boost_raw = sorted({t for q in (should or ()) for t in py_analyze(q, chain)})
    boost_dfs = _lookup_terms(m, index_dir, boost_raw, field) if boost_raw else {}
    boost_eff = sorted(set(boost_raw) & set(boost_dfs))

    idfs = {t: _idf(m.n_docs, df) for t, df in dfs.items()}
    idfs.update({t: _idf(m.n_docs, df) for t, df in boost_dfs.items()})
    if operator == "and":
        # a query with ANY absent term can't match at all
        q_eff = {
            qid: (terms, k)
            for qid, (terms, k) in qterms.items()
            if terms and all(t in dfs for t in terms)
        }
    else:
        q_eff = {
            qid: ([t for t in terms if t in dfs], k)
            for qid, (terms, k) in qterms.items()
        }
        q_eff = {qid: v for qid, v in q_eff.items() if v[0]}
        if min_should_match is not None:
            # fewer matchable terms than m: nothing can satisfy the gate
            q_eff = {
                qid: v
                for qid, v in q_eff.items()
                if len(v[0]) >= int(min_should_match)
            }
    if not q_eff:
        return results

    # fan-out pruned by the term blooms: a segment containing none of
    # the effective query terms gets no scoring tasks at all (flat cost
    # in segment count for selective queries)
    work = [
        (os.path.basename(d), sb)
        for d in _candidate_dict_dirs(m, index_dir, sorted(dfs), field)
        for sb in range(m.n_sb)
    ]
    # Segments lacking a stored build avgdl for this field (pre-upgrade
    # manifests) get an infinite bound scale: every block bound becomes
    # +inf, which DISABLES pruning for that segment (all blocks decoded,
    # scores exact) instead of silently assuming no drift — assuming 1.0
    # would resurface the avgdl-drift unsoundness for legacy segments
    # after incremental updates raise the global avgdl.
    cur_avgdl = m.field_avgdl(field)

    def _scale(s: dict) -> float:
        built = (s.get("field_avgdl") or {}).get(field)
        if built is None and field == "content":
            built = s.get("avgdl")
        return max(1.0, cur_avgdl / float(built)) if built else float("inf")

    seg_bound_scale = {s["id"]: _scale(s) for s in m.segments}
    tomb = np.array(sorted(m.tombstones), dtype=np.int64)
    if operator == "and" or min_should_match is not None:
        msm_val = None if operator == "and" else int(min_should_match)
        scorer = _make_conjunctive_bucket_scorer(
            index_dir, q_eff, idfs, cur_avgdl, m.k1, m.b, tomb, field,
            predicate, m.n_shards, m.n_sb, neg_eff, msm_val, boost_eff,
        )
        # candidate volume: AND = the rarest term; msm = the
        # (n - m + 1) rarest terms' df sum (the generator union)
        if msm_val is None:
            est = sum(min(dfs[t] for t in terms) for terms, _ in q_eff.values())
        else:
            est = sum(
                sum(sorted(dfs[t] for t in terms)[: len(terms) - msm_val + 1])
                for terms, _ in q_eff.values()
            )
    else:
        scorer = _make_bucket_scorer(
            index_dir,
            q_eff,
            idfs,
            cur_avgdl,
            m.k1,
            m.b,
            tomb,
            use_wand,
            seg_bound_scale,
            field,
            predicate,
            m.n_shards,
            m.n_sb,
            neg_eff,
        )
        # should-semantics BM25 scores EVERY posting of every query term:
        # the batch's work is the per-query df sum
        est = sum(dfs[t] for terms, _ in q_eff.values() for t in terms)
    est += sum(neg_dfs[t] for t in neg_eff)
    pdf = _execute_buckets(spark, work, scorer, RESULT_SCHEMA, est, execution)
    # driver-side global k-way merge per query (buckets are doc-disjoint):
    # one vectorized Arrow collect + one lexicographic sort, NOT a Python
    # loop over rows — the merge is the only serial stage of the batch,
    # so it must stay O(rows log rows) vectorized to preserve scaling
    if len(pdf):
        pdf = pdf.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True]
        )
        for qid, grp in pdf.groupby("query_id", sort=False):
            k = qterms[int(qid)][1]
            results[int(qid)] = list(
                zip(grp["doc_id"].tolist()[:k], grp["score"].tolist()[:k])
            )
    return results


def _expand_prefix(
    m: IndexManifest,
    index_dir: str,
    prefix: str,
    fld: str,
    max_expansions: int,
) -> list[str]:
    """Dictionary range scan: analyzed terms starting with ``prefix``,
    capped at ``max_expansions`` picked by HIGHEST df (ties: term asc) —
    Lucene's top-terms multi-term rewrite. One driver-side pyarrow read
    per segment with the range pushed to parquet statistics (dict files
    are term-sorted)."""
    import pyarrow.dataset as ds

    from .predicate import _prefix_upper

    up = _prefix_upper(prefix)
    parts = []
    for d in m.segment_dirs(index_dir):
        dict_dir = os.path.join(d, "dict")
        if not os.path.isdir(dict_dir):
            continue
        data = ds.dataset(dict_dir, format="parquet")
        flt = ds.field("term") >= prefix
        if up is not None:
            flt = flt & (ds.field("term") < up)
        if "field" in data.schema.names:
            flt = flt & (ds.field("field") == fld)
        elif fld != "content":
            continue
        parts.append(data.to_table(filter=flt, columns=["term", "df"]))
    return _rank_expansions(parts, max_expansions)


def _wildcard_regex(pattern: str):
    """ES wildcard -> compiled regex: ``*`` = any run, ``?`` = any one
    char, everything else literal (ES supports no other metachars)."""
    import re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("".join(out) + r"\Z")


def _expand_wildcard(
    m: IndexManifest,
    index_dir: str,
    pattern: str,
    fld: str,
    max_expansions: int,
) -> list[str]:
    """ES ``wildcard`` term expansion: the pattern's literal prefix
    (text before the first ``*``/``?``) prunes the dictionary range
    scan exactly like _expand_prefix, survivors are regex-verified
    vectorized, and the winners are the ``max_expansions`` highest-df
    terms (Lucene top-terms multi-term rewrite, ties term asc). A
    leading-wildcard pattern scans the full dictionary — the same
    documented cost as ES's leading-wildcard queries (and fuzzy
    prefix_length=0)."""
    import pyarrow.dataset as ds

    from .predicate import _prefix_upper

    lead = min(
        (pattern.index(c) for c in "*?" if c in pattern), default=len(pattern)
    )
    prefix = pattern[:lead]
    if lead == len(pattern):
        # no metachar: degenerate to an exact term lookup
        dfs = _lookup_terms(m, index_dir, [pattern], fld)
        return [pattern] if pattern in dfs else []
    rx = _wildcard_regex(pattern)
    # length lower bound: every literal char must appear
    min_len = sum(1 for c in pattern if c != "*")
    return _expand_matching(m, index_dir, prefix, rx, min_len, fld,
                            max_expansions)


def _expand_matching(
    m: IndexManifest,
    index_dir: str,
    prefix: str,
    rx,
    min_len: int,
    fld: str,
    max_expansions: int,
) -> list[str]:
    """Shared multi-term expansion: a literal-prefix dictionary range
    scan (parquet statistics; full dictionary when the prefix is
    empty), a vectorized length-band pre-filter, full-match regex
    verification, then the df-ranked top-terms cut."""
    import pyarrow.dataset as ds

    from .predicate import _prefix_upper

    up = _prefix_upper(prefix) if prefix else None
    parts = []
    for d in m.segment_dirs(index_dir):
        dict_dir = os.path.join(d, "dict")
        if not os.path.isdir(dict_dir):
            continue
        data = ds.dataset(dict_dir, format="parquet")
        flt = None
        if prefix:
            flt = ds.field("term") >= prefix
            if up is not None:
                flt = flt & (ds.field("term") < up)
        if "field" in data.schema.names:
            f_flt = ds.field("field") == fld
            flt = f_flt if flt is None else flt & f_flt
        elif fld != "content":
            continue
        parts.append(data.to_table(filter=flt, columns=["term", "df"]))
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return []
    import pyarrow as pa

    pdf = pa.concat_tables(parts).to_pandas()
    if min_len > 0:
        # vectorized pre-filter (length band) before the per-term regex
        pdf = pdf[pdf["term"].astype(str).str.len() >= min_len]
        if not len(pdf):
            return []
    keep = pdf["term"].astype(str).str.fullmatch(rx)
    pdf = pdf[keep.to_numpy(dtype=bool)]
    if not len(pdf):
        return []
    agg = pdf.groupby("term", sort=False)["df"].sum()
    terms = agg.index.to_numpy()
    dfs = agg.to_numpy()
    order = np.lexsort((terms, -dfs))[:max_expansions]
    return [str(t) for t in terms[order]]


_REGEX_METACHARS = set(".^$*+?{}[]()|\\")


def _expand_regexp(
    m: IndexManifest,
    index_dir: str,
    pattern: str,
    fld: str,
    max_expansions: int,
) -> list[str]:
    """ES ``regexp`` term expansion: anchored full-match regex over the
    dictionary. The pattern's leading literal run (chars before the
    first regex metacharacter) prunes the range scan exactly like
    prefix/wildcard; a pattern starting with a metacharacter scans the
    full dictionary (ES's documented leading-wildcard cost)."""
    import re

    lead = 0
    while lead < len(pattern) and pattern[lead] not in _REGEX_METACHARS:
        lead += 1
    # a trailing quantifier binds the PREVIOUS char: back off one so
    # e.g. "tables?" keeps prefix "table", not "tables"
    if lead < len(pattern) and pattern[lead] in "*?+{" and lead > 0:
        lead -= 1
    # a TOP-LEVEL alternation makes the leading literal optional
    # ("ret.rn|int" must also match "int"): any depth-0 '|' outside a
    # character class voids the prefix — full-dictionary scan
    depth, in_class, esc = 0, False, False
    for ch in pattern:
        if esc:
            esc = False
            continue
        if ch == "\\":
            esc = True
        elif in_class:
            in_class = ch != "]"
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            lead = 0
            break
    try:
        rx = re.compile(pattern)
    except re.error as e:
        raise ValueError(f"bad regexp pattern {pattern!r}: {e}") from None
    return _expand_matching(
        m, index_dir, pattern[:lead], rx, 0, fld, max_expansions
    )


def _rank_expansions(parts: list, max_expansions: int) -> list[str]:
    """Vectorized df-aggregate + top-terms ranking over per-segment
    range-scan results (VERDICT r5 #7: the per-row Python dict loop was
    the expansion cost at 100k-term dictionaries — one arrow concat +
    pandas groupby + lexsort replaces it; 5-10x measured)."""
    import pyarrow as pa

    parts = [p for p in parts if p.num_rows]
    if not parts:
        return []
    pdf = pa.concat_tables(parts).to_pandas()
    agg = pdf.groupby("term", sort=False)["df"].sum()
    terms = agg.index.to_numpy()
    dfs = agg.to_numpy()
    order = np.lexsort((terms, -dfs))[:max_expansions]
    return [str(t) for t in terms[order]]


def _levenshtein(a: str, b: str, cap: int) -> int:
    """Standard Levenshtein (insert/delete/substitute; a transposition
    counts 2 — matches DuckDB's levenshtein()) with an early-out band:
    returns cap+1 as soon as the distance provably exceeds ``cap``."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)
            )
            best = min(best, cur[j])
        if best > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def _fuzzy_scan(
    m: IndexManifest,
    index_dir: str,
    term: str,
    fld: str,
    max_edits: int,
    prefix_length: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dictionary range scan + banded DP -> (candidates, dfs, dists)
    for every unique dictionary term within ``max_edits`` of ``term``
    (sharing its first ``prefix_length`` chars). The scan/band/DP
    discipline of _expand_fuzzy, returning per-candidate distances so
    the term suggester can rank by (distance, df) while fuzzy QUERY
    expansion keeps its df-only ranking."""
    import pyarrow.dataset as ds
    import pyarrow.compute as pc

    from .predicate import _prefix_upper

    pre = term[:prefix_length]
    parts = []
    for d in m.segment_dirs(index_dir):
        dict_dir = os.path.join(d, "dict")
        if not os.path.isdir(dict_dir):
            continue
        data = ds.dataset(dict_dir, format="parquet")
        flt = None
        if pre:
            up = _prefix_upper(pre)
            flt = ds.field("term") >= pre
            if up is not None:
                flt = flt & (ds.field("term") < up)
        if "field" in data.schema.names:
            fc = ds.field("field") == fld
            flt = fc if flt is None else flt & fc
        elif fld != "content":
            continue
        t = data.to_table(filter=flt, columns=["term", "df"])
        if not t.num_rows:
            continue
        # vectorized length band: |len(cand) - len(term)| <= max_edits
        lens = pc.utf8_length(t["term"])
        band = pc.and_(
            pc.greater_equal(lens, len(term) - max_edits),
            pc.less_equal(lens, len(term) + max_edits),
        )
        t = t.filter(band)
        if t.num_rows:
            parts.append(t)
    empty = (
        np.empty(0, dtype=object),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
    )
    if not parts:
        return empty
    import pyarrow as pa

    pdf = pa.concat_tables(parts).to_pandas()
    agg = pdf.groupby("term", sort=False)["df"].sum()
    cands = agg.index.to_numpy()
    # DP only on unique band survivors; the shared prefix adds 0 edits
    suffix = term[len(pre):]
    dists = np.fromiter(
        (
            _levenshtein(str(c)[len(pre):], suffix, max_edits)
            for c in cands
        ),
        dtype=np.int64,
        count=len(cands),
    )
    keep = dists <= max_edits
    return cands[keep], agg.to_numpy()[keep].astype(np.int64), dists[keep]


def _expand_fuzzy(
    m: IndexManifest,
    index_dir: str,
    term: str,
    fld: str,
    max_edits: int,
    prefix_length: int,
    max_expansions: int,
) -> list[str]:
    """Edit-distance term expansion with the ES ``prefix_length``
    discipline: candidates must share the first ``prefix_length``
    characters, so the dictionary read stays a RANGE scan on the
    term-sorted dict files (parquet-stat pushdown) instead of a full
    vocabulary sweep; a length band (±max_edits) prunes before the DP.
    Ranked by highest df (ties term asc) — the same top-terms rewrite
    as prefix queries. ``prefix_length=0`` scans the field's whole
    dictionary (documented cost; Lucene pays an automaton instead).

    Vectorized (VERDICT r5 #7): the dictionary range scan pushes a
    LENGTH BAND (+-max_edits, arrow utf8_length — candidates outside it
    cannot be within max_edits) before any Python touches a row; the
    surviving unique candidates alone run the banded DP, with the
    shared ``prefix_length`` characters stripped first (equal prefixes
    contribute zero edits)."""
    cands, dfs, _dists = _fuzzy_scan(
        m, index_dir, term, fld, max_edits, prefix_length
    )
    if not len(cands):
        return []
    order = np.lexsort((cands, -dfs))[:max_expansions]
    return [str(c) for c in cands[order]]


def fuzzy_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = "content",
    max_edits: int = 1,
    prefix_length: int = 1,
    max_expansions: int = 50,
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """ES ``match`` with ``fuzziness``: every analyzed query term
    expands into its edit-distance-``max_edits`` dictionary neighbors
    (per-term cap ``max_expansions``, ES ``prefix_length`` pruning) and
    the query scores as the should-semantics BM25 sum over the UNION of
    expansions (rewrite: scoring_boolean, consistent with
    prefix_search)."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    chain = m.field_chain(field)
    expanded: list[tuple[int, object, int]] = []
    results: dict[int, list[tuple[int, float]]] = {}
    for qid, text, k in queries:
        results[int(qid)] = []
        terms: list[str] = []
        for t in sorted(set(py_analyze(text, chain))):
            terms.extend(
                _expand_fuzzy(
                    m, index_dir, t, field, max_edits, prefix_length,
                    max_expansions,
                )
            )
        terms = sorted(set(terms))
        if terms:
            expanded.append((int(qid), terms, int(k)))
    if not expanded:
        return results
    results.update(
        search_many(
            spark, index_dir, expanded, field=field, predicate=predicate,
            execution=execution, must_not=must_not,
        )
    )
    return results


def fuzzy_search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    field: str = "content",
    max_edits: int = 1,
    prefix_length: int = 1,
    max_expansions: int = 50,
    predicate: list | None = None,
) -> list[tuple[int, float]]:
    return fuzzy_search_many(
        spark, index_dir, [(0, query, k)], field=field, max_edits=max_edits,
        prefix_length=prefix_length, max_expansions=max_expansions,
        predicate=predicate,
    )[0]


def prefix_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """ES ``prefix`` query over the analyzed field: [(qid, prefix, k)]
    -> top-k. Each prefix expands via a dictionary range scan into at
    most ``max_expansions`` concrete terms (highest-df first — the
    Lucene top-terms rewrite) and scores as their should-semantics BM25
    sum (the ``rewrite: scoring_boolean`` behavior). Composes with
    predicate / must_not / the cost-based execution."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    expanded: list[tuple[int, object, int]] = []
    results: dict[int, list[tuple[int, float]]] = {}
    for qid, prefix, k in queries:
        results[int(qid)] = []
        terms = _expand_prefix(m, index_dir, str(prefix), field, max_expansions)
        if terms:
            expanded.append((int(qid), terms, int(k)))
    if not expanded:
        return results
    out = search_many(
        spark, index_dir, expanded, field=field, predicate=predicate,
        execution=execution, must_not=must_not,
    )
    results.update(out)
    return results


def prefix_search(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    k: int = 10,
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    must_not: list[str] | None = None,
) -> list[tuple[int, float]]:
    return prefix_search_many(
        spark, index_dir, [(0, prefix, k)], field=field,
        max_expansions=max_expansions, predicate=predicate,
        must_not=must_not,
    )[0]


def wildcard_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """ES ``wildcard`` query over the analyzed field: [(qid, pattern,
    k)] -> top-k, where a pattern mixes literals with ``*`` (any run)
    and ``?`` (one char). The pattern's literal prefix prunes a
    dictionary range scan (parquet statistics), survivors are
    regex-verified, and at most ``max_expansions`` terms (highest df
    first — the Lucene top-terms rewrite) score as their
    should-semantics BM25 sum, exactly like prefix/fuzzy (rewrite:
    scoring_boolean). Composes with predicate / must_not / the
    cost-based execution."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    expanded: list[tuple[int, object, int]] = []
    results: dict[int, list[tuple[int, float]]] = {}
    for qid, pattern, k in queries:
        results[int(qid)] = []
        terms = _expand_wildcard(
            m, index_dir, str(pattern), field, max_expansions
        )
        if terms:
            expanded.append((int(qid), terms, int(k)))
    if not expanded:
        return results
    out = search_many(
        spark, index_dir, expanded, field=field, predicate=predicate,
        execution=execution, must_not=must_not,
    )
    results.update(out)
    return results


def wildcard_search(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    k: int = 10,
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    must_not: list[str] | None = None,
) -> list[tuple[int, float]]:
    return wildcard_search_many(
        spark, index_dir, [(0, pattern, k)], field=field,
        max_expansions=max_expansions, predicate=predicate,
        must_not=must_not,
    )[0]


def regexp_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
) -> dict[int, list[tuple[int, float]]]:
    """ES ``regexp`` query over the analyzed field: [(qid, pattern, k)]
    -> top-k, the pattern an ANCHORED full-match regex. The leading
    literal run prunes the dictionary range scan, survivors verify with
    one vectorized fullmatch, and at most ``max_expansions`` terms
    (highest df first) score as their should-semantics BM25 sum —
    exactly the wildcard/prefix/fuzzy rewrite discipline."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    expanded: list[tuple[int, object, int]] = []
    results: dict[int, list[tuple[int, float]]] = {}
    for qid, pattern, k in queries:
        results[int(qid)] = []
        terms = _expand_regexp(
            m, index_dir, str(pattern), field, max_expansions
        )
        if terms:
            expanded.append((int(qid), terms, int(k)))
    if not expanded:
        return results
    out = search_many(
        spark, index_dir, expanded, field=field, predicate=predicate,
        execution=execution, must_not=must_not,
    )
    results.update(out)
    return results


def regexp_search(
    spark: SparkSession,
    index_dir: str,
    pattern: str,
    k: int = 10,
    field: str = "content",
    max_expansions: int = 50,
    predicate: list | None = None,
    must_not: list[str] | None = None,
) -> list[tuple[int, float]]:
    return regexp_search_many(
        spark, index_dir, [(0, pattern, k)], field=field,
        max_expansions=max_expansions, predicate=predicate,
        must_not=must_not,
    )[0]


def explain_search(
    index_dir: str,
    query: str,
    field: str = "content",
    operator: str = "or",
    min_should_match: int | None = None,
    must_not: list[str] | None = None,
) -> dict:
    """Query-plan introspection (no Spark job, no execution): how the
    engine WOULD run this query — analyzed terms and their dictionary
    dfs, the bloom-pruned candidate segment set, the (segment, sb)
    work-item count, the plan-time posting-volume estimate, and the
    execution harness the cost model would pick (driver-local thread
    pool vs Spark fan-out). The observability face of the cost-based
    executor — ES _validate/explain analog."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    chain = m.field_chain(field)
    terms = sorted(set(py_analyze(query, chain)))
    dfs = _lookup_terms(m, index_dir, terms, field)
    neg_raw = sorted({t for q in (must_not or ()) for t in py_analyze(q, chain)})
    neg_dfs = _lookup_terms(m, index_dir, neg_raw, field) if neg_raw else {}
    eff = [t for t in terms if t in dfs]
    cand_dirs = [
        os.path.basename(d)
        for d in _candidate_dict_dirs(m, index_dir, sorted(dfs), field)
    ] if dfs else []
    n_work = len(cand_dirs) * m.n_sb
    if operator == "and" or (min_should_match or 0) >= 2:
        if operator == "and":
            est = min((dfs[t] for t in eff), default=0) if len(eff) == len(terms) else 0
            path = "conjunctive"
        else:
            mv = int(min_should_match)
            est = (
                sum(sorted(dfs[t] for t in eff)[: len(eff) - mv + 1])
                if len(eff) >= mv
                else 0
            )
            path = f"msm({mv})"
    else:
        est = sum(dfs[t] for t in eff)
        path = "should"
    est += sum(neg_dfs.values())
    local = est <= LOCAL_MAX_POSTINGS and n_work <= LOCAL_MAX_BUCKETS
    return {
        "field": field,
        "analyzed_terms": terms,
        "term_dfs": {t: int(dfs.get(t, 0)) for t in terms},
        "must_not_dfs": {t: int(neg_dfs.get(t, 0)) for t in neg_raw},
        "scorer_path": path,
        "candidate_segments": cand_dirs,
        "pruned_segments": len(m.segments) - len(cand_dirs),
        "work_items": n_work,
        "estimated_postings": int(est),
        "execution": "local" if local else "spark",
        "n_docs": m.n_docs,
        "tombstones": len(m.tombstones),
    }


def fetch_docs(
    index_dir: str,
    doc_ids: list[int],
    columns: list[str] | None = None,
) -> pd.DataFrame:
    """The ES ``_source`` fetch: resolve result doc ids to their stored
    docs-dimension rows (repo/path/commit/lang + any doc_attrs). Pure
    driver-side pyarrow — an ``isin`` pushdown per live segment (ids
    prune row groups via parquet statistics), no Spark job. Tombstoned
    ids are excluded (they are no longer part of the index's live set).
    Rows return in ``doc_ids`` order; unknown ids are simply absent."""
    import pyarrow.dataset as ds

    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    ids = [int(i) for i in doc_ids]
    if m.tombstones:
        dead = set(m.tombstones)
        ids = [i for i in ids if i not in dead]
    if not ids:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    parts = []
    for d in m.segment_dirs(index_dir):
        data = ds.dataset(
            os.path.join(d, "docs"), format="parquet", partitioning="hive"
        )
        cols = columns
        if cols is not None:
            cols = ["doc_id"] + [c for c in cols if c != "doc_id"]
            cols = [c for c in cols if c in data.schema.names]
        t = data.to_table(filter=ds.field("doc_id").isin(ids), columns=cols)
        if t.num_rows:
            parts.append(t.to_pandas())
    if not parts:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
    out = pd.concat(parts, ignore_index=True)
    if "batch" in out.columns:
        out = out.drop(columns=["batch"])
    # segments are doc-disjoint, but an id can appear alongside its
    # tombstoned older copy mid-upsert — keep the NEWEST segment's row
    # (parts appended in manifest order; later segments are newer)
    out = out.drop_duplicates("doc_id", keep="last")
    order = {i: n for n, i in enumerate(ids)}
    out = out.sort_values("doc_id", key=lambda s: s.map(order), kind="stable")
    return out.reset_index(drop=True)


def search(
    spark: SparkSession,
    index_dir: str,
    query: str,
    k: int = 10,
    use_wand: bool = False,
    field: str = "content",
    predicate: list | None = None,
    must_not: list[str] | None = None,
    operator: str = "or",
    min_should_match: int | None = None,
    should: list[str] | None = None,
) -> list[tuple[int, float]]:
    return search_many(
        spark,
        index_dir,
        [(0, query, k)],
        use_wand=use_wand,
        field=field,
        predicate=predicate,
        must_not=must_not,
        operator=operator,
        min_should_match=min_should_match,
        should=should,
    )[0]


# ------------------------------------------------------- phrase queries
class _PhraseSubList:
    """One (salt, shard) sub-list of a phrase term: sorted non-overlapping
    blocks with LAZY per-block decode (docs, imp, positions) — the
    _LazyTermList discipline extended with the positional payload, so a
    phrase containing a hot term ("the merge") decodes only the blocks
    that contain candidate docs instead of the whole list."""

    __slots__ = ("idf", "k1", "b", "avgdl", "firsts", "lasts", "bufs",
                 "n_postings", "_dec")

    def __init__(self, idf, k1, b, avgdl):
        self.idf, self.k1, self.b, self.avgdl = idf, k1, b, avgdl
        self.firsts, self.lasts, self.bufs = [], [], []
        self.n_postings = 0
        self._dec: dict[int, tuple] = {}

    def add_block(self, first_u64, last_u64, n, g, tfb, dlb, pz):
        self.firsts.append(first_u64)
        self.lasts.append(last_u64)
        self.bufs.append((g, tfb, dlb, pz))
        self.n_postings += n

    def seal(self):
        order = np.argsort(np.array(self.firsts, dtype=np.uint64), kind="stable")
        self.firsts = np.array(self.firsts, dtype=np.uint64)[order]
        self.lasts = np.array(self.lasts, dtype=np.uint64)[order]
        self.bufs = [self.bufs[i] for i in order]

    def _decode(self, i: int):
        hit = self._dec.get(i)
        if hit is not None:
            return hit
        g, tfb, dlb, pz = self.bufs[i]
        docs = delta_decode(varint_decode(bytes(g)))
        tf = varint_decode(bytes(tfb)).astype(np.int64)
        dl = varint_decode(bytes(dlb)).astype(np.float64)
        imp = self.idf * (
            tf * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )
        if pz is None:
            # conjunctive (nested) usage: no positional payload; only
            # membership/impacts/dl are served — positions_* must not
            # be called on such a sub-list
            off = np.concatenate(([0], np.cumsum(tf)))
            out = (docs, imp, None, off, dl)
            self._dec[i] = out
            return out
        # per-posting absolute positions: cumsum restarting at each
        # posting (first value absolute): pos[j] = cp[j] - cp[start-1]
        pp = varint_decode(bytes(pz)).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(tf)))[:-1]
        cp = np.cumsum(pp)
        base = np.zeros(len(pp), dtype=np.int64)
        if len(starts):
            adj = cp[starts - 1]
            adj[starts == 0] = 0
            base = np.repeat(adj, tf)
        pos_flat = cp - base
        off = np.concatenate(([0], np.cumsum(tf)))
        out = (docs, imp, pos_flat, off, dl)
        self._dec[i] = out
        return out

    def all_docs(self) -> np.ndarray:
        if not len(self.firsts):
            return np.empty(0, dtype=np.uint64)
        return np.concatenate([self._decode(i)[0] for i in range(len(self.firsts))])

    def block_of(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(block index, found) per candidate — blocks are sorted and
        non-overlapping within a sub-list, so searchsorted suffices."""
        bi = np.searchsorted(self.firsts, cand, side="right") - 1
        ok = (bi >= 0) & (cand <= self.lasts[np.clip(bi, 0, None)])
        return bi, ok


class _PhraseTerm:
    """All (salt, shard) sub-lists of one term in one bucket."""

    __slots__ = ("subs", "n_postings")

    def __init__(self):
        self.subs: dict[tuple[int, int], _PhraseSubList] = {}
        self.n_postings = 0

    def seal(self):
        for sl in self.subs.values():
            sl.seal()
            self.n_postings += sl.n_postings

    def all_docs(self) -> np.ndarray:
        parts = [sl.all_docs() for sl in self.subs.values()]
        return np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=np.uint64)

    def imp_at(self, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(membership mask, imp) per candidate; decodes ONLY blocks that
        contain candidates (a doc lives in exactly one sub-list)."""
        found = np.zeros(len(cand), dtype=bool)
        imp = np.zeros(len(cand), dtype=np.float64)
        for sl in self.subs.values():
            bi, ok = sl.block_of(cand)
            for i in np.unique(bi[ok]):
                sel = np.flatnonzero(ok & (bi == i))
                docs, imps, _, _, _ = sl._decode(int(i))
                pos = np.clip(np.searchsorted(docs, cand[sel]), 0, len(docs) - 1)
                hit = docs[pos] == cand[sel]
                found[sel[hit]] = True
                imp[sel[hit]] = imps[pos[hit]]
        return found, imp

    def positions_at(self, du) -> np.ndarray | None:
        for sl in self.subs.values():
            bi, ok = sl.block_of(np.array([du], dtype=np.uint64))
            if ok[0]:
                docs, _, pos_flat, off, _ = sl._decode(int(bi[0]))
                j = int(np.searchsorted(docs, du))
                if j < len(docs) and docs[j] == du:
                    return pos_flat[off[j] : off[j + 1]]
        return None

    def dl_at(self, du) -> float | None:
        for sl in self.subs.values():
            bi, ok = sl.block_of(np.array([du], dtype=np.uint64))
            if ok[0]:
                docs, _, _, _, dl = sl._decode(int(bi[0]))
                j = int(np.searchsorted(docs, du))
                if j < len(docs) and docs[j] == du:
                    return float(dl[j])
        return None

    def positions_bulk(
        self, cand: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Ragged gather of every candidate's position list in ONE pass:
        returns (ci, pos, dl) flat arrays where ``ci`` is the index into
        ``cand`` owning each position, sorted by (ci, pos) ascending.
        Python iterates distinct (sub-list, block) pairs — never docs
        (VERDICT r4 #2: the per-doc positions_at loop was 10^5 Python
        iterations per bucket for a two-common-term phrase)."""
        ci_chunks: list[np.ndarray] = []
        pos_chunks: list[np.ndarray] = []
        dl_chunks: list[np.ndarray] = []
        for sl in self.subs.values():
            bi, ok = sl.block_of(cand)
            for i in np.unique(bi[ok]):
                sel = np.flatnonzero(ok & (bi == i))
                docs, _, pos_flat, off, dl = sl._decode(int(i))
                if pos_flat is None:
                    raise ValueError(
                        "positions requested from a sub-list loaded without "
                        "the positional payload"
                    )
                j = np.searchsorted(docs, cand[sel])
                inb = j < len(docs)
                hit = inb & (docs[np.clip(j, 0, len(docs) - 1)] == cand[sel])
                sel, j = sel[hit], j[hit]
                if not len(sel):
                    continue
                lens = (off[j + 1] - off[j]).astype(np.int64)
                total = int(lens.sum())
                # flat[base+local] walks each posting's [off[j], off[j+1])
                # slice — the standard ragged-gather index trick, no loop
                base = np.repeat(off[j], lens)
                local = np.arange(total, dtype=np.int64) - np.repeat(
                    np.cumsum(lens) - lens, lens
                )
                pos_chunks.append(pos_flat[base + local])
                ci_chunks.append(np.repeat(sel, lens))
                dl_chunks.append(np.repeat(dl[j], lens))
        if not ci_chunks:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.float64)
        ci = np.concatenate(ci_chunks)
        pos = np.concatenate(pos_chunks)
        dls = np.concatenate(dl_chunks)
        # stable by ci keeps each doc's positions ascending (they are
        # ascending within every chunk; a doc never spans chunks)
        order = np.argsort(ci, kind="stable")
        return ci[order], pos[order].astype(np.int64), dls[order]



def _min_range_leq(shifted: list[np.ndarray], slop: int) -> bool:
    """Smallest range covering one element from each sorted list —
    match iff min over alignments of (max(s_i) - min(s_i)) <= slop.
    Classic k-pointer sweep, O(total positions * k) with tiny k."""
    k = len(shifted)
    ptr = [0] * k
    while True:
        vals = [shifted[i][ptr[i]] for i in range(k)]
        lo = min(vals)
        if max(vals) - lo <= slop:
            return True
        i_min = vals.index(lo)
        ptr[i_min] += 1
        if ptr[i_min] >= len(shifted[i_min]):
            return False


def _sloppy_freq_unordered(shifted: list[np.ndarray], slop: int) -> float:
    """Lucene-style sloppy frequency for one doc (unordered): the same
    k-pointer sweep as _min_range_leq but enumerated to exhaustion —
    every alignment whose shifted range fits the slop contributes
    ``1 / (1 + matchLength)`` with matchLength = the range (the slop it
    consumed; a transposition costs 2, so it weighs 1/3 vs an in-order
    adjacency's 1). Matches Lucene's SloppyPhraseScorer weight model
    (sloppyWeight = 1/(1+distance)) under this engine's minimal-window
    enumeration."""
    k = len(shifted)
    ptr = [0] * k
    freq = 0.0
    while True:
        vals = [shifted[i][ptr[i]] for i in range(k)]
        lo = min(vals)
        rng = max(vals) - lo
        if rng <= slop:
            freq += 1.0 / (1.0 + float(rng))
        i_min = vals.index(lo)
        ptr[i_min] += 1
        if ptr[i_min] >= len(shifted[i_min]):
            return freq


def _unordered_survivors(
    terms: dict, seq: list[str], cand: np.ndarray, slop: int,
    weighted: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Lucene/ES UNORDERED sloppy phrase (match_phrase with slop where
    terms may appear out of query order — a transposition costs 2):
    a doc matches iff an assignment of one position per term satisfies
    max(p_i - i) - min(p_i - i) <= slop, with i the term's query
    offset. 'b a' vs query 'a b': shifted positions +1/-1, range 2 —
    hence slop>=2 admits the transposition, matching Lucene's
    documented cost model.

    Candidates have already been intersected to docs containing every
    term; the per-candidate minimal-range sweep is a k-pointer merge
    over that doc's position lists (k = phrase length, tiny). Python
    iterates CANDIDATES here — acceptable because unordered slop is
    the rare edge-parity mode (the ordered path stays the vectorized
    default); repeated-term phrases would need distinct-position
    assignment (Lucene's repeats machinery) and are rejected.

    ``weighted=False``: ``ptf`` is 1.0 per matching doc (gate scoring —
    constituent-term BM25 sum). ``weighted=True`` (scoring=
    "sloppy_freq"): ``ptf`` is the Lucene-style sloppy frequency
    (_sloppy_freq_unordered) — the alignment sweep runs to exhaustion
    instead of short-circuiting on the first fit."""
    uniq = sorted(set(seq))
    if len(uniq) != len(seq):
        raise ValueError(
            "unordered slop does not support repeated-term phrases "
            "(distinct-position assignment; use ordered slop)"
        )
    bulk = {t: terms[t].positions_bulk(cand) for t in uniq}
    offs = {t: i for i, t in enumerate(seq)}
    # split each term's flat (ci, pos) arrays into per-candidate slices
    per_term: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for t, (ci, pos, dl) in bulk.items():
        starts = np.searchsorted(ci, np.arange(len(cand)))
        ends = np.searchsorted(ci, np.arange(len(cand)), side="right")
        per_term[t] = (pos - offs[t], starts, ends)
    ci0, _pos0, dl0 = bulk[seq[0]]
    ptf = np.zeros(len(cand), dtype=np.float64)
    for c in range(len(cand)):
        lists = []
        ok = True
        for t in uniq:
            s, st, en = per_term[t]
            if en[c] <= st[c]:
                ok = False
                break
            lists.append(s[st[c] : en[c]])
        if not ok:
            continue
        if weighted:
            ptf[c] = _sloppy_freq_unordered(lists, slop)
        elif _min_range_leq(lists, slop):
            ptf[c] = 1.0
    matched = ptf > 0
    dl_cand = np.zeros(len(cand), dtype=np.float64)
    dl_cand[ci0] = dl0
    return np.flatnonzero(matched), ptf, dl_cand


def _phrase_survivors(
    terms: dict, seq: list[str], cand: np.ndarray, slop: int = 0,
    weighted: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized phrase verification (VERDICT r4 #2): ONE ragged gather
    of every candidate's positions per unique term, then per-term
    probes on composite int64 keys (ci << 32 | pos, sorted,
    searchsorted). Python never iterates candidates; repeated-term
    phrases work unchanged.

    ``slop=0`` (exact adjacency): a start position p survives when
    seq[i] has p+i for all i.

    ``slop>0`` (ORDERED proximity — documented semantics: terms must
    appear in query order, with at most ``slop`` total skipped tokens
    between the first and last): for each start, the chain greedily
    takes each next term's SMALLEST position strictly after the
    current one (optimal: minimizing each step minimizes the final
    position, hence total slack), and survives when
    (last - start - (len(seq)-1)) <= slop. The greedy step is one
    ``searchsorted(key+1)`` per term — same cost shape as exact.

    Returns (midx, ptf, dl_cand): indices into ``cand`` with >=1
    occurrence, per-candidate occurrence counts, per-candidate doc
    length (0 where the doc lacks seq[0]). Shared by the flat phrase
    scorer and the nested phrase mode."""
    uniq = sorted(set(seq))
    bulk = {t: terms[t].positions_bulk(cand) for t in uniq}
    keys = {t: (bk[0] << np.int64(32)) | bk[1] for t, bk in bulk.items()}
    ci0, pos0, dl0 = bulk[seq[0]]
    p_ci, p_pos = ci0, pos0
    if slop <= 0:
        for i, ti in enumerate(seq[1:], start=1):
            if not len(p_ci):
                break
            tgt = (p_ci << np.int64(32)) | (p_pos + i)
            kt = keys[ti]
            j = np.searchsorted(kt, tgt)
            okm = j < len(kt)
            okm[okm] = kt[j[okm]] == tgt[okm]
            p_ci, p_pos = p_ci[okm], p_pos[okm]
    else:
        start = pos0
        cur = pos0
        for ti in seq[1:]:
            if not len(p_ci):
                break
            # smallest position of ti strictly after cur, same candidate
            probe = ((p_ci << np.int64(32)) | cur) + 1
            kt = keys[ti]
            j = np.searchsorted(kt, probe)
            okm = j < len(kt)
            okm[okm] = (kt[j[okm]] >> np.int64(32)) == p_ci[okm]
            p_ci, start = p_ci[okm], start[okm]
            cur = kt[j[okm]] & np.int64((1 << 32) - 1)
        if len(p_ci):
            slack = cur - start - (len(seq) - 1)
            keep = slack <= slop
            p_ci, slack = p_ci[keep], slack[keep]
            if weighted and len(p_ci):
                # Lucene sloppy weight per surviving start's minimal
                # chain: 1/(1+slack); slack=0 chains weigh 1, so
                # weighted(slop=0) == the occurrence count exactly
                w = 1.0 / (1.0 + slack.astype(np.float64))
                ptf = np.zeros(len(cand), dtype=np.float64)
                np.add.at(ptf, p_ci, w)
                dl_cand = np.zeros(len(cand), dtype=np.float64)
                dl_cand[ci0] = dl0
                return np.flatnonzero(ptf > 0), ptf, dl_cand
    ptf = (
        np.bincount(p_ci, minlength=len(cand)).astype(np.float64)
        if len(p_ci)
        else np.zeros(len(cand), dtype=np.float64)
    )
    dl_cand = np.zeros(len(cand), dtype=np.float64)
    dl_cand[ci0] = dl0
    return np.flatnonzero(ptf > 0), ptf, dl_cand


def _make_phrase_bucket_scorer(
    index_dir: str,
    queries: dict[int, tuple[list[str], int]],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    fld: str = "content",
    scoring: str = "gate",
    predicate: list | None = None,
    n_shards: int = 0,
    n_sb: int = 0,
    neg_terms: list[str] | None = None,
    slop: int = 0,
    ordered: bool = True,
):
    """Per-(segment, sb) phrase scorer: intersect candidate docs starting
    from the RAREST phrase term, verify adjacency from the positional
    payload, score survivors by the sum of their constituent-term BM25
    contributions (documented scoring choice: the phrase acts as a match
    gate, scoring stays the bool-must constituent sum — exactly
    reproducible by a relational oracle, unlike Lucene's phrase-freq
    variant), bounded top-k per query.

    Scale shape: only the rarest term's list is fully decoded; every
    other term (including stopword-class hot terms) lazily decodes ONLY
    the blocks containing surviving candidates — "the merge" costs
    O(df(merge)), not O(df(the)).

    ``predicate``: same docs-dimension conjunction as search_many,
    resolved in-task and applied to the candidate set right after the
    rarest-term scan — the reference's production shape combines an
    analyzed match with not_analyzed term filters and the temporal
    range (bug_version.json:57-65,221-224), so phrase-over-versions-
    asof needs it too (VERDICT r4 #4).

    ``neg_terms``: must_not exclusion — docs containing any of them are
    dropped from the candidate set (stats untouched), same semantics as
    the BM25 scorer's."""
    neg = sorted(set(neg_terms or ()))
    all_terms = sorted({t for seq, _ in queries.values() for t in seq} | set(neg))

    def run(key, _pdf):  # (key, pd.DataFrame) -> pd.DataFrame
        import pyarrow.dataset as ds

        seg_id, sb = key[0], int(key[1])
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int32", "doc_id": "int64", "score": "float64"}
        )
        allowed = _resolve_allowed(index_dir, seg_id, sb, predicate, n_shards, n_sb)
        if allowed is not None and not len(allowed):
            return empty
        path = os.path.join(index_dir, "segments", seg_id, "postings")
        data = ds.dataset(path, format="parquet", partitioning="hive")
        if "poss" not in data.schema.names:
            raise ValueError(
                f"segment {seg_id} has no positional payload; rebuild with "
                "build_index(positions=True)"
            )
        flt = (ds.field("sb") == sb) & ds.field("term").isin(all_terms)
        if "field" in data.schema.names:
            flt = flt & (ds.field("field") == fld)
        tbl = data.to_table(
            filter=flt,
            columns=["term", "salt", "shard", "n", "first_doc", "last_doc",
                     "gaps", "tfs", "dls", "poss"],
        )
        if tbl.num_rows == 0:
            return empty
        pdf = tbl.to_pandas()

        terms: dict[str, _PhraseTerm] = {}
        for t, sa, sh, n, fd, ld, g, tfb, dlb, pz in zip(
            pdf["term"], pdf["salt"], pdf["shard"], pdf["n"],
            pdf["first_doc"], pdf["last_doc"],
            pdf["gaps"], pdf["tfs"], pdf["dls"], pdf["poss"],
        ):
            if pz is None:
                raise ValueError(
                    "positional payload missing for term blocks; "
                    "index was not built with positions=True"
                )
            pt = terms.setdefault(t, _PhraseTerm())
            key2 = (int(sa), int(sh))
            sl = pt.subs.get(key2)
            if sl is None:
                sl = pt.subs[key2] = _PhraseSubList(idfs.get(t, 0.0), k1, b, avgdl)
            sl.add_block(
                np.int64(fd).view(np.uint64), np.int64(ld).view(np.uint64),
                int(n), bytes(g), bytes(tfb), bytes(dlb), bytes(pz),
            )
        for pt in terms.values():
            pt.seal()

        # must_not: negative terms' doc lists fold into the exclusion set
        excl = tombstones
        if neg:
            neg_parts = [
                terms[t].all_docs() for t in neg if t in terms
            ]
            if neg_parts:
                excl = np.union1d(
                    tombstones, u64_to_doc_id(np.concatenate(neg_parts))
                )

        out_q, out_d, out_s = [], [], []
        for qid, (seq, k) in queries.items():
            uniq = sorted(set(seq))
            if any(t not in terms for t in uniq):
                continue
            # intersect from the rarest term outward: hot terms never
            # fully decode
            by_rarity = sorted(uniq, key=lambda t: terms[t].n_postings)
            cand = terms[by_rarity[0]].all_docs()
            if allowed is not None:
                # filter FIRST: later terms only decode blocks holding
                # surviving candidates, so a selective predicate shrinks
                # the whole intersection, not just the final heap
                cand = cand[_allowed_mask(cand, allowed)]
            for t in by_rarity[1:]:
                if not len(cand):
                    break
                mask, _ = terms[t].imp_at(cand)
                cand = cand[mask]
            if not len(cand):
                continue
            if excl.size:
                cand = cand[~np.isin(u64_to_doc_id(cand), excl)]
            if not len(cand):
                continue
            # exact contributions at the surviving candidates (cached
            # block decodes — no re-work after the intersection pass)
            total = np.zeros(len(cand), dtype=np.float64)
            if scoring == "gate":
                for t in uniq:  # sorted term order -> deterministic sums
                    _, imp = terms[t].imp_at(cand)
                    total += imp
            # Lucene PhraseQuery weight: the summed idf of the phrase's
            # terms (duplicates counted), applied to the PHRASE frequency
            idf_seq = float(sum(idfs[t] for t in seq))
            docs_i64 = u64_to_doc_id(cand)
            wtd = scoring == "sloppy_freq"
            if ordered:
                midx, ptf, dl_cand = _phrase_survivors(terms, seq, cand, slop, wtd)
            else:
                midx, ptf, dl_cand = _unordered_survivors(terms, seq, cand, slop, wtd)
            if not len(midx):
                continue
            if scoring in ("phrase_freq", "sloppy_freq"):
                # ES/Lucene match_phrase scoring: tf = the number of
                # phrase OCCURRENCES (sloppy_freq: each occurrence
                # weighted 1/(1+slop consumed) — Lucene's sloppyWeight),
                # dl/avgdl as usual (dl comes from seq[0]'s gather —
                # per-doc, term-independent)
                tfm = ptf[midx]
                dlm = dl_cand[midx]
                sc_arr = idf_seq * (
                    tfm * (k1 + 1.0)
                    / (tfm + k1 * (1.0 - b + b * dlm / avgdl))
                )
            else:
                sc_arr = total[midx]
            docs_m = docs_i64[midx]
            order = np.lexsort((docs_m, -sc_arr))[:k]
            for oi in order:
                out_q.append(qid)
                out_d.append(int(docs_m[oi]))
                out_s.append(float(sc_arr[oi]))
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return run


def _make_conjunctive_bucket_scorer(
    index_dir: str,
    queries: dict[int, tuple[list[str], int]],
    idfs: dict[str, float],
    avgdl: float,
    k1: float,
    b: float,
    tombstones: np.ndarray,
    fld: str,
    predicate: list | None,
    n_shards: int,
    n_sb: int,
    neg_terms: list[str] | None = None,
    msm: int | None = None,
    should_terms: list[str] | None = None,
):
    """ES ``match`` with ``operator="and"`` (``msm=None``) or
    ``minimum_should_match`` (``msm=m``): at least m of the query's
    terms must occur in the doc; scoring stays the constituent-term
    BM25 sum of the MATCHING terms (identical to the should-semantics
    score of the same doc — the gate only shrinks the match set).

    Candidate generation is exact and rarest-biased: for AND,
    intersect outward from the rarest term (hot terms decode only
    candidate blocks); for msm, a doc with >= m matches must contain at
    least one of the (n - m + 1) RAREST terms (missing all of them
    leaves at most m-1 hotter terms), so their lists' union is a
    complete candidate set — the hottest m-1 terms never fully decode.
    Per-bucket counting is exact because a doc lives in exactly ONE
    (segment, sb) bucket (doc-sharded, content-addressed).

    ``should_terms``: ES bool {must, should} — with a gating must/msm
    clause present, should terms are purely score-BOOSTING: they never
    affect the match set, but a surviving doc containing one adds its
    BM25 contribution. Cost: should lists decode only candidate blocks
    (imp_at), bounded by the gated candidate count."""
    neg = sorted(set(neg_terms or ()))
    boost = sorted(set(should_terms or ()))
    all_terms = sorted(
        {t for seq, _ in queries.values() for t in seq} | set(neg) | set(boost)
    )

    def run(key, _pdf):  # (key, pd.DataFrame) -> pd.DataFrame
        import pyarrow.dataset as ds

        seg_id, sb = key[0], int(key[1])
        empty = pd.DataFrame({"query_id": [], "doc_id": [], "score": []}).astype(
            {"query_id": "int32", "doc_id": "int64", "score": "float64"}
        )
        allowed = _resolve_allowed(index_dir, seg_id, sb, predicate, n_shards, n_sb)
        if allowed is not None and not len(allowed):
            return empty
        path = os.path.join(index_dir, "segments", seg_id, "postings")
        data = ds.dataset(path, format="parquet", partitioning="hive")
        flt = (ds.field("sb") == sb) & ds.field("term").isin(all_terms)
        if "field" in data.schema.names:
            flt = flt & (ds.field("field") == fld)
        elif fld != "content":
            return empty
        tbl = data.to_table(
            filter=flt,
            columns=["term", "salt", "shard", "n", "first_doc", "last_doc",
                     "gaps", "tfs", "dls"],
        )
        if tbl.num_rows == 0:
            return empty
        pdf = tbl.to_pandas()
        terms: dict[str, _PhraseTerm] = {}
        for t, sa, sh, n, fd, ld, g, tfb, dlb in zip(
            pdf["term"], pdf["salt"], pdf["shard"], pdf["n"],
            pdf["first_doc"], pdf["last_doc"],
            pdf["gaps"], pdf["tfs"], pdf["dls"],
        ):
            pt = terms.setdefault(t, _PhraseTerm())
            key2 = (int(sa), int(sh))
            sl = pt.subs.get(key2)
            if sl is None:
                sl = pt.subs[key2] = _PhraseSubList(idfs.get(t, 0.0), k1, b, avgdl)
            sl.add_block(
                np.int64(fd).view(np.uint64), np.int64(ld).view(np.uint64),
                int(n), bytes(g), bytes(tfb), bytes(dlb), None,
            )
        for pt in terms.values():
            pt.seal()

        excl = tombstones
        if neg:
            neg_parts = [terms[t].all_docs() for t in neg if t in terms]
            if neg_parts:
                excl = np.union1d(
                    tombstones, u64_to_doc_id(np.concatenate(neg_parts))
                )

        out_q, out_d, out_s = [], [], []
        for qid, (seq, k) in queries.items():
            uniq = sorted(set(seq))
            need = len(uniq) if msm is None else int(msm)
            buck = [t for t in uniq if t in terms]
            if need < 1 or len(buck) < need:
                continue
            by_rarity = sorted(buck, key=lambda t: terms[t].n_postings)
            if need == len(uniq):
                # pure AND: progressive intersection from the rarest
                cand = terms[by_rarity[0]].all_docs()
                if allowed is not None:
                    cand = cand[_allowed_mask(cand, allowed)]
                for t in by_rarity[1:]:
                    if not len(cand):
                        break
                    mask, _ = terms[t].imp_at(cand)
                    cand = cand[mask]
            else:
                # msm: union the (|buck| - need + 1) rarest lists, then
                # count memberships over every bucket-present term
                gens = by_rarity[: len(buck) - need + 1]
                cand = np.unique(
                    np.concatenate([terms[t].all_docs() for t in gens])
                )
                if allowed is not None:
                    cand = cand[_allowed_mask(cand, allowed)]
                if len(cand):
                    cnt = np.zeros(len(cand), dtype=np.int32)
                    for t in buck:
                        mask, _ = terms[t].imp_at(cand)
                        cnt += mask
                    cand = cand[cnt >= need]
            if not len(cand):
                continue
            if excl.size:
                cand = cand[~np.isin(u64_to_doc_id(cand), excl)]
            if not len(cand):
                continue
            total = np.zeros(len(cand), dtype=np.float64)
            # gate terms + score-boosting should terms (absent-from-doc
            # contributions are 0); sorted order -> deterministic sums
            for t in sorted(set(buck) | {x for x in boost if x in terms}):
                _, imp = terms[t].imp_at(cand)
                total += imp
            docs_m = u64_to_doc_id(cand)
            order = np.lexsort((docs_m, -total))[:k]
            for oi in order:
                out_q.append(qid)
                out_d.append(int(docs_m[oi]))
                out_s.append(float(total[oi]))
        return pd.DataFrame({"query_id": out_q, "doc_id": out_d, "score": out_s})

    return run


#: phrase queries run against the primary field (positions are recorded
#: for it alone — build.py pos_fields)
DEFAULT_QUERY_FIELD = "content"


def phrase_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = DEFAULT_QUERY_FIELD,
    scoring: str = "gate",
    predicate: list | None = None,
    execution: str = "auto",
    must_not: list[str] | None = None,
    slop: int = 0,
    ordered: bool = True,
) -> dict[int, list[tuple[int, float]]]:
    """Batch match_phrase: [(query_id, phrase_text, k)] ->
    {query_id: [(doc_id, score)]}. The phrase is analyzed with the
    primary field's chain KEEPING order and duplicates; a doc matches
    when the exact token sequence occurs (position-verified), and scores
    by the constituent terms' BM25 sum. Same (segment, sb) fan-out +
    driver k-way merge as search_many. ``predicate`` restricts matches
    to docs satisfying a docs-dimension conjunction (same spec as
    search_many) — the ES bool query's filter context around a
    match_phrase (bug_version.json:57-65,221-224).

    ``ordered=False`` (with ``slop>0``) switches to Lucene's UNORDERED
    sloppy semantics: terms may appear out of query order, an
    assignment with shifted-position range <= slop matches, and a
    transposition costs 2 ('hash table' slop=2 matches 'table hash').
    Repeated-term phrases are rejected in unordered mode.

    ``scoring="sloppy_freq"``: Lucene's sloppy-phrase scoring — tf is
    the SUM of per-occurrence weights 1/(1+matchLength) (ordered: the
    slack of each start's minimal chain; unordered: the shifted range
    of each fitting alignment), pushed through the usual BM25 tf
    saturation with the phrase's summed idf. With slop=0 every weight
    is 1, so sloppy_freq == phrase_freq exactly."""
    if not ordered and scoring == "phrase_freq":
        raise ValueError(
            "unordered slop counts weighted matches, not plain "
            "occurrences — use scoring='sloppy_freq' (Lucene's model) "
            "or 'gate'"
        )
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    if predicate is not None:
        from .predicate import validate, validate_types

        validate(predicate)
        # typed doc_attrs mapping (VERDICT r4 #6): literal/column type
        # coherence checked up front; legacy indexes (no recorded
        # types) skip the attr checks but still reject unknown columns
        validate_types(
            predicate, m.doc_attr_types,
            legacy_attrs=m.doc_attrs if not m.doc_attr_types else None,
        )
    if field not in m.positions_fields():
        raise ValueError(
            f"field {field!r} was not built with positions=True; phrase "
            "queries need the positional payload (the shingled field "
            "approximates bigram phrases without it)"
        )
    chain = m.field_chain(field)
    qseq = {
        int(qid): (py_analyze(text, chain), int(k)) for qid, text, k in queries
    }
    qseq = {qid: v for qid, v in qseq.items() if v[0]}
    results: dict[int, list[tuple[int, float]]] = {int(q[0]): [] for q in queries}
    if not qseq:
        return results
    all_terms = sorted({t for seq, _ in qseq.values() for t in seq})
    dfs = _lookup_terms(m, index_dir, all_terms, field)
    # a phrase containing ANY absent term cannot match anywhere
    qeff = {
        qid: v for qid, v in qseq.items() if all(t in dfs for t in v[0])
    }
    if not qeff:
        return results
    neg_raw = sorted({t for q in (must_not or ()) for t in py_analyze(q, chain)})
    neg_dfs = _lookup_terms(m, index_dir, neg_raw, field) if neg_raw else {}
    neg_eff = sorted(set(neg_raw) & set(neg_dfs))
    idfs = {t: _idf(m.n_docs, df) for t, df in dfs.items()}
    live = sorted({t for seq, _ in qeff.values() for t in seq})
    work = [
        (os.path.basename(d), sb)
        for d in _candidate_dict_dirs(m, index_dir, live, field)
        for sb in range(m.n_sb)
    ]
    if not work:
        return results
    if scoring not in ("gate", "phrase_freq", "sloppy_freq"):
        raise ValueError(f"unknown phrase scoring {scoring!r}")
    scorer = _make_phrase_bucket_scorer(
        index_dir, qeff, idfs, m.field_avgdl(field), m.k1, m.b,
        np.array(sorted(m.tombstones), dtype=np.int64), field, scoring,
        predicate, m.n_shards, m.n_sb, neg_eff, int(slop), bool(ordered),
    )
    # the intersect-outward executor fully decodes only the RAREST term;
    # every other term decodes candidate blocks — the rarest df bounds a
    # query's candidate volume (+ negative lists, decoded once)
    est = sum(min(dfs[t] for t in seq) for seq, _ in qeff.values())
    est += sum(neg_dfs[t] for t in neg_eff)
    pdf = _execute_buckets(spark, work, scorer, RESULT_SCHEMA, est, execution)
    if len(pdf):
        pdf = pdf.sort_values(
            ["query_id", "score", "doc_id"], ascending=[True, False, True]
        )
        for qid, grp in pdf.groupby("query_id", sort=False):
            k = qseq[int(qid)][1]
            results[int(qid)] = list(
                zip(grp["doc_id"].tolist()[:k], grp["score"].tolist()[:k])
            )
    return results


def phrase_search(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    field: str = DEFAULT_QUERY_FIELD,
    scoring: str = "gate",
    predicate: list | None = None,
    must_not: list[str] | None = None,
    slop: int = 0,
    ordered: bool = True,
) -> list[tuple[int, float]]:
    return phrase_search_many(
        spark, index_dir, [(0, phrase, k)], field=field, scoring=scoring,
        predicate=predicate, must_not=must_not, slop=slop, ordered=ordered,
    )[0]


def match_phrase_prefix_search_many(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, str, int]],
    field: str = DEFAULT_QUERY_FIELD,
    max_expansions: int = 50,
    scoring: str = "gate",
    predicate: list | None = None,
    must_not: list[str] | None = None,
    slop: int = 0,
    execution: str = "auto",
) -> dict[int, list[tuple[int, float]]]:
    """ES ``match_phrase_prefix`` (phrase autocomplete): the text's
    LAST analyzed token is a prefix, dictionary-expanded to at most
    ``max_expansions`` terms (highest df first — the Lucene top-terms
    rewrite shared with prefix/wildcard), and a doc matches when the
    phrase completes with ANY expansion. Scored as the BEST matching
    completion's phrase score (max over expansions), so ranking is
    identical to running each completed phrase and keeping a doc's best.

    Execution is EXACT and one Spark job for the whole batch: every
    completion becomes a sub-phrase in a single ``phrase_search_many``
    call (the bucket fan-out already batches arbitrarily many phrase
    queries), then the driver max-merges per (query, doc). Per-subquery
    top-k bounds are sufficient for global top-k-by-max: if doc d's
    best completion e ranks it in the global top-k, every doc above d
    globally also scores above d's e-score in ITS best sub-query, so at
    most k-1 docs can outrank d inside sub-query e.

    Single-token texts degenerate to a pure prefix, executed the same
    way over ``search_many`` (each expansion a one-term sub-query,
    max-merged) — NOTE this is max-over-expansions scoring, not
    ``prefix_search``'s should-semantics sum. Shingle-chain fields
    raise: completing a shingled phrase would need cross-token shingle
    synthesis that neither the dictionary nor the text contains."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    chain = m.field_chain(field)
    if chain.endswith("_shingle"):
        raise ValueError(
            f"match_phrase_prefix on the {chain!r} chain is not "
            "supported (completions cannot synthesize cross-token "
            "shingles); query the plain field variant"
        )
    results: dict[int, list[tuple[int, float]]] = {}
    sub: list[tuple[int, object, int]] = []
    sub_meta: dict[int, int] = {}  # sub qid -> caller qid
    phrase_subs: list[tuple[int, str, int]] = []
    nxt = 0
    for qid, text, k in queries:
        results[int(qid)] = []
        seq = py_analyze(str(text), chain)
        if not seq:
            continue
        exps = _expand_prefix(m, index_dir, seq[-1], field, max_expansions)
        for e in exps:
            sub_meta[nxt] = int(qid)
            if len(seq) == 1:
                sub.append((nxt, [e], int(k)))
            else:
                phrase_subs.append((nxt, " ".join(seq[:-1] + [e]), int(k)))
            nxt += 1
    merged: dict[int, dict[int, float]] = {}
    outs: list[dict[int, list[tuple[int, float]]]] = []
    if phrase_subs:
        outs.append(
            phrase_search_many(
                spark, index_dir, phrase_subs, field=field, scoring=scoring,
                predicate=predicate, must_not=must_not, slop=slop,
                execution=execution,
            )
        )
    if sub:
        outs.append(
            search_many(
                spark, index_dir, sub, field=field, predicate=predicate,
                must_not=must_not, execution=execution,
            )
        )
    for out in outs:
        for sqid, hits in out.items():
            qid = sub_meta[sqid]
            acc = merged.setdefault(qid, {})
            for d, s in hits:
                if s > acc.get(d, float("-inf")):
                    acc[d] = s
    by_k = {int(qid): int(k) for qid, _, k in queries}
    for qid, acc in merged.items():
        results[qid] = sorted(
            acc.items(), key=lambda x: (-x[1], x[0])
        )[: by_k[qid]]
    return results


def match_phrase_prefix_search(
    spark: SparkSession,
    index_dir: str,
    text: str,
    k: int = 10,
    field: str = DEFAULT_QUERY_FIELD,
    max_expansions: int = 50,
    scoring: str = "gate",
    predicate: list | None = None,
    must_not: list[str] | None = None,
    slop: int = 0,
) -> list[tuple[int, float]]:
    return match_phrase_prefix_search_many(
        spark, index_dir, [(0, text, k)], field=field,
        max_expansions=max_expansions, scoring=scoring,
        predicate=predicate, must_not=must_not, slop=slop,
    )[0]
