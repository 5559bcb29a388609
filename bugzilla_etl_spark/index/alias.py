"""Multi-index (alias) search: one query over several index dirs.

The reference swaps its ``bugs`` alias between two generations
(/root/reference/bin/import_bugs.sh:21-23); production ES deployments
also point one alias at MANY indices (time-partitioned ``logs-*``) and
search them as one. This module is that fan-out for the engine:
``multi_index_search`` runs the query against every member and merges
by score.

Statistics semantics — ES ``query_then_fetch`` (the default): every
index scores with ITS OWN df/avgdl/N. Scores are therefore comparable
only to the degree the members' term statistics agree (the same
caveat ES documents; its ``dfs_query_then_fetch`` global-stats mode is
the analog of merging the members into one index with merge_segments,
which this engine already supports when exact cross-index comparability
matters).

Top-k exactness under the merge: per-member top-k bounds suffice — any
doc in the global top-k is in its own member's top-k. The fan-out is
one batched job per member (members are separate roots with their own
manifests; they cannot share one bucket fan-out), exactly the
per-index cost ES pays.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .boolquery import Bool, bool_search_many
from .manifest import IndexManifest
from .querystring import parse_query_string

__all__ = [
    "multi_index_count",
    "multi_index_search",
    "multi_index_terms_agg",
]


def _global_stats(dirs: list[str], query: Bool) -> dict:
    """Pre-summed cross-member statistics for dfs_query_then_fetch:
    per-term df summed over every member's dictionary (driver-side
    range scans — plan-time data), plus total N and the merged avgdl.
    Requires every member to analyze the field with the SAME chain
    (mixed chains make one global term space meaningless)."""
    from ..tokenize import py_analyze
    from .boolquery import _analyze_clauses
    from .query import _lookup_terms

    fld = query.field
    ms = [IndexManifest.load(d) for d in dirs]
    chains = {m.field_chain(fld) for m in ms}
    if len(chains) != 1:
        raise ValueError(
            f"stats='global' needs one analyzer chain across members; "
            f"got {sorted(chains)}"
        )
    chain = chains.pop()
    match_cs, phrase_cs, neg, boost, _mb, _pb = _analyze_clauses(query, chain)
    demote = sorted(
        {t for x in query.negative for t in py_analyze(x, chain)}
    )
    terms = sorted(
        {t for ts, _ in match_cs for t in ts}
        | {t for seq, _ in phrase_cs for t in seq}
        | set(neg) | set(boost) | set(demote)
    )
    dfs: dict[str, int] = {}
    n_docs = 0
    sum_dl = 0.0
    for m, d in zip(ms, dirs):
        for t, df in _lookup_terms(m, d, terms, fld).items():
            dfs[t] = dfs.get(t, 0) + int(df)
        n_docs += m.n_docs
        # exact integer sums (avgdl reconstructed from a float mean
        # would drift an ulp from the merged index's own ratio)
        sum_dl += (
            m.sum_doc_len
            if fld == "content"
            else m.field_sum_doc_len.get(fld, 0)
        )
    return {
        "dfs": dfs,
        "n_docs": n_docs,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
    }


def multi_index_search(
    spark: SparkSession,
    index_dirs: list[str],
    query,
    k: int = 10,
    default_operator: str = "or",
    execution: str = "auto",
    stats: str = "local",
    search_after: tuple | None = None,
) -> list[tuple[int, int, float]]:
    """-> top-k [(member_ordinal, doc_id, score)] across every member.

    ``query``: a :class:`Bool` or query-string text. Query strings
    parse PER MEMBER (each member's dictionary drives its wildcard /
    fuzzy expansions — ES multi-index behavior). Ties order by
    (score desc, doc_id asc, member asc); the member ordinal is the
    position in ``index_dirs`` (the ES ``_index`` analog).

    ``stats``: "local" (ES query_then_fetch, the default — each member
    scores with its own df/avgdl/N) or "global" (ES
    dfs_query_then_fetch — a driver-side pre-pass sums df/N/doc-length
    over every member's dictionary and every member scores with the
    MERGED statistics, so results are rank- AND score-identical to the
    same corpus built as one index). Global mode takes a Bool (not a
    query string: per-member expansion would break the equivalence).

    ``search_after``: alias-wide _score pagination — the
    (last_score, last_doc_id) cursor applies inside every member's
    buckets before their k-cuts. Requires ``stats='global'``: with
    per-member statistics the scores the cursor compares against live
    on incomparable scales (members are doc-disjoint, so the
    (score, doc_id) pair uniquely positions a hit in the merged
    order)."""
    if not index_dirs:
        raise ValueError("multi_index_search needs at least one index dir")
    if stats not in ("local", "global"):
        raise ValueError(f"stats must be local|global: {stats!r}")
    if search_after is not None and stats != "global":
        # per-member scores live on incomparable scales; a score cursor
        # only partitions the alias-wide ranking under merged stats
        raise ValueError(
            "search_after across an alias needs stats='global' "
            "(query_then_fetch scores are not comparable across members)"
        )
    dirs = [os.path.abspath(d) for d in index_dirs]
    override = None
    if stats == "global":
        if not isinstance(query, Bool):
            raise ValueError(
                "stats='global' needs a Bool query (query strings "
                "expand per member, which breaks merged-stats "
                "equivalence)"
            )
        override = _global_stats(dirs, query)
    out: list[tuple[int, int, float]] = []
    for i, d in enumerate(dirs):
        if isinstance(query, str):
            q = parse_query_string(
                query, m=IndexManifest.load(d), index_dir=d,
                default_operator=default_operator,
            )
        elif isinstance(query, Bool):
            q = query
        else:
            raise ValueError(
                f"query must be a Bool or a query string: {query!r}"
            )
        hits = bool_search_many(
            spark, d, [(0, q, int(k))], execution=execution,
            _stats_override=override, search_after=search_after,
        )[0]
        out.extend((i, did, s) for did, s in hits)
    out.sort(key=lambda x: (-x[2], x[1], x[0]))
    return out[:k]


def multi_index_count(
    spark: SparkSession,
    index_dirs: list[str],
    query: Bool | None = None,
    execution: str = "auto",
) -> int:
    """ES ``_count`` over an alias: member counts sum exactly (members
    are doc-disjoint index roots)."""
    from .aggs import count_matches

    if not index_dirs:
        raise ValueError("multi_index_count needs at least one index dir")
    return sum(
        count_matches(spark, os.path.abspath(d), query, execution=execution)
        for d in index_dirs
    )


def multi_index_terms_agg(
    spark: SparkSession,
    index_dirs: list[str],
    attr: str,
    query: Bool | None = None,
    size: int = 10,
    order: tuple[str, str] | None = None,
    execution: str = "auto",
) -> list[tuple]:
    """ES ``terms`` aggregation over an alias: per-member FULL count
    maps (terms_agg partials carry every distinct key, so asking each
    member uncut costs no extra Spark work — only wire rows bounded by
    the member's attr cardinality) merge by key-sum, then the requested
    order and cut apply to the MERGED map. Exact for every order, the
    very property ES's per-shard shard_size cut gives up."""
    if not index_dirs:
        raise ValueError("multi_index_terms_agg needs at least one index dir")
    from .aggs import terms_agg

    merged: dict = {}
    for d in index_dirs:
        for key, n in terms_agg(
            spark, os.path.abspath(d), attr, query=query,
            size=(1 << 62), execution=execution,
        ):
            merged[key] = merged.get(key, 0) + int(n)
    tgt, direction = order or ("_count", "desc")
    if tgt not in ("_count", "_key") or direction not in ("asc", "desc"):
        raise ValueError(f"order must be (_count|_key, asc|desc): {order!r}")
    asc = direction == "asc"
    items = list(merged.items())
    if tgt == "_key":
        items.sort(key=lambda x: x[0], reverse=not asc)
    else:
        items.sort(key=lambda x: ((x[1] if asc else -x[1]), x[0]))
    return items[:size]
