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

__all__ = ["multi_index_search"]


def multi_index_search(
    spark: SparkSession,
    index_dirs: list[str],
    query,
    k: int = 10,
    default_operator: str = "or",
    execution: str = "auto",
) -> list[tuple[int, int, float]]:
    """-> top-k [(member_ordinal, doc_id, score)] across every member.

    ``query``: a :class:`Bool` or query-string text. Query strings
    parse PER MEMBER (each member's dictionary drives its wildcard /
    fuzzy expansions — ES multi-index behavior). Ties order by
    (score desc, doc_id asc, member asc); the member ordinal is the
    position in ``index_dirs`` (the ES ``_index`` analog)."""
    if not index_dirs:
        raise ValueError("multi_index_search needs at least one index dir")
    dirs = [os.path.abspath(d) for d in index_dirs]
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
            spark, d, [(0, q, int(k))], execution=execution
        )[0]
        out.extend((i, did, s) for did, s in hits)
    out.sort(key=lambda x: (-x[2], x[1], x[0]))
    return out[:k]
