"""ES ``_msearch``: one request, many heterogeneous queries.

The batched executors deliberately share per-batch context — one
analyzed field, ONE filter, one sort/cursor per ``bool_search_many``
call — because every (segment, shard-bucket) task resolves the filter
once and serves all queries in the batch. A real dashboard refresh,
though, fires a MIXED bag: different filters, different fields,
attr-sorted panes next to score-ranked ones (the reference's Kibana
consumers do exactly this against the ES `bugs` alias). This module is
that front door.

``msearch`` partitions the request into compatibility groups — equal
(field, filter, sort_by, search_after, collapse, collapse_inner_hits)
batch together — and runs ONE ``bool_search_many`` per group, so a
homogeneous request keeps paying a single Spark job (nothing regresses)
and a heterogeneous request pays one job per distinct context, exactly
the per-request cost ES pays. Entries may be ``Bool`` objects or
query-STRING text (parsed through ``parse_query_string`` against this
index's manifest — the two front doors compose).

Group execution order is deterministic (first-seen order); results
reassemble by the caller's query ids.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .boolquery import Bool, bool_search_many
from .manifest import IndexManifest
from .querystring import parse_query_string

__all__ = ["msearch"]

#: per-entry options an msearch item may carry (ES per-line request
#: body); anything else is a typo and raises
_ENTRY_OPTS = frozenset(
    {"sort_by", "search_after", "collapse", "collapse_inner_hits"}
)


def msearch(
    spark: SparkSession,
    index_dir: str,
    requests: list,
    default_operator: str = "or",
    execution: str = "auto",
) -> dict[int, list[tuple]]:
    """[(qid, query, k) | (qid, query, k, opts)] -> {qid: hits}.

    ``query``: a :class:`Bool` or a query-string ``str`` (parsed with
    this index's manifest; wildcards/fuzzy/filters all work).
    ``opts``: optional dict with any of ``sort_by``, ``search_after``,
    ``collapse``, ``collapse_inner_hits`` — per entry, like an ES
    msearch line. Entries with equal (field, filter, opts) context run
    in one ``bool_search_many`` batch."""
    import os

    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    seen: set[int] = set()
    groups: dict[tuple, list[tuple[int, Bool, int]]] = {}
    for req in requests:
        if len(req) == 3:
            (qid, query, k), opts = req, {}
        elif len(req) == 4:
            qid, query, k, opts = req
            opts = dict(opts or {})
        else:
            raise ValueError(
                f"msearch entry must be (qid, query, k[, opts]): {req!r}"
            )
        unknown = set(opts) - _ENTRY_OPTS
        if unknown:
            raise ValueError(
                f"unknown msearch opts {sorted(unknown)}; "
                f"expected {sorted(_ENTRY_OPTS)}"
            )
        qid = int(qid)
        if qid in seen:
            raise ValueError(f"duplicate msearch query id {qid}")
        seen.add(qid)
        if isinstance(query, str):
            query = parse_query_string(
                query, m=m, index_dir=index_dir,
                default_operator=default_operator,
            )
        elif not isinstance(query, Bool):
            raise ValueError(
                f"msearch query must be a Bool or a query string: {query!r}"
            )
        sort_by = opts.get("sort_by")
        after = opts.get("search_after")
        key = (
            query.field,
            query.filter,
            tuple(sort_by) if sort_by is not None else None,
            tuple(after) if after is not None else None,
            opts.get("collapse"),
            opts.get("collapse_inner_hits"),
        )
        groups.setdefault(key, []).append((qid, query, int(k)))

    results: dict[int, list[tuple]] = {}
    for key, batch in groups.items():
        _field, _flt, sort_by, after, collapse, inner = key
        out = bool_search_many(
            spark, index_dir, batch,
            sort_by=sort_by, search_after=after, collapse=collapse,
            collapse_inner_hits=inner, execution=execution,
        )
        results.update(out)
    return results
