"""ES ``more_like_this``: find documents similar to a text or a doc.

Two phases, mirroring Lucene's MoreLikeThis:

1. **Interesting-term selection** (driver-side, plan-time data): the
   like-input's analyzed tokens are scored ``tf_in_input · idf`` (the
   index's Lucene idf from a dictionary df lookup — no Spark job),
   filtered by ``min_term_freq`` / ``min_doc_freq`` / ``max_doc_freq``,
   and the top ``max_query_terms`` by (score desc, term asc) become the
   query. Deterministic where Lucene's priority queue is
   tie-unspecified.

2. **Execution**: the selected terms run as a BM25 OR query with
   ``minimum_should_match`` (ES-style percentage or absolute count)
   through the tuned msm executor (rarest-first candidate union) —
   candidates, pruning, and scoring identical to a hand-written
   search_many call on the same terms.

``like`` accepts raw text; ``like_id`` accepts a doc_id and reads its
stored ``_source`` (build_index(store_source=True)), excluding the
source doc from results like ES. Scale shape: phase 1 touches only
dictionary row groups for the input's terms (bloom-pruned segments);
phase 2 is the standard bucket fan-out.

Reference parity: the reference's "find duplicate bugs" workflow is
exactly this ES query over the bug-version index (SURVEY.md §3.4).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from ..oracle import idf as _idf
from ..tokenize import py_analyze
from .manifest import IndexManifest
from .query import _lookup_terms, fetch_docs, search_many


def mlt_select_terms(
    index_dir: str,
    like: str,
    field: str = "content",
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
    unlike: str | None = None,
) -> list[str]:
    """Phase 1 alone (exposed for introspection/tests): the selected
    interesting terms, ranked (tf·idf desc, term asc).

    ``unlike`` (ES more_like_this.unlike): negative-example text whose
    term frequencies SUBTRACT from the like text's before selection —
    a term the unlike text uses as often as the like text drops out
    entirely, steering the query away from what the caller does NOT
    want more of."""
    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    chain = m.field_chain(field)
    toks = py_analyze(like, chain)
    tfs: dict[str, int] = {}
    for t in toks:
        tfs[t] = tfs.get(t, 0) + 1
    if unlike:
        for t in py_analyze(unlike, chain):
            if t in tfs:
                tfs[t] -= 1
        tfs = {t: tf for t, tf in tfs.items() if tf > 0}
    cand = sorted(t for t, tf in tfs.items() if tf >= int(min_term_freq))
    if not cand:
        return []
    dfs = _lookup_terms(m, index_dir, cand, field)
    scored = []
    for t in cand:
        df = int(dfs.get(t, 0))
        if df < int(min_doc_freq):
            continue
        if max_doc_freq is not None and df > int(max_doc_freq):
            continue
        scored.append((-(tfs[t] * _idf(m.n_docs, df)), t))
    scored.sort()
    return [t for _, t in scored[: int(max_query_terms)]]


def _msm_count(minimum_should_match, n: int) -> int | None:
    """ES minimum_should_match: an int is absolute; a float in (0, 1]
    is a percentage of the selected terms (ES "30%"), rounded down,
    floor 1. None keeps plain OR."""
    if minimum_should_match is None:
        return None
    if isinstance(minimum_should_match, float):
        if not 0.0 < minimum_should_match <= 1.0:
            raise ValueError(
                f"fractional minimum_should_match must be in (0, 1]: "
                f"{minimum_should_match}"
            )
        return max(1, math.floor(minimum_should_match * n))
    v = int(minimum_should_match)
    if v < 1:
        raise ValueError(f"minimum_should_match must be >= 1: {v}")
    return min(v, n)


def mlt_search(
    spark: SparkSession,
    index_dir: str,
    like: str | None = None,
    like_id: int | None = None,
    field: str = "content",
    k: int = 10,
    max_query_terms: int = 25,
    min_term_freq: int = 1,
    min_doc_freq: int = 2,
    max_doc_freq: int | None = None,
    minimum_should_match: float | int | None = 0.3,
    predicate: list | None = None,
    execution: str = "auto",
    unlike: str | None = None,
) -> list[tuple[int, float]]:
    """ES more_like_this -> [(doc_id, score)] (BM25 over the selected
    interesting terms). Exactly one of ``like`` (raw text) / ``like_id``
    (a stored doc — requires store_source builds) must be given; with
    ``like_id`` the source doc is excluded from results (ES behavior).
    """
    if (like is None) == (like_id is None):
        raise ValueError("give exactly one of like= / like_id=")
    index_dir = os.path.abspath(index_dir)
    exclude: int | None = None
    if like_id is not None:
        m = IndexManifest.load(index_dir)
        if not getattr(m, "store_source", False):
            raise ValueError(
                "like_id needs stored _source; rebuild with "
                "build_index(store_source=True) or pass like= text"
            )
        row = fetch_docs(index_dir, [int(like_id)], columns=["content"])
        if not len(row):
            raise ValueError(f"like_id {like_id} is not a live doc")
        like = str(row["content"].iloc[0])
        exclude = int(like_id)
    terms = mlt_select_terms(
        index_dir, like, field, max_query_terms, min_term_freq,
        min_doc_freq, max_doc_freq, unlike=unlike,
    )
    if not terms:
        return []
    msm = _msm_count(minimum_should_match, len(terms))
    # over-fetch by one when the source doc may occupy a slot
    kk = int(k) + (1 if exclude is not None else 0)
    res = search_many(
        spark, index_dir, [(0, " ".join(terms), kk)], field=field,
        min_should_match=msm, predicate=predicate, execution=execution,
    )[0]
    if exclude is not None:
        res = [(d, s) for d, s in res if d != exclude]
    return res[: int(k)]
