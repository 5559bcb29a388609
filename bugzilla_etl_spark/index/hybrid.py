"""Hybrid retrieval: reciprocal rank fusion of BM25 and kNN (ES RRF).

ES 8.8's ``rrf`` retriever fuses lexical and vector rankings without
score calibration: each retriever contributes ``1 / (rank_constant +
rank)`` for the docs in its top-``rank_window``, and docs sum their
contributions (a doc absent from a retriever's window contributes
nothing for it). Rank fusion beats score mixing because BM25 and
cosine live on incomparable scales — only the ORDER carries
information.

Spark shape: two existing exact searchers (the composable bool executor
and the knn scorer) each produce a k-bounded ranking; fusion is a
driver-side fold over at most ``2 x rank_window`` rows. Exactness: a
doc's fused score is fully determined by its rank in each window —
identical to ES's definition with the same windows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .boolquery import Bool, bool_search
from .knn import knn_search

__all__ = ["rrf_search"]


def rrf_search(
    spark: SparkSession,
    index_dir: str,
    query: Bool,
    query_vector,
    k: int = 10,
    rank_constant: int = 60,
    rank_window: int = 100,
    vector_attr: str = "embedding",
    metric: str = "cosine",
    execution: str = "auto",
) -> list[tuple[int, float]]:
    """Fuse the bool query's BM25 ranking with the vector's kNN ranking
    -> top-k [(doc_id, rrf_score)]. Both retrievers share the Bool's
    ``filter`` (ES applies the retriever tree's filter to every leaf),
    and each contributes ``1 / (rank_constant + rank)`` (rank is
    1-based) for its top-``rank_window`` docs; ties order by
    (fused score desc, doc_id asc)."""
    if rank_window < k:
        raise ValueError(
            f"rank_window ({rank_window}) must be >= k ({k})"
        )
    if not rank_constant >= 1:
        raise ValueError(f"rank_constant must be >= 1: {rank_constant}")
    lex = bool_search(
        spark, index_dir, query, k=int(rank_window), execution=execution
    )
    vec = knn_search(
        spark, index_dir, query_vector, k=int(rank_window),
        vector_attr=vector_attr,
        predicate=[list(c) for c in query.filter] or None,
        metric=metric, execution=execution,
    )
    fused: dict[int, float] = {}
    for ranking in (lex, vec):
        for rank, (doc_id, _score) in enumerate(ranking, 1):
            fused[doc_id] = fused.get(doc_id, 0.0) + 1.0 / (
                rank_constant + rank
            )
    out = sorted(fused.items(), key=lambda x: (-x[1], x[0]))
    return out[:k]
