"""Pure-Python exhaustive BM25 oracle.

The golden-diff discipline of the reference (stabilize() exists
specifically so "diffing between runs stays as similar as possible",
/root/reference/transformations/parse_bug_history.js:444-445,671-678)
mapped to retrieval: an exhaustive, no-pruning scorer whose top-k must
be rank-identical (ids AND scores, atol 1e-6; ties score desc then
doc_id asc) to every engine path.

BM25: k1=1.2, b=0.75, Lucene idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

import math
from collections import Counter
from dataclasses import dataclass, field

from .tokenize import py_analyze

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def impact(tf: float, doc_len: float, avgdl: float, k1: float = K1, b: float = B) -> float:
    return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * doc_len / avgdl))


@dataclass
class BM25Oracle:
    """In-memory exhaustive index over (doc_id -> text)."""

    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    chain: str = "code_v1"  # analyzer chain, shared by add() and search()

    def add(self, doc_id: int, text: str) -> None:
        tfs = dict(Counter(py_analyze(text, self.chain)))
        self.doc_len[doc_id] = sum(tfs.values())
        for term, tf in tfs.items():
            self.postings.setdefault(term, {})[doc_id] = tf

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / max(1, len(self.doc_len))

    def search(
        self, query: str, k: int = 10, allowed: set[int] | None = None
    ) -> list[tuple[int, float]]:
        """Exhaustive top-k: (doc_id, score), score desc then doc_id asc.

        ``allowed`` restricts the RESULT set (filtered search); idf /
        avgdl / N stay corpus-global — ES filter-context semantics,
        mirrored by the engine's predicate path."""
        terms = sorted(set(py_analyze(query, self.chain)))  # deterministic order
        n, avgdl = self.n_docs, self.avgdl
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = idf(n, len(plist))
            for doc_id, tf in plist.items():
                scores[doc_id] = scores.get(doc_id, 0.0) + w * impact(
                    tf, self.doc_len[doc_id], avgdl
                )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        if allowed is not None:
            ranked = [r for r in ranked if r[0] in allowed]
        return ranked[:k]


def build_oracle(rows, chain: str = "code_v1") -> BM25Oracle:
    """rows: iterable of (doc_id, content)."""
    o = BM25Oracle(chain=chain)
    for doc_id, content in rows:
        o.add(int(doc_id), content)
    return o
