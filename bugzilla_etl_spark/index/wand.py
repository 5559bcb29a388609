"""Block-max WAND: exact top-k with block skipping.

Per-shard query executor over the compressed block format. Decoding a
block is deferred until the WAND pivot logic proves it might contain a
doc that can beat the current threshold theta — the per-block
``max_impact`` metadata provides the upper bounds (the reference
delegates this to Lucene; here it is ours, SURVEY.md §4).

Role: this is the EXACT block-skipping reference implementation — it
proves the block-max metadata sound (property-tested equal to the
exhaustive scorer, and it demonstrably skips block decodes on skewed
lists). The production batch path is the vectorized MaxScore family in
query.py (_score_maxscore / _score_single_hot / _score_multi_hot):
numpy block decode+accumulate with impact-ordered early termination
beats this per-doc Python loop by orders of magnitude on Zipf-hot
lists, so ``use_wand=True`` is for correctness cross-checks and
selective (rare-term) queries, not hot-term batch throughput.

Exactness (SURVEY.md §7.3):
- pruning uses strict ``< theta`` skip tests, so score ties survive and
  the (score desc, doc_id asc) tie-break matches the exhaustive oracle;
- a doc's score sums its per-term contributions in sorted (term, salt)
  order — the same accumulation order as the exhaustive path and the
  pure-Python oracle, so scores are bit-identical, not merely close.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from ..codec import delta_decode, u64_to_doc_id, varint_decode

_ONE = np.uint64(1)
_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


@dataclass
class Block:
    first: np.uint64
    last: np.uint64
    max_impact: float
    gaps: bytes
    tfs: bytes
    dls: bytes


class TermCursor:
    """One (term, salt) sub-list: lazily-decoded block cursor.

    Sub-lists of a salted term are separate cursors sharing the same idf;
    each doc appears in exactly one sub-list per term, so scores add up
    exactly as for the unsalted list.
    """

    __slots__ = (
        "term", "salt", "idf", "blocks", "bi", "pos", "docs", "imps",
        "exhausted", "decoded_blocks", "k1", "b", "avgdl", "_lasts", "ub",
    )

    def __init__(
        self,
        term: str,
        salt: int,
        idf: float,
        blocks: list[Block],
        k1: float,
        b: float,
        avgdl: float,
    ):
        self.term, self.salt, self.idf = term, salt, idf
        self.blocks = sorted(blocks, key=lambda blk: int(blk.first))
        self._lasts = np.array([int(blk.last) for blk in self.blocks], dtype=np.uint64)
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.ub = idf * max(blk.max_impact for blk in self.blocks)
        self.bi = -1
        self.docs: np.ndarray | None = None
        self.imps: np.ndarray | None = None
        self.pos = 0
        self.exhausted = False
        self.decoded_blocks = 0
        self._advance_block()

    def _advance_block(self) -> None:
        self.bi += 1
        if self.bi >= len(self.blocks):
            self.exhausted = True
            self.docs = None
            return
        blk = self.blocks[self.bi]
        self.docs = delta_decode(varint_decode(blk.gaps))
        tf = varint_decode(blk.tfs).astype(np.float64)
        dl = varint_decode(blk.dls).astype(np.float64)
        self.imps = self.idf * (
            tf * (self.k1 + 1.0)
            / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
        )
        self.decoded_blocks += 1
        self.pos = 0

    @property
    def doc(self) -> np.uint64:
        return _U64_MAX if self.exhausted else self.docs[self.pos]

    def score(self) -> float:
        return float(self.imps[self.pos])

    def block_max(self) -> float:
        return self.idf * self.blocks[self.bi].max_impact

    def block_last(self) -> np.uint64:
        return np.uint64(self._lasts[self.bi])

    def next(self) -> None:
        self.pos += 1
        if self.pos >= len(self.docs):
            self._advance_block()

    def seek(self, target: np.uint64) -> None:
        """Advance to the first doc >= target; skips (never decodes)
        intermediate blocks whose last doc < target."""
        if self.exhausted:
            return
        if self._lasts[self.bi] < target:
            nxt = int(np.searchsorted(self._lasts, target, side="left"))
            if nxt >= len(self.blocks):
                self.exhausted = True
                self.docs = None
                return
            self.bi = nxt - 1
            self._advance_block()
        self.pos = int(np.searchsorted(self.docs, target, side="left"))
        if self.pos >= len(self.docs):
            self._advance_block()


def _in_sorted(arr: np.ndarray, x: np.uint64) -> bool:
    i = int(np.searchsorted(arr, x))
    return i < len(arr) and arr[i] == x


def wand_topk(
    cursors: list[TermCursor],
    k: int,
    allowed: np.ndarray | None = None,
    banned: np.ndarray | None = None,
) -> list[tuple[int, float]]:
    """Exact top-k (doc_id int64, score) via block-max WAND.

    Returns <= k results sorted by (score desc, doc_id asc).

    ``allowed`` / ``banned`` (sorted u64): membership gates applied at
    HEAP INSERTION — a filtered-out doc is scored-then-dropped but never
    raises theta, so the result is the exact top-k over the filtered doc
    space. Pruning stays sound: every skip bound dominates any doc's
    score, filtered or not. This replaces the old k+|tombstones|
    over-fetch (which is only exact for small exclusion sets) and gives
    predicate support for free.
    """
    heap: list[tuple[float, int]] = []  # (score, -doc_i64); root = worst kept
    theta = float("-inf")
    live = [c for c in cursors if not c.exhausted]

    while live:
        # (doc, term, salt) order: cursors at the same doc line up in the
        # exact-score accumulation order, so every floating-point bound
        # below (acc, bub) is a left-to-right sum whose shared terms
        # appear in the same relative order as the score sum — rounding
        # monotonicity then guarantees bound >= score BIT-WISE, making
        # the strict < theta skip tests sound even on exact score ties.
        live.sort(key=lambda c: (int(c.doc), c.term, c.salt))
        # pivot: smallest prefix whose list-level UB sum can reach theta.
        # Bounds are CLAMPED at 0: a term's idf goes negative when
        # tombstones push df past the live N (Lucene deleted-doc docFreq
        # until compaction), and a doc ABSENT from that term's list
        # contributes 0 > ub — an unclamped sum would under-bound it and
        # skip true top-k docs.
        acc = 0.0
        pivot = -1
        for i, c in enumerate(live):
            acc += c.ub if c.ub > 0.0 else 0.0
            if len(heap) < k or acc >= theta:
                pivot = i
                break
        if pivot == -1:
            break  # nothing can beat theta: done
        pdoc = live[pivot].doc
        if live[0].doc == pdoc:
            # sorted order => cursors 0..pivot are ALL positioned at pdoc,
            # so each current block contains pdoc and block_max is a valid
            # pdoc-specific bound. Cursors after pivot at pdoc also count.
            at_pivot = [c for c in live if c.doc == pdoc]
            # left-to-right in (term, salt) order — same order as the
            # exact score below, so bub >= score exactly (see sort note)
            bub = 0.0
            for c in at_pivot:
                bm = c.block_max()
                bub += bm if bm > 0.0 else 0.0
            if len(heap) >= k and bub < theta:
                # BMW GetNewCandidate: the block-max sum only bounds docs
                # whose contributions come solely from the at-pivot lists.
                # A cursor positioned beyond pdoc caps the skippable range
                # at its current doc (docs >= it may draw extra score from
                # that list), so target = min(min block_last + 1, next_doc).
                target = min(int(c.block_last()) for c in at_pivot)
                if target != int(_U64_MAX):
                    target += 1
                if len(at_pivot) < len(live):
                    target = min(target, int(live[len(at_pivot)].doc))
                target_u64 = np.uint64(target)
                for c in at_pivot:
                    c.seek(target_u64)
            else:
                # exact score: accumulate in sorted (term, salt) order for
                # bit-identical parity with the exhaustive path
                contribs = sorted((c.term, c.salt, c.score()) for c in at_pivot)
                s = 0.0
                for _, _, v in contribs:
                    s += v
                eligible = (
                    (allowed is None or _in_sorted(allowed, pdoc))
                    and (banned is None or not _in_sorted(banned, pdoc))
                )
                if eligible:
                    d_i64 = int(u64_to_doc_id(np.array([pdoc], dtype=np.uint64))[0])
                    entry = (s, -d_i64)
                    if len(heap) < k:
                        heapq.heappush(heap, entry)
                    elif entry > heap[0]:
                        heapq.heapreplace(heap, entry)
                    if len(heap) >= k:
                        theta = heap[0][0]
                for c in at_pivot:
                    c.next()
        else:
            for c in live:
                if c.doc >= pdoc:
                    break
                c.seek(pdoc)
        live = [c for c in live if not c.exhausted]

    out = [(-nd, s) for s, nd in heap]
    out.sort(key=lambda t: (-t[1], t[0]))
    return out
