"""ES highlighting: mark query-term occurrences in stored _source.

The reference's consumers render search results with matched terms
emphasized (the ES ``highlight`` request block); the engine analog works
on indexes built with ``build_index(store_source=True)`` (the docs
dimension then carries the raw ``content`` column, the ES _source).

Semantics follow the ES plain highlighter:

- the FIELD's analyzer decides what matches: the query text is analyzed
  with the field's chain and an occurrence is a source token whose
  analyzed form equals a query term. Stop-filtered chains therefore
  never highlight a stopword; shingled chains additionally match bigram
  terms by marking BOTH constituent tokens.
- offsets come from a case-preserving tokenizer pass over the ORIGINAL
  text (``[A-Za-z0-9_]+`` for code_v1, ``[A-Za-z0-9]+`` for path_v1 —
  the lowercase-then-match build tokenizer over ASCII yields the same
  token stream, and matching case-insensitively on the raw text keeps
  byte offsets exact without assuming ``str.lower`` preserves length).
- fragments: best-effort ES plain-highlighter shape — split the doc
  into windows of ``fragment_size`` characters aligned to match
  boundaries, score each window by contained matches, return the top
  ``n_fragments`` in document order. ``fragment_size=0`` returns the
  whole marked text as one fragment.

Everything is driver-side over the top-k hit list (k docs, one
pushed-down _source fetch) — no Spark job; the work is O(k · doc_len),
independent of corpus size.
"""

from __future__ import annotations

import re

from ..tokenize import _STOP_SET, _base_chain
from .manifest import IndexManifest
from .query import fetch_docs

#: case-preserving span tokenizers (see module docstring)
_SPAN_RE = {
    "code_v1": re.compile(r"[A-Za-z0-9_]+"),
    "path_v1": re.compile(r"[A-Za-z0-9]+"),
}


def token_spans(text: str, chain: str) -> list[tuple[str, int, int]]:
    """[(lowercased token, start, end)] over the original text."""
    base, _ = _base_chain(chain)
    return [
        (m.group(0).lower(), m.start(), m.end())
        for m in _SPAN_RE[base].finditer(text)
    ]


def match_spans(
    text: str, chain: str, qterms: set[str]
) -> list[tuple[int, int]]:
    """Character spans of tokens matching any analyzed query term,
    merged where adjacent spans touch or overlap (a bigram match marks
    both constituents; ES merges abutting <em> runs)."""
    spans = token_spans(text, chain)
    _, suffix = _base_chain(chain)
    stop_filtered = suffix in ("_stop", "_shingle")
    kept = (
        [(t, s, e) for t, s, e in spans if t not in _STOP_SET]
        if stop_filtered
        else spans
    )
    hit: list[tuple[int, int]] = []
    for t, s, e in kept:
        if t in qterms:
            hit.append((s, e))
    if suffix == "_shingle":
        for (t1, s1, _e1), (t2, _s2, e2) in zip(kept, kept[1:]):
            if f"{t1}_{t2}" in qterms:
                hit.append((s1, e2))
    if not hit:
        return []
    hit.sort()
    merged = [hit[0]]
    for s, e in hit[1:]:
        if s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged


def _mark(text: str, spans: list[tuple[int, int]], pre: str, post: str) -> str:
    out, cur = [], 0
    for s, e in spans:
        out.append(text[cur:s])
        out.append(pre)
        out.append(text[s:e])
        out.append(post)
        cur = e
    out.append(text[cur:])
    return "".join(out)


def highlight_text(
    text: str,
    chain: str,
    qterms: set[str],
    pre: str = "<em>",
    post: str = "</em>",
    fragment_size: int = 100,
    n_fragments: int = 1,
) -> list[str]:
    """Marked fragments for one document (empty when nothing matches)."""
    spans = match_spans(text, chain, qterms)
    if not spans:
        return []
    if fragment_size <= 0:
        return [_mark(text, spans, pre, post)]
    # window per match cluster: greedy left-aligned windows of
    # fragment_size starting at each first uncovered match
    frags: list[tuple[int, int, int]] = []  # (start, end, n_matches)
    i = 0
    while i < len(spans):
        w_start = max(0, spans[i][0] - max(0, (fragment_size - (spans[i][1] - spans[i][0])) // 4))
        w_end = min(len(text), w_start + fragment_size)
        n = 0
        j = i
        while j < len(spans) and spans[j][1] <= w_end:
            n += 1
            j += 1
        frags.append((w_start, w_end, n))
        i = j if j > i else i + 1
    # top n_fragments by match count (ties: document order), emitted in
    # document order — the ES plain-highlighter contract
    best = sorted(
        sorted(frags, key=lambda f: (-f[2], f[0]))[: max(1, n_fragments)]
    )
    out = []
    for w_start, w_end, _n in best:
        inner = [
            (max(s, w_start), min(e, w_end))
            for s, e in spans
            if s < w_end and e > w_start
        ]
        out.append(_mark(text[w_start:w_end], [(s - w_start, e - w_start) for s, e in inner], pre, post))
    return out


def highlight_docs(
    index_dir: str,
    doc_ids: list[int],
    query: str,
    field: str = "content",
    pre: str = "<em>",
    post: str = "</em>",
    fragment_size: int = 100,
    n_fragments: int = 1,
) -> dict[int, list[str]]:
    """ES highlight over a hit list: {doc_id: [marked fragments]}.

    ``doc_ids`` is a search result's id list (any order, typically k
    ids); docs without a match — or tombstoned/unknown ids — map to [].
    Requires ``build_index(store_source=True)``."""
    from ..tokenize import py_analyze

    import os

    index_dir = os.path.abspath(index_dir)
    m = IndexManifest.load(index_dir)
    if not m.store_source:
        raise ValueError(
            "index was built without store_source=True; the docs "
            "dimension carries no _source to highlight"
        )
    chain = m.field_chain(field)
    qterms = set(py_analyze(query, chain))
    out: dict[int, list[str]] = {int(d): [] for d in doc_ids}
    if not qterms or not doc_ids:
        return out
    pdf = fetch_docs(index_dir, list(doc_ids), columns=["content"])
    if not len(pdf) or "content" not in pdf.columns:
        return out
    for d, text in zip(pdf["doc_id"], pdf["content"]):
        if text is None:
            continue
        out[int(d)] = highlight_text(
            str(text), chain, qterms, pre, post, fragment_size, n_fragments
        )
    return out
