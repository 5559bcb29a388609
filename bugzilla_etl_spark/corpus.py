"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Shape fixed by BASELINE.json input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Content is a seeded Zipfian mix of (a) a shared keyword pool (hot-term
skew — `return`, `int`, ... dominate, like the reference's uniform
bug_id keyspace does NOT, forcing our salting/partitioning to matter),
(b) per-repo identifier vocab, (c) rare unique tokens (df=1 scoring),
(d) punctuation/operators to exercise the tokenizer. 50–2,000 tokens
per doc so BM25 length normalization (b) matters.

Generation is distributed (mapInPandas over ``spark.range``) and fully
deterministic per doc index — same corpus at any parallelism
(FIXTURES.md invariant 5), no wall-clock, no unseeded RNG.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["python", "java", "js", "go", "rust", "c"]
EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "rust": "rs", "c": "c"}

# hot shared keyword pool — Zipf rank order
KEYWORDS = [
    "return", "int", "if", "for", "def", "var", "let", "fn", "func", "void",
    "self", "this", "new", "class", "struct", "impl", "pub", "static", "const",
    "import", "from", "package", "while", "else", "switch", "case", "break",
    "continue", "true", "false", "null", "none", "len", "err", "error", "string",
    "float", "bool", "map", "list", "vec", "array", "print", "println", "log",
    "assert", "test", "main", "init", "get", "set",
]
PUNCT = ["(", ")", "{", "}", ";", "==", "->", "::", "=", "+", ".", ",", "[", "]"]

CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def _doc_content(rng: np.ndarray, i: int) -> tuple[str, str, str, str, str]:
    """Deterministic doc #i. ``rng`` unused — kept for signature clarity."""
    r = np.random.default_rng(1_000_003 * i + 42)
    repo = f"org{i % 7}/repo{i % 53}"
    lang = LANGS[i % len(LANGS)]
    path = f"src/module{(i // 7) % 31}/file{i % 101}.{EXT[lang]}"
    commit = hashlib.sha1(f"{repo}:{path}:{i}".encode()).hexdigest()

    n_tokens = int(50 + (r.pareto(1.3) * 120) % 1951)  # 50..2000
    # Zipfian keyword picks
    zipf_idx = np.minimum(r.zipf(1.35, size=n_tokens) - 1, len(KEYWORDS) - 1)
    toks = [KEYWORDS[j] for j in zipf_idx]
    # per-repo identifiers on ~30% of slots
    ident_mask = r.random(n_tokens) < 0.30
    ident_ids = r.integers(0, 40, size=n_tokens)
    repo_tag = f"r{i % 53}"
    for k in np.flatnonzero(ident_mask):
        toks[k] = f"{repo_tag}_sym{ident_ids[k]}"
    # rare unique token in ~10% of docs (df==1 terms)
    if i % 10 == 3:
        toks[int(r.integers(0, n_tokens))] = f"uniq_{i}"
    # sprinkle punctuation between tokens (~20%)
    punct_mask = r.random(n_tokens) < 0.20
    punct_ids = r.integers(0, len(PUNCT), size=n_tokens)
    pieces = []
    for k, t in enumerate(toks):
        pieces.append(t)
        if punct_mask[k]:
            pieces.append(PUNCT[punct_ids[k]])
    return repo, path, commit, lang, " ".join(pieces)


def generate_corpus_pdf(n_docs: int, start: int = 0) -> pd.DataFrame:
    rows = [_doc_content(None, i) for i in range(start, start + n_docs)]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def generate_corpus(
    spark: SparkSession, n_docs: int, partitions: int = 32, start: int = 0
) -> DataFrame:
    """Distributed deterministic corpus: doc #i is a pure function of i.
    ``start`` offsets the id range — fresh, non-overlapping docs for
    incremental-update benchmarks."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = [_doc_content(None, int(i)) for i in ids]
            yield pd.DataFrame(
                rows, columns=["repo", "path", "commit", "lang", "content"]
            )

    return (
        spark.range(start, start + n_docs, 1, partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )
