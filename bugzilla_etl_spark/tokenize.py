"""The shared analyzer.

The reference indexes its one fulltext field through custom pattern
tokenizers + filters declared once in the ES mapping and used identically
at index and query time (/root/reference/configuration/es/bug_version.json:4-35,
294-303). We keep that contract: ONE tokenizer definition, with four
bit-identical implementations used by (a) the JVM build path, (b) the
Arrow-UDF build path, (c) the pure-Python oracle, (d) the DuckDB oracle SQL.

Tokenization = lowercase, then extract maximal runs of ``[a-z0-9_]``.
This is a pattern tokenizer in the exact spirit of the reference's
whiteboard tokenizers (split on ``[\\[\\];,\\s]+`` etc.) adapted to source
code: identifiers/keywords/numbers survive, operators and punctuation
split.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = re.compile(r"[a-z0-9_]+")

#: regex used by Spark / DuckDB variants (applied AFTER lower()).
TOKEN_PATTERN = "[a-z0-9_]+"

#: the SECOND pattern tokenizer (the reference's `whiteboard_tokens`
#: analog, configuration/es/bug_version.json:15-25: same field, a
#: different split discipline): underscores SPLIT too, so identifiers
#: and paths decompose into their words — `hash_table` -> hash, table;
#: `src/io_util.py` -> src, io, util, py. Four-way field parity =
#: {code_v1, path_v1} x {plain, shingled}.
PATH_TOKEN_RE = re.compile(r"[a-z0-9]+")
PATH_TOKEN_PATTERN = "[a-z0-9]+"


def _base_chain(chain: str) -> tuple[str, str]:
    """(tokenizer base, filter suffix) for an analyzer chain name."""
    for base in ("path_v1", "code_v1"):
        if chain == base or chain.startswith(base + "_"):
            return base, chain[len(base):]
    raise ValueError(f"unknown analyzer chain {chain!r}")


# ---------------------------------------------------------------- python
def py_tokens(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle's analyzer."""
    return TOKEN_RE.findall(text.lower())


def py_path_tokens(text: str) -> list[str]:
    return PATH_TOKEN_RE.findall(text.lower())


def py_term_freqs(text: str) -> dict[str, int]:
    return dict(Counter(py_tokens(text)))


# ------------------------------------------------------------------ JVM
def spark_tokens(col: Column) -> Column:
    """JVM-side tokenizer: lower -> extract maximal token runs.

    ``regexp_extract_all`` is the literal Catalyst analog of
    ``re.findall`` (and of the DuckDB oracle fragment) — it emits the
    match list directly. The previous split-on-separators + drop-''
    form produced identical tokens (verified row-for-row at sf0.01 and
    sf1.0) but materialized the separator split's intermediate array;
    measured 2.6 s vs 0.45 s for the full-corpus tokenize at sf1.0
    (guide §1.2 per-task work — same plan shape, ~5x cheaper stage).
    """
    return F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0)


# ---------------------------------------------------------------- arrow
def pandas_tokens(texts: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer (Arrow batch in, Arrow batch out).

    Used by the Arrow-UDF build path; semantics identical to
    ``py_tokens`` (``Series.str.findall`` is the same regex engine).
    """
    return texts.str.lower().str.findall(TOKEN_RE)


# --------------------------------------------------------------- duckdb
def duckdb_tokens_sql(expr: str) -> str:
    """DuckDB SQL fragment producing the same token list."""
    return f"regexp_extract_all(lower({expr}), '{TOKEN_PATTERN}')"


# ------------------------------------------------------- analyzer chains
#: the Lucene/ES default English stopword set — the reference runs every
#: whiteboard tokenizer through a `stop` filter built on this list
#: (configuration/es/bug_version.json:294-303)
STOPWORDS_FT = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
)
_STOP_SET = frozenset(STOPWORDS_FT)

#: analyzer chains, mirroring the reference's four-way field indexing
#: (tokenizer x plain/shingled, all through `stop`,
#: configuration/es/bug_version.json:4-35):
#: - code_v1: pattern tokenizer only (identifiers/keywords/numbers)
#: - code_v1_stop: + stopword filter
#: - code_v1_shingle: + stopword filter + 2-shingles (unigrams AND
#:   bigrams, the ES shingle-filter default output_unigrams=true) —
#:   bigram terms give phrase-ish matching
ANALYZER_CHAINS = (
    "code_v1", "code_v1_stop", "code_v1_shingle",
    "path_v1", "path_v1_stop", "path_v1_shingle",
)


def _py_chain(tokens: list[str], chain: str) -> list[str]:
    base, suffix = _base_chain(chain)
    if suffix == "":
        return tokens
    kept = [t for t in tokens if t not in _STOP_SET]
    if suffix == "_stop":
        return kept
    if suffix == "_shingle":
        return kept + [f"{a}_{b}" for a, b in zip(kept, kept[1:])]
    raise ValueError(f"unknown analyzer chain {chain!r}")


def py_analyze(text: str, chain: str = "code_v1") -> list[str]:
    """Pure-Python analyzer chain — the oracle's and the query parser's."""
    base, _ = _base_chain(chain)
    toks = py_path_tokens(text) if base == "path_v1" else py_tokens(text)
    return _py_chain(toks, chain)


def pandas_analyze(texts: pd.Series, chain: str = "code_v1") -> pd.Series:
    """Arrow-batch analyzer chain (build path)."""
    base, suffix = _base_chain(chain)
    toks = (
        texts.str.lower().str.findall(PATH_TOKEN_RE)
        if base == "path_v1"
        else pandas_tokens(texts)
    )
    if suffix == "":
        return toks
    return toks.map(lambda ts: _py_chain(ts, chain))


def spark_path_tokens(col: Column) -> Column:
    """JVM-side path_v1 tokenizer (underscores split too); same
    regexp_extract_all form as ``spark_tokens``."""
    return F.regexp_extract_all(F.lower(col), F.lit(PATH_TOKEN_PATTERN), 0)


def spark_analyze(col: Column, chain: str = "code_v1") -> Column:
    """JVM analyzer chain: higher-order array functions, codegen'd."""
    base, suffix = _base_chain(chain)
    toks = spark_path_tokens(col) if base == "path_v1" else spark_tokens(col)
    if suffix == "":
        return toks
    kept = F.filter(toks, lambda x: ~x.isin(*STOPWORDS_FT))
    if suffix == "_stop":
        return kept
    if suffix == "_shingle":
        # zip_with(kept, kept[1:]) — NOT element_at(kept, i) inside a
        # transform over indices, which re-evaluates the stop-filter per
        # element access (O(n^2) per row, measured ~9x slower)
        bigrams = F.when(
            F.size(kept) >= 2,
            F.zip_with(
                kept,
                F.slice(kept, 2, F.size(kept) - 1),
                lambda a, b: F.when(b.isNotNull(), F.concat_ws("_", a, b)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return F.concat(kept, F.filter(bigrams, lambda x: x.isNotNull()))
    raise ValueError(f"unknown analyzer chain {chain!r}")


def spark_analyze_df(df, src: str, chain: str = "code_v1", out: str = "terms"):
    """DataFrame-level analyzer chain: token-identical to
    ``spark_analyze`` but each chain stage is its own projection, so the
    stop-filtered array is computed ONCE per row. The single-Column form
    embeds the ``kept`` subexpression four times (zip_with, slice, size,
    concat) and neither CollapseProject nor whole-stage codegen CSE
    eliminates the duplicates — measured ~2x slower on the shingle chain
    at sf0.1. Drops ``src`` and keeps every other column."""
    other = [c for c in df.columns if c != src]
    base, suffix = _base_chain(chain)
    toks = (
        spark_path_tokens(F.col(src))
        if base == "path_v1"
        else spark_tokens(F.col(src))
    )
    if suffix == "":
        return df.select(*other, toks.alias(out))
    kept = F.filter(toks, lambda x: ~x.isin(*STOPWORDS_FT))
    kdf = df.select(*other, kept.alias("__kept"))
    if suffix == "_stop":
        return kdf.select(*other, F.col("__kept").alias(out))
    if suffix == "_shingle":
        k = F.col("__kept")
        bigrams = F.when(
            F.size(k) >= 2,
            F.zip_with(
                k,
                F.slice(k, 2, F.size(k) - 1),
                lambda a, b: F.when(b.isNotNull(), F.concat_ws("_", a, b)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return kdf.select(
            *other,
            F.concat(k, F.filter(bigrams, lambda x: x.isNotNull())).alias(out),
        )
    raise ValueError(f"unknown analyzer chain {chain!r}")


def duckdb_path_tokens_sql(expr: str) -> str:
    return f"regexp_extract_all(lower({expr}), '{PATH_TOKEN_PATTERN}')"


def duckdb_analyze_sql(expr: str, chain: str = "code_v1") -> str:
    """DuckDB SQL fragment producing the same analyzed token list."""
    base, suffix = _base_chain(chain)
    toks = (
        duckdb_path_tokens_sql(expr) if base == "path_v1" else duckdb_tokens_sql(expr)
    )
    if suffix == "":
        return toks
    stop_list = ",".join(f"'{s}'" for s in STOPWORDS_FT)
    kept = f"list_filter({toks}, x -> NOT list_contains([{stop_list}], x))"
    if suffix == "_stop":
        return kept
    if suffix == "_shingle":
        return (
            f"(SELECT list_concat(k, CASE WHEN len(k) >= 2 THEN "
            f"list_transform(range(1, len(k)), i -> k[i] || '_' || k[i+1]) "
            f"ELSE [] END) FROM (SELECT {kept} AS k))"
        )
    raise ValueError(f"unknown analyzer chain {chain!r}")


# ---------------------------------------------------------- term bucket
def py_term_bucket(term: str, n_tb: int) -> int:
    """Deterministic term-hash bucket, identical across Python / Spark /
    SQL engines (md5 hex prefix -> int): the partition-pruning key."""
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:15], 16) % n_tb


def spark_term_bucket(col: Column, n_tb: int) -> Column:
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % n_tb
    ).cast("int")
