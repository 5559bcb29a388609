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
SPLIT_PATTERN = "[^a-z0-9_]+"


# ---------------------------------------------------------------- python
def py_tokens(text: str) -> list[str]:
    """Pure-Python tokenizer — the oracle's analyzer."""
    return TOKEN_RE.findall(text.lower())


def py_term_freqs(text: str) -> dict[str, int]:
    return dict(Counter(py_tokens(text)))


# ------------------------------------------------------------------ JVM
def spark_tokens(col: Column) -> Column:
    """JVM-side tokenizer: lower -> split on non-token runs -> drop ''.

    Whole-stage-codegen'd; no Python in the loop. ``split`` can emit
    leading/trailing empty strings when the text starts/ends with a
    separator — filtered out to match ``re.findall`` semantics.
    """
    parts = F.split(F.lower(col), SPLIT_PATTERN)
    return F.filter(parts, lambda x: x != F.lit(""))


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
