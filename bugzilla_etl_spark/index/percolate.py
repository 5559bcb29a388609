"""ES percolator: match DOCUMENTS against STORED QUERIES, Spark-first.

ES percolation inverts search — queries are registered, and each new
document reports which queries it matches (the alerting/routing shape:
the reference's consumers run saved ES dashboard queries on a cron;
percolation is the push form of the same capability). On Spark the
idiomatic shape is a pure Catalyst plan: each stored ``Bool`` lowers to
a boolean ``Column`` over the document's analyzed token array
(array_intersect membership counts, element_at adjacency windows for
phrases, arrays_overlap for must_not, predicate.to_spark for the
filter context), and one ``explode`` emits (doc, query_id) pairs. No
Python UDF, no shuffle — whole-stage codegen end to end, so it
composes with streams (``readStream`` sources percolate with the same
plan) and scales with docs × stored queries.

Scale shape: the stored-query set rides the PLAN (a handful to a few
hundred rules — the alerting use case); each doc row is touched once.
For percolating against thousands of stored queries, register them in
batches — the plan stays linear in the batch size.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tokenize import spark_analyze
from .boolquery import Bool, _analyze_clauses
from .querystring import parse_query_string


def percolate_condition(q: Bool, terms: Column, chain: str = "code_v1") -> Column:
    """Lower one stored ``Bool`` to a boolean Column over an ordered
    analyzed-token array column ``terms``. Supports the gate surface:
    must / operator / msm, phrase (slop=0), should (alone = the ES
    bool-with-only-should msm=1 gate), must_not, filter (docs-frame
    columns). Rank-shaping options are meaningless for percolation
    (there is no ranking) and are rejected."""
    if q.multi_match or q.functions or q.negative or q.has_boosts():
        raise ValueError(
            "percolation is a match decision; multi_match / "
            "function_score / boosting / boosts do not apply"
        )
    if q.slop:
        raise ValueError("percolation supports exact phrases (slop=0)")
    match_cs, phrase_cs, neg, boost, _mbs, _pbs = _analyze_clauses(q, chain)
    if q.phrase and not phrase_cs:
        return F.lit(False)  # phrase analyzed to nothing: matches nothing
    if not match_cs and not phrase_cs and boost:
        match_cs = [(boost, 1)]  # should-only promotion
        boost = []
    conds: list[Column] = []
    for ts, need in match_cs:
        if need > len(ts):
            return F.lit(False)  # msm above clause arity: unmatchable
        hits = F.size(
            F.array_intersect(F.array_distinct(terms), F.array(*[F.lit(t) for t in ts]))
        )
        conds.append(hits >= F.lit(int(need)))
    def _adj_at(seq: list[str]):
        # pyspark infers higher-order-function arity from the Python
        # signature: the lambda must take EXACTLY one parameter (the
        # position), so the sequence binds via this closure
        def adj(i: Column) -> Column:
            return reduce(
                Column.__and__,
                [
                    F.element_at(terms, (i + F.lit(j)).cast("int"))
                    == F.lit(t)
                    for j, t in enumerate(seq)
                ],
            )

        return adj

    for seq, _sl in phrase_cs:
        L = len(seq)
        adj = _adj_at(list(seq))
        window = F.when(
            F.size(terms) >= F.lit(L),
            F.exists(
                F.sequence(F.lit(1), F.size(terms) - F.lit(L - 1)), adj
            ),
        ).otherwise(F.lit(False))
        conds.append(window)
    if neg:
        conds.append(
            ~F.arrays_overlap(terms, F.array(*[F.lit(t) for t in neg]))
        )
    if q.filter:
        from .predicate import to_spark, validate

        pred = [list(c) for c in q.filter]
        validate(pred)
        conds.append(to_spark(pred))
    if not conds:
        raise ValueError(
            "a stored percolation query needs at least one clause "
            "(match_all matches every doc — that's a scan, not a rule)"
        )
    return reduce(Column.__and__, conds)


def percolate_df(
    spark: SparkSession,
    queries: list[tuple[int, Bool]],
    docs: DataFrame,
    text_col: str = "content",
    id_cols: tuple[str, ...] = ("doc_id",),
    chain: str = "code_v1",
) -> DataFrame:
    """Percolate every row of ``docs`` against the stored queries ->
    DataFrame of (*id_cols, query_id), one row per (doc, matching
    query). One pass: the token array is computed once per doc and
    every stored query's condition folds into an array of matched ids
    that explodes — no join, no shuffle, codegen throughout.

    A stored query may be a :class:`Bool` or query-STRING text (the
    saved-search registration shape: `+must -not "exact phrase" a|b`
    parsed by the shared grammar). Percolation has no index, so
    index-dependent string features raise: wildcard/fuzzy expansion
    (no dictionary) and ``attr:`` filters (no manifest typing — pass a
    Bool with ``filter=[...]`` against the docs-frame columns
    instead)."""
    queries = [
        (
            qid,
            parse_query_string(q) if isinstance(q, str) else q,
        )
        for qid, q in queries
    ]
    if not queries:
        return docs.select(*id_cols).limit(0).withColumn(
            "query_id", F.lit(0).cast("int")
        )
    terms = spark_analyze(F.col(text_col), chain)
    staged = docs.withColumn("__terms", terms)
    matched = F.array(
        *[
            F.when(
                percolate_condition(q, F.col("__terms"), chain),
                F.lit(int(qid)),
            )
            for qid, q in queries
        ]
    )
    return (
        staged.withColumn("__qids", F.filter(matched, lambda x: x.isNotNull()))
        .filter(F.size("__qids") > 0)
        .select(
            *id_cols,
            F.explode("__qids").alias("query_id"),
        )
        .withColumn("query_id", F.col("query_id").cast("int"))
    )
