"""Similarity search over the ``embeddings`` table (array<float>, d=64).

- brute-force cosine top-k: the exact baseline (JVM-side ``zip_with`` +
  ``aggregate`` fold — no Python in the loop);
- sign-LSH bucketed ANN: the scale path — bucket on the sign bits of the
  leading dimensions (axis-hyperplane LSH), search only the query's
  bucket. At 10^12 rows the bucket column becomes the partition key so
  a query prunes to one partition; brute force stays as the in-bucket
  scorer (exactly the index engine's shard-then-scan design).

Determinism: elementwise cast to double BEFORE arithmetic, fold order =
array order in both engines, scores ROUND(.,6) + id tie-break.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERY_VEC_ID = 0
N_SIGN_BITS = 8


def _dvec(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for the query vector (vec_id=0)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    # the query norm is a broadcast-side scalar: computing sqrt(q.q)
    # once in the 1-row side instead of per corpus row drops a third of
    # the per-row fold work; the double value is identical (same ops,
    # same order), so round-6 scores are unchanged
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"),
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("qnorm"),
    )
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (F.sqrt(_dot(F.col("v"), F.col("v"))) * F.col("qnorm")),
                6,
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(10)
    )


_DUCK_DOT = """
list_sum(list_transform(range(1, 65), i -> a.v[i] * q.qv[i]))
"""

ORACLE_BRUTE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT a.vec_id,
       round(
         list_sum(list_transform(range(1, 65), i -> a.v[i] * q.qv[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
         6) AS cos_sim
FROM e a CROSS JOIN q
WHERE a.vec_id <> {QUERY_VEC_ID}
ORDER BY cos_sim DESC, a.vec_id
LIMIT 10
"""


def _sign_bucket(v: Column) -> Column:
    out = F.lit(0)
    for i in range(N_SIGN_BITS):
        out = out + F.when(F.element_at(v, i + 1) > 0.0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
    return out


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH ANN: search only the query's sign-bit bucket, exact
    cosine within it (top-5). Emits the in-bucket top-k plus the bucket
    id for verifiability."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    ).withColumn("bucket", _sign_bucket(F.col("v")))
    q = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select(
            "vec_id",
            "bucket",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN v[{i + 1}] > 0.0 THEN {1 << i} ELSE 0 END)" for i in range(N_SIGN_BITS)
)

ORACLE_LSH = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = {QUERY_VEC_ID})
SELECT a.vec_id, a.bucket,
       round(
         list_sum(list_transform(range(1, 65), i -> a.v[i] * q.qv[i]))
         / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
            * sqrt(list_sum(list_transform(range(1, 65), i -> q.qv[i] * q.qv[i])))),
         6) AS cos_sim
FROM e a CROSS JOIN q
WHERE a.bucket = q.qbucket AND a.vec_id <> {QUERY_VEC_ID}
ORDER BY cos_sim DESC, a.vec_id
LIMIT 5
"""




#: IVF coarse quantizer: the centroid set is a fixed, deterministic
#: sample of the corpus (vec ids 1..N_CELLS) — at scale this is the
#: k-means codebook trained offline and BROADCAST; assignment and
#: probing are identical either way, which is what this entry verifies
N_CELLS = 8


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign every vector to its nearest coarse centroid
    (argmin L2, ties -> smallest centroid id), then answer the query by
    exact cosine ONLY within the query's cell (single-probe).

    Scale path: the codebook is tiny, so the assignment is a pure
    PER-ROW PROJECTION — the centroids are collected once and inlined as
    an array-of-structs literal (the broadcast), and the argmin is
    ``array_min`` over (rounded dist, cell) structs. Zero exchange
    before the cell filter (asserted in test_physical_plans.py): no
    crossJoin row blow-up, no row_number window shuffle — at 10^12 rows
    the assignment stays embarrassingly parallel and ``cell`` becomes
    the table's partition key so a query prunes to one partition of
    1/N_CELLS of the corpus — same shard-then-scan shape as the index
    engine and the sign-LSH variant, with data-adaptive cells instead of
    axis hyperplanes."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
        ).collect()
    )
    # argmin over the literal codebook: array_min orders structs
    # lexicographically, i.e. (dist asc, cell asc) — the deterministic
    # smallest-cell tie-break, identical to the oracle's row_number order
    choices = F.array(
        *[
            F.struct(
                F.round(
                    _l2sq(F.col("v"), F.array(*[F.lit(x) for x in cv])), 9
                ).alias("dist"),
                F.lit(cell).cast("long").alias("cell"),
            )
            for cell, cv in cents
        ]
    )
    assigned = emb.withColumn("cell", F.array_min(choices)["cell"])
    q = assigned.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("v").alias("qv"), F.col("cell").alias("qcell")
    )
    return (
        assigned.crossJoin(F.broadcast(q))
        .filter((F.col("cell") == F.col("qcell")) & (F.col("vec_id") != QUERY_VEC_ID))
        .select(
            "vec_id",
            "cell",
            F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


NPROBE = 2


def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with multi-probe (nprobe=2): the standard recall lever — the
    query scans its NPROBE nearest cells instead of one, trading a
    bounded constant factor of scan for recall near the cell boundary.

    Scale shape: identical to single-probe. The probe-cell choice is a
    DRIVER-side computation over the tiny codebook (the query vector is
    one collected row, like the brute-force baseline's broadcast); the
    corpus-side plan stays a per-row projection + an IN-filter on the
    partition key — probing n cells reads n partitions of 1/N_CELLS
    each, never the corpus."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v")
    )
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["v"]])
        for r in emb.filter(
            (F.col("vec_id") >= 1) & (F.col("vec_id") <= N_CELLS)
        ).collect()
    )
    qv = np.array(
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).collect()[0]["v"],
        dtype=np.float64,
    )
    # probe cells: NPROBE nearest centroids to the QUERY, same rounded
    # (dist, cell) tie space as the assignment argmin / the oracle
    ranked = sorted(
        (round(float(((qv - np.array(cv)) ** 2).sum()), 9), cell)
        for cell, cv in cents
    )
    probes = [cell for _, cell in ranked[:NPROBE]]

    choices = F.array(
        *[
            F.struct(
                F.round(
                    _l2sq(F.col("v"), F.array(*[F.lit(x) for x in cv])), 9
                ).alias("dist"),
                F.lit(cell).cast("long").alias("cell"),
            )
            for cell, cv in cents
        ]
    )
    assigned = emb.withColumn("cell", F.array_min(choices)["cell"])
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    return (
        assigned.filter(
            F.col("cell").isin(probes) & (F.col("vec_id") != QUERY_VEC_ID)
        )
        .select(
            "vec_id",
            "cell",
            F.round(_cosine(F.col("v"), qlit), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
        .limit(5)
    )


_DOT64 = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"

ORACLE_IVF = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {N_CELLS}),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cents.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        i -> (e.v[i] - cents.cv[i]) * (e.v[i] - cents.cv[i]))), 9),
                      cents.cell
           ) AS rk
    FROM e CROSS JOIN cents
  ) WHERE rk = 1
),
q AS (SELECT v AS qv, cell AS qcell FROM assigned WHERE vec_id = {QUERY_VEC_ID})
SELECT a.vec_id, a.cell,
       round(
         {_DOT64.format(a='a.v', b='q.qv')}
         / (sqrt({_DOT64.format(a='a.v', b='a.v')})
            * sqrt({_DOT64.format(a='q.qv', b='q.qv')})),
         6) AS cos_sim
FROM assigned a CROSS JOIN q
WHERE a.cell = q.qcell AND a.vec_id <> {QUERY_VEC_ID}
ORDER BY cos_sim DESC, a.vec_id
LIMIT 5
"""


ORACLE_IVF_MULTIPROBE = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id BETWEEN 1 AND {N_CELLS}),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, cents.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        i -> (e.v[i] - cents.cv[i]) * (e.v[i] - cents.cv[i]))), 9),
                      cents.cell
           ) AS rk
    FROM e CROSS JOIN cents
  ) WHERE rk = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {QUERY_VEC_ID}),
probes AS (
  SELECT cell FROM (
    SELECT cents.cell,
           row_number() OVER (
             ORDER BY round(list_sum(list_transform(range(1, 65),
                        i -> (q.qv[i] - cents.cv[i]) * (q.qv[i] - cents.cv[i]))), 9),
                      cents.cell
           ) AS rk
    FROM cents CROSS JOIN q
  ) WHERE rk <= {NPROBE}
)
SELECT a.vec_id, a.cell,
       round(
         {_DOT64.format(a='a.v', b='q.qv')}
         / (sqrt({_DOT64.format(a='a.v', b='a.v')})
            * sqrt({_DOT64.format(a='q.qv', b='q.qv')})),
         6) AS cos_sim
FROM assigned a CROSS JOIN q
WHERE a.cell IN (SELECT cell FROM probes) AND a.vec_id <> {QUERY_VEC_ID}
ORDER BY cos_sim DESC, a.vec_id
LIMIT 5
"""


#: hard cap on a (label, sign-bucket) blocking cell: the sign-LSH
#: argument bounds cells only PROBABILISTICALLY — a degenerate
#: distribution (e.g. post-ReLU embeddings, all in the nonnegative
#: orthant) collapses every vector of a label into ONE bucket and
#: re-creates the all-pairs join. Cells past the cap are dropped
#: entirely (same MAX_BUCKET discipline as dedup.py LSH buckets),
#: making the per-cell pair count a hard <= C(cap, 2) bound; the cap is
#: mirrored in the oracle SQL and proven by the planted all-one-orthant
#: test (tests/test_dedup_planted.py).
NEARDUP_MAX_BUCKET = 50


def emb_neardup_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cosine >= 0.9, blocked on
    (label, sign-LSH bucket) so the pair join is bounded: a label's block
    is subdivided into 2^N_SIGN_BITS sign buckets (vectors with cosine
    >= 0.9 are near-parallel, so they share leading-dimension signs with
    overwhelming probability — the standard LSH blocking argument), and
    each (label, bucket) cell is HARD-capped at NEARDUP_MAX_BUCKET rows.
    At 10^12 rows the bucket becomes the shuffle key; no all-pairs join
    within a hot label ever materializes, even adversarially."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec(F.col("embedding")).alias("v"), "label"
    ).withColumn("bucket", _sign_bucket(F.col("v")))
    cell = Window.partitionBy("label", "bucket")
    emb = emb.withColumn("csz", F.count(F.lit(1)).over(cell)).filter(
        F.col("csz") <= NEARDUP_MAX_BUCKET
    ).drop("csz")
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(_cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.9)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.sum("va"), F.lit(0)).alias("sum_a"),
        F.coalesce(F.sum("vb"), F.lit(0)).alias("sum_b"),
    )


ORACLE_NEARDUP = f"""
WITH e_all AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
),
e AS (
  SELECT vec_id, v, label, bucket FROM (
    SELECT *, count(*) OVER (PARTITION BY label, bucket) AS csz FROM e_all
  ) WHERE csz <= {NEARDUP_MAX_BUCKET}
),
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb,
         round(
           list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(range(1, 65), i -> a.v[i] * a.v[i])))
              * sqrt(list_sum(list_transform(range(1, 65), i -> b.v[i] * b.v[i])))),
           6) AS cos_sim
  FROM e a JOIN e b
    ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT count(*) AS n_pairs,
       CAST(coalesce(sum(va), 0) AS BIGINT) AS sum_a,
       CAST(coalesce(sum(vb), 0) AS BIGINT) AS sum_b
FROM pairs WHERE cos_sim >= 0.9
"""


QUERIES = {
    "ann_brute_force_topk": ann_brute_force_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivf_multiprobe": ann_ivf_multiprobe,
    "emb_neardup_checksum": emb_neardup_checksum,
}

ORACLE = {
    "ann_brute_force_topk": ORACLE_BRUTE,
    "ann_lsh_bucketed": ORACLE_LSH,
    "ann_ivf_topk": ORACLE_IVF,
    "ann_ivf_multiprobe": ORACLE_IVF_MULTIPROBE,
    "emb_neardup_checksum": ORACLE_NEARDUP,
}
