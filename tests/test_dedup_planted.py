"""Dedup operators against planted duplicates/near-duplicates —
proves the detectors actually detect (the driver tables contain no
exact dups, so the oracle-parity tests alone only prove equivalence).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bugzilla_etl_spark.operators import dedup


@pytest.fixture(scope="module")
def planted(spark, tmp_path_factory):
    """documents-shaped table: 20 base docs, 2 exact dups, 2 near-dups
    (one word changed), plus unrelated docs."""
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = []
    for i in range(20):
        rows.append((i, f"doc {i} unique words w{i}a w{i}b w{i}c w{i}d w{i}e", "en", "src", 0))
    rows.append((100, base, "en", "src", 0))
    rows.append((101, base, "en", "src", 0))          # exact dup of 100
    rows.append((102, base.replace("kappa", "KAPPA2"), "en", "src", 0))  # near dup
    rows.append((103, base + " extra", "en", "src", 0))                   # near dup
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path_factory.mktemp("planted")
    df = spark.createDataFrame(pdf)
    df.write.parquet(str(d / "documents.parquet"))
    # satisfy load_table for every table name used by the operators
    return str(d)


def test_exact_dedup_finds_planted(spark, planted):
    # digest covers the leading EXACT_PREFIX chars: 100/101 are full dups,
    # 102/103 differ only past char 40, so all four collapse to one group
    out = dedup.dedup_exact(spark, planted).collect()
    assert len(out) == 1
    assert out[0]["n_copies"] == 4
    assert out[0]["keeper"] == 100


def test_ngram_jaccard_finds_neardups(spark, planted):
    out = dedup.dedup_ngram_jaccard(spark, planted).collect()[0]
    # pairs among {100,101,102,103} with >=0.5 trigram jaccard
    assert out["n_neardup_pairs"] >= 3  # (100,101), (100,103), (101,103) at least


def test_ngram_hot_shingle_capped(spark, tmp_path_factory):
    """A boilerplate shingle shared by EVERY doc (df >> MAX_SHINGLE_DF)
    must NOT produce pairs by itself — the DF cap drops it before the
    self-join, keeping the join bounded (sub-quadratic). Genuine
    near-dups that also share rare shingles are still found."""
    import pandas as pd

    n = dedup.MAX_SHINGLE_DF * 3  # 150 docs all sharing the boilerplate
    boiler = "copyright acme corp all rights reserved"
    rows = []
    for i in range(n):
        rows.append((i, f"{boiler} unique w{i}a w{i}b w{i}c w{i}d w{i}e", "en", "s", 0))
    # one genuine near-dup pair sharing rare shingles beyond the boilerplate
    rows.append((500, f"{boiler} special alpha beta gamma delta epsilon", "en", "s", 0))
    rows.append((501, f"{boiler} special alpha beta gamma delta zeta", "en", "s", 0))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    pdf["n_chars"] = pdf["text"].str.len()
    d = tmp_path_factory.mktemp("hot_shingle")
    spark.createDataFrame(pdf).write.parquet(str(d / "documents.parquet"))

    out = dedup.dedup_ngram_jaccard(spark, str(d)).collect()[0]
    # without the cap: boilerplate shingles alone produce C(152,2) > 11k
    # candidate pairs; with it, only the planted near-dup pair survives
    assert out["n_neardup_pairs"] == 1, out
    assert (out["sum_a"], out["sum_b"]) == (500, 501)


def test_neardup_one_orthant_hard_capped(spark, tmp_path_factory):
    """Adversarial distribution for the sign-LSH blocking argument:
    post-ReLU-style ALL-NONNEGATIVE embeddings collapse an entire label
    into ONE sign bucket, which without a hard cap re-creates the
    all-pairs join (and here would report ~C(150,2) pairs, since the
    planted vectors are near-parallel). The NEARDUP_MAX_BUCKET cap
    drops the oversized cell entirely, so only the small genuine
    near-dup cell survives — proving the pair join is hard-bounded."""
    import numpy as np

    from bugzilla_etl_spark.operators import similarity as sim

    rng = np.random.default_rng(7)
    n_hot = sim.NEARDUP_MAX_BUCKET * 3
    base_hot = rng.uniform(0.2, 1.0, 64)
    rows = []
    for i in range(n_hot):  # label 1: one near-parallel nonnegative blob
        v = np.abs(base_hot + rng.normal(0, 0.005, 64))
        rows.append((i + 10, [float(x) for x in v], 1))
    base2 = rng.uniform(0.2, 1.0, 64)  # label 2: one genuine near-dup pair
    rows.append((1000, [float(x) for x in base2], 2))
    rows.append(
        (1001, [float(x) for x in np.abs(base2 + rng.normal(0, 0.005, 64))], 2)
    )
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    d = tmp_path_factory.mktemp("orthant")
    spark.createDataFrame(pdf).write.parquet(str(d / "embeddings.parquet"))

    out = sim.emb_neardup_checksum(spark, str(d)).collect()[0]
    assert out["n_pairs"] == 1, out
    assert (out["sum_a"], out["sum_b"]) == (1000, 1001)


def test_minhash_candidates_include_neardups(spark, planted):
    out = dedup.dedup_minhash_lsh(spark, planted).collect()[0]
    assert out["n_candidate_pairs"] >= 1
    # exact dup pair must collide in every band, so it is found
    # (sum check keeps it cheap; full pair list verified at small scale)


def test_simhash_hamming(spark, planted):
    """Exact dup -> identical simhash; near dup -> small hamming
    relative to the 60-bit width; unrelated docs -> large hamming."""
    import bugzilla_etl_spark.operators.dedup as dd
    from bugzilla_etl_spark.tokenize import spark_tokens

    docs = spark.read.parquet(f"{planted}/documents.parquet")
    # inline the operator pipeline without the <100 filter
    tf = (
        docs.select("doc_id", F.explode(spark_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("x", dd._tok_int60(F.col("term")))
    )
    nb = dd.SIMHASH_BITS
    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("x"), bi).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{bi}")
            for bi in range(nb)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            [F.when(F.col(f"s{bi}") > 0, F.lit(1 << bi)).otherwise(F.lit(0)) for bi in range(nb)],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    vals = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    assert vals[100] == vals[101]  # exact dup -> same fingerprint
    ham_near = bin(vals[100] ^ vals[102]).count("1")
    assert ham_near <= nb // 6, f"near-dup hamming too large: {ham_near}"
    ham_far = bin(vals[100] ^ vals[0]).count("1")
    assert ham_far > ham_near, (ham_far, ham_near)


def test_connected_components_planted_graph(spark):
    """Round 5: cluster formation — min-label propagation must find the
    transitive closure (multi-hop chains, cycles, singletons-by-pair),
    not just direct pair links."""
    from bugzilla_etl_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4 (diameter 3: needs >1 round)
            (1, 2), (2, 3), (3, 4),
            # cycle 10-11-12-10
            (10, 11), (11, 12), (12, 10),
            # isolated pair
            (20, 21),
            # star joined to the chain via a long hop
            (4, 30), (30, 31), (30, 32),
        ],
        "da long, db long",
    )
    got = {
        int(r["doc_id"]): int(r["component"])
        for r in connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 30: 1, 31: 1, 32: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }
