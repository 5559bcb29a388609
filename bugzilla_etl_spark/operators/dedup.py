"""Deduplication operators over ``documents`` — the training-data-pipeline
suite (exact, MinHash+LSH, SimHash, n-gram Jaccard).

Cross-engine determinism: token hashing is ``md5`` hex-prefix -> bigint
(bit-identical in Spark ``conv(substr(md5(t),1,15),16,10)`` and DuckDB
``('0x'||substr(md5(t),1,15))::BIGINT``), arithmetic mod p=2^31-1 kept
inside int64. Pair-generating queries emit bounded checksum rows
(n_pairs, sum of endpoints) so the value-hash gate stays O(1) while the
whole pipeline is exercised.

At 100 TB: every stage is groupBy/join on bounded keys (band buckets,
shingle hashes); the quadratic step only happens WITHIN a bucket, which
is the point of LSH — bucket sizes are bounded by banding, and hot
buckets can be salted exactly like hot terms in the index build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..tokenize import duckdb_tokens_sql, spark_tokens

P31 = 2147483647  # 2^31 - 1
# (a, b) pairs for the 8 minhash permutations h_j(x) = (a*x + b) mod p
MINHASH_COEF = [
    (1299721, 7),
    (15485863, 101),
    (32452843, 9973),
    (49979687, 2027),
    (67867967, 7919),
    (86028121, 104729),
    (104395301, 31337),
    (122949823, 54321),
]
N_BANDS, ROWS_PER_BAND = 4, 2
#: standard LSH hot-bucket cap: a band bucket shared by more docs than
#: this carries no near-dup signal (it is the "stopword" of buckets) and
#: would produce a quadratic pair explosion — the skew-handling analog
#: of term salting (SURVEY §7.3), applied identically in the oracle SQL.
MAX_BUCKET = 50


def _tok_int(term: Column) -> Column:
    """md5-prefix token hash, reduced mod p (fits int64 arithmetic)."""
    return (
        F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long") % P31
    )


_DUCK_TOK_INT = "(('0x' || substr(md5({t}),1,15))::BIGINT % 2147483647)"


#: exact-dup digest prefix length: the synthetic corpus has no full-text
#: duplicates, so the digest covers the leading prefix (documents sharing
#: an opening are "duplicates") — this keeps the operator non-vacuous at
#: every SF while exercising the identical hash-groupBy plan.
EXACT_PREFIX = 40


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest; keeper = min doc_id.
    (The content-addressed analog of the reference's deterministic ES
    doc id overwrite, parse_bug_history.js:168.)"""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(
            F.md5(F.substring("text", 1, EXACT_PREFIX)).alias("content_hash")
        )
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


ORACLE_EXACT = f"""
SELECT md5(substr(text, 1, {EXACT_PREFIX})) AS content_hash,
       count(*) AS n_copies, min(doc_id) AS keeper
FROM documents GROUP BY 1 HAVING count(*) > 1
"""


def _sorted_pairs(ds_col: Column) -> Column:
    """All (da < db) pairs from a distinct-doc-id array, generated
    JVM-side (arrays are hot-key-capped upstream, so the per-group pair
    count is provably bounded): sort the ids, pair each element with
    every later one. Replaces the self-join pair generation — the join
    shuffled the fat grouping keys twice; this shuffles only the int
    pairs it emits."""
    ds = F.array_sort(ds_col)
    return F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("da"), y.alias("db")),
            ),
        )
    )


_DUCK_TOKSET = f"""
tokset AS (
  SELECT DISTINCT doc_id, unnest({duckdb_tokens_sql('text')}) AS term FROM documents
)
"""


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash (8 perms) + LSH banding (4 bands x 2 rows): DISTINCT
    candidate pairs (da < db) of docs sharing at least one band bucket,
    each bucket hard-capped at MAX_BUCKET members (bounded-blocking: the
    pair generation is provably <= C(MAX_BUCKET,2) per bucket).

    Shape (optimization r7, guide §2.3/§2.4): the old pipeline paid a
    full (doc_id, term) DISTINCT exchange before the min-hash groupBy —
    within-doc dedupe is local, so array_distinct runs BEFORE the
    explode and the groupBy(doc_id) min aggregation's map-side combiner
    collapses everything to ONE row per doc before its exchange. The
    md5 + mod projection stays in whole-stage codegen after the explode
    (an explode-free array-HOF form measured 5.1 s vs 3.1 s for this
    stage at sf1.0 — HOF lambdas do not codegen). Downstream exchanges
    carry (band, bucket) doc ids and int candidate pairs only: token
    strings never cross the network at all."""
    docs = load_table(spark, sf_dir, "documents", balance=True)
    ts = docs.select(
        "doc_id",
        F.explode(F.array_distinct(spark_tokens(F.col("text")))).alias("term"),
    ).withColumn("x", _tok_int(F.col("term")))
    mins = ts.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("x") + F.lit(b)) % P31).alias(f"h{j}")
            for j, (a, b) in enumerate(MINHASH_COEF)
        ]
    )
    # band rows via ONE projection + explode — a per-band union of
    # selects over `mins` recomputes the min-hash subplan once PER BAND
    band_structs = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"h{bi * ROWS_PER_BAND + r}").cast("string")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("bucket"),
            )
            for bi in range(N_BANDS)
        ]
    )
    bands = mins.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    # one exchange keyed (band, bucket): collect the member list, apply
    # the hot-bucket cap on the collected size (same rows dropped as the
    # old window count), then emit in-bucket pairs JVM-side
    groups = (
        bands.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") <= MAX_BUCKET)
    )
    pairs = (
        groups.select(F.explode(_sorted_pairs(F.col("ds"))).alias("p"))
        .select(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
        .distinct()
    )
    return pairs


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH candidate pairs, emitted as the bounded checksum
    (n_candidate_pairs, sum_a, sum_b)."""
    pairs = _minhash_pairs(spark, sf_dir)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_candidate_pairs"),
        F.coalesce(F.sum("da"), F.lit(0)).alias("sum_a"),
        F.coalesce(F.sum("db"), F.lit(0)).alias("sum_b"),
    )


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Transitive closure of undirected (da, db) pairs -> (doc_id,
    component) with component = MIN doc id reachable — the cluster-
    formation step between near-dup pair generation and canonical-doc
    selection that a real training-data dedup needs (keep one doc per
    CLUSTER, not per pair).

    Iterative min-label propagation: each round every node takes the
    minimum of its own label and its neighbors' labels — one broadcast-
    free join + one groupBy per round, converging in O(graph diameter)
    rounds (near-dup clusters are shallow: diameter is small because
    members share buckets pairwise). The driver loop checks a single
    aggregate per round and stops at fixpoint; ``max_iter`` bounds
    pathological chains — exhausting it WITHOUT reaching fixpoint raises
    (ADVICE r5: a silently-truncated propagation returns split clusters
    that look valid). Deterministic: labels are ids, min is
    associative — the result is independent of execution order."""
    sym = edges.selectExpr("da AS src", "db AS dst").unionByName(
        edges.selectExpr("db AS src", "da AS dst")
    )
    sym = sym.persist()
    labels = (
        sym.select(F.col("src").alias("n"))
        .distinct()
        .withColumn("label", F.col("n"))
        .persist()
    )
    labels.count()
    converged = False
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym["src"] == labels["n"])
            .select(F.col("dst").alias("n"), "label")
        )
        # localCheckpoint (eager) BOTH materializes the round and
        # TRUNCATES the logical plan: persist alone leaves the lineage
        # growing linearly in rounds, and Catalyst re-analyzes the whole
        # accumulated tree every round — measured super-linear planning
        # blowup past ~8 rounds (a 12-deep chain never finished). The
        # standard iterative-graph discipline (GraphFrames does the
        # same); on a cluster the blocks live in executor storage like
        # any persisted frame.
        new_labels = (
            labels.select("n", "label")
            .unionByName(msgs)
            .groupBy("n")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        # fixpoint probe: one scalar aggregate (sum of labels strictly
        # decreases every improving round; equal sum == no change since
        # labels only ever decrease)
        old_sum = labels.agg(F.sum("label")).collect()[0][0]
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if old_sum == new_sum:
            converged = True
            break
    sym.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not reach fixpoint within "
            f"max_iter={max_iter} rounds; the component graph has a chain "
            f"longer than max_iter — raise max_iter (rounds needed ~= "
            f"longest shortest-path from a cluster's minimum-id member)"
        )
    out = labels.select(F.col("n").alias("doc_id"), F.col("label").alias("component"))
    labels.unpersist()
    return out


def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: LSH candidate pairs -> connected components ->
    (doc_id, component, is_canonical). The canonical doc per cluster is
    its minimum id (the keeper a dedup pipeline retains); every other
    member is a discard. The DuckDB oracle computes the same closure
    with a recursive CTE over the identical pair set."""
    pairs = _minhash_pairs(spark, sf_dir)
    cc = connected_components(pairs)
    return cc.select(
        "doc_id",
        "component",
        (F.col("doc_id") == F.col("component")).alias("is_canonical"),
    )


def _oracle_pairs_prefix() -> str:
    """The shared WITH-body producing the `pairs` CTE (identical pair
    set for the checksum oracle and the clusters oracle)."""
    hcols = ",\n    ".join(
        f"min(({a} * x + {b}) % 2147483647) AS h{j}"
        for j, (a, b) in enumerate(MINHASH_COEF)
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {bi} AS band, "
        f"CAST(h{bi * ROWS_PER_BAND} AS VARCHAR) || '_' || "
        f"CAST(h{bi * ROWS_PER_BAND + 1} AS VARCHAR) AS bucket FROM mins"
        for bi in range(N_BANDS)
    )
    return f"""{_DUCK_TOKSET},
hx AS (SELECT doc_id, {_DUCK_TOK_INT.format(t='term')} AS x FROM tokset),
mins AS (SELECT doc_id, {hcols} FROM hx GROUP BY doc_id),
bands_all AS (
{band_selects}
),
bands AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM bands_all
  ) WHERE bsz <= {MAX_BUCKET}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
)"""


def _oracle_minhash() -> str:
    return f"""
WITH {_oracle_pairs_prefix()}
SELECT count(*) AS n_candidate_pairs,
       CAST(coalesce(sum(da), 0) AS BIGINT) AS sum_a,
       CAST(coalesce(sum(db), 0) AS BIGINT) AS sum_b
FROM pairs
"""


def _oracle_minhash_clusters() -> str:
    """Recursive-CTE transitive closure over the SAME pair set; the
    component id is the minimum doc id reachable (least of self and
    closure min)."""
    return f"""
WITH RECURSIVE {_oracle_pairs_prefix()},
cedges AS (
  SELECT da AS s, db AS d FROM pairs
  UNION ALL
  SELECT db AS s, da AS d FROM pairs
),
reach AS (
  SELECT s, d FROM cedges
  UNION
  SELECT r.s, e.d FROM reach r JOIN cedges e ON r.d = e.s
)
SELECT s AS doc_id,
       CAST(least(s, min(d)) AS BIGINT) AS component,
       least(s, min(d)) = s AS is_canonical
FROM reach GROUP BY s
"""


#: SimHash width: 60 bits (the full md5 15-hex-char prefix, un-modded) —
#: a 16-bit fingerprint collides massively at 10^9 docs; 60 bits is the
#: standard "64-bit-class" near-dup signature (Charikar/Google scale)
SIMHASH_BITS = 60

_DUCK_TOK60 = "('0x' || substr(md5({t}),1,15))::BIGINT"


def _tok_int60(term: Column) -> Column:
    """Full 60-bit md5-prefix token hash (no mod) for SimHash bits."""
    return F.conv(F.substring(F.md5(term), 1, 15), 16, 10).cast("long")


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash: per-doc fingerprint from tf-weighted token-hash
    bits (majority sign per bit). Emits (doc_id, simhash) for a stable
    id range. One shuffle (groupBy doc_id) with 60 vectorized CASE-sum
    aggregates — JVM-side end to end."""
    docs = load_table(spark, sf_dir, "documents", balance=True)
    tf = (
        docs.select("doc_id", F.explode(spark_tokens(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("x", _tok_int60(F.col("term")))
    )
    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("x"), bi).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
                .otherwise(-F.col("tf"))
            ).alias(f"s{bi}")
            for bi in range(SIMHASH_BITS)
        ]
    )
    sim = bit_sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{bi}") > 0, F.lit(1 << bi)).otherwise(F.lit(0))
                for bi in range(SIMHASH_BITS)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return sim.filter(F.col("doc_id") < 100)


def _oracle_simhash() -> str:
    sums = ",\n    ".join(
        f"sum(CASE WHEN (x >> {bi}) & 1 = 1 THEN tf ELSE -tf END) AS s{bi}"
        for bi in range(SIMHASH_BITS)
    )
    bits = " + ".join(
        f"(CASE WHEN s{bi} > 0 THEN ({1 << bi}::BIGINT) ELSE 0 END)"
        for bi in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({duckdb_tokens_sql('text')}) AS term FROM documents
),
tf AS (
  SELECT doc_id, {_DUCK_TOK60.format(t='term')} AS x, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
bit_sums AS (SELECT doc_id, {sums} FROM tf GROUP BY doc_id)
SELECT doc_id, CAST({bits} AS BIGINT) AS simhash FROM bit_sums WHERE doc_id < 100
"""


#: document-frequency cap for shingles: a shingle appearing in more docs
#: than this is boilerplate (the shingle analog of a stopword) and would
#: make the self-join quadratic in its frequency — the same hot-key
#: defense as MAX_BUCKET above. Standard practice for shingle Jaccard at
#: scale; dropping super-common shingles barely moves the estimate
#: because they carry no discriminative signal.
MAX_SHINGLE_DF = 50


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-3-gram shingle Jaccard near-dup: pairs sharing a shingle,
    jaccard = |inter| / (|a| + |b| - |inter|) over the DF-capped shingle
    sets; emits the checksum of pairs with jaccard >= 0.5. Hot shingles
    (df > MAX_SHINGLE_DF) are dropped BEFORE both the size count and the
    pair join, so the join is provably bounded: each shingle produces at
    most C(MAX_SHINGLE_DF, 2) pairs."""
    docs = load_table(spark, sf_dir, "documents", balance=True)
    toks = docs.select("doc_id", spark_tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= 3
    )
    n = F.size("toks")
    # per-doc DISTINCT shingle set built JVM-side (array_distinct): the
    # old explode + DISTINCT paid a full exchange of (doc_id, shingle)
    # STRING rows just to dedupe within each doc — a purely local
    # operation (guide §2.4: remove shuffles outright)
    sh = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), n - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("toks", i + 1),
                        F.element_at("toks", i + 2),
                        F.element_at("toks", i + 3),
                    ),
                )
            )
        ).alias("shingle"),
    )
    # ONE exchange keyed on the shingle: collect the (distinct) member
    # doc ids, drop boilerplate shingles (df > cap) by collected size —
    # identical row drop to the old window count — then derive BOTH the
    # per-doc set sizes and the in-bucket pairs from the capped groups.
    # The old shape shuffled the shingle strings four times (distinct,
    # df window, per-doc window, self-join); everything after the one
    # groupBy here moves only int doc-id pairs (guide §2.3: shuffle
    # keys/metadata, not payloads; §8's decide-small/move-once rule)
    groups = (
        sh.groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ds"))
        .filter(F.size("ds") <= MAX_SHINGLE_DF)
    )
    sizes = (
        groups.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    inter = (
        groups.select(F.explode(_sorted_pairs(F.col("ds"))).alias("p"))
        .groupBy(F.col("p.da").alias("da"), F.col("p.db").alias("db"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("da"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("db"), F.col("n_sh").alias("nb"))
    jac = (
        inter.join(sa, "da")
        .join(sb, "db")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= 0.5)
    )
    return jac.agg(
        F.count(F.lit(1)).alias("n_neardup_pairs"),
        F.coalesce(F.sum("da"), F.lit(0)).alias("sum_a"),
        F.coalesce(F.sum("db"), F.lit(0)).alias("sum_b"),
    )


ORACLE_NGRAM = f"""
WITH toks AS (
  SELECT doc_id, {duckdb_tokens_sql('text')} AS toks FROM documents
),
sh_all AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
  FROM toks WHERE len(toks) >= 3
),
sh AS (
  SELECT doc_id, shingle FROM (
    SELECT *, count(*) OVER (PARTITION BY shingle) AS df FROM sh_all
  ) WHERE df <= {MAX_SHINGLE_DF}
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT da, db, inter * 1.0 / (sa.n_sh + sb.n_sh - inter) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = da
  JOIN sizes sb ON sb.doc_id = db
)
SELECT count(*) AS n_neardup_pairs,
       CAST(coalesce(sum(da), 0) AS BIGINT) AS sum_a,
       CAST(coalesce(sum(db), 0) AS BIGINT) AS sum_b
FROM jac WHERE jaccard >= 0.5
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_minhash_clusters": dedup_minhash_clusters,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
}

ORACLE = {
    "dedup_exact": ORACLE_EXACT,
    "dedup_minhash_lsh": _oracle_minhash(),
    "dedup_minhash_clusters": _oracle_minhash_clusters(),
    "dedup_simhash": _oracle_simhash(),
    "dedup_ngram_jaccard": ORACLE_NGRAM,
}
