"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/capture_plans.py <tag_dir> <suffix> [entry ...]

Writes plans/<tag_dir>/<entry>_<suffix>.txt for each entry (default: a
fixed list of the bench-relevant operators). Queries that execute driver
side work while building (the BM25 twins' stats pass) still yield the
final scoring plan, which is the part the optimization evidence needs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_ENTRIES = [
    "ft_bm25_top10",
    "ft_bm25_hot_term",
    "ft_bm25_shingled",
    "ft_bm25_conjunctive",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "token_count",
    "lang_id_heuristic",
    "s1_star_join_scan",
    "tpch_q1_pricing_summary",
    "ann_brute_force_topk",
    "m1_sorted_merge_rownum",
]


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    entries = sys.argv[3:] or DEFAULT_ENTRIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry_mod
    from bugzilla_etl_spark.session import get_spark

    spark = get_spark()
    queries = entry_mod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in entries:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInPandas") + plan.count("FlatMapGroupsInPandas")
        print(f"{name}: Exchange={n_ex} PythonNodes={n_py} -> {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
