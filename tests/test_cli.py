"""CLI smoke: argparse wiring + sparkless stats path (the full
build/search path is driven end-to-end in the verify recipe)."""

from __future__ import annotations

import json

import pytest

from bugzilla_etl_spark.cli import main
from bugzilla_etl_spark.index.manifest import IndexManifest


def test_stats_roundtrip(tmp_path, capsys):
    m = IndexManifest(n_shards=4, n_docs=42, sum_doc_len=420)
    m.commit(str(tmp_path))
    assert main(["stats", "--index", str(tmp_path)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] == 42 and out["n_shards"] == 4


def test_unknown_command_exits():
    with pytest.raises(SystemExit):
        main(["frobnicate"])


def test_missing_required_args():
    with pytest.raises(SystemExit):
        main(["build", "--corpus", "/x"])  # --index missing


def test_filter_value_coercion():
    """Round-4 ADVICE (low): equality filters get the same numeric
    coercion as range filters — `--filter n_chars=200` must reach the
    pyarrow scan as int 200, not '200'; non-numeric equality falls back
    to string; unparseable range values are a clean usage error."""
    from bugzilla_etl_spark.cli import _parse_filters

    assert _parse_filters([]) is None
    got = _parse_filters(
        [("==", "n_chars=200"), ("==", "lang=py"), (">=", "score=1.5")]
    )
    assert got == [
        ("n_chars", "==", 200),
        ("lang", "==", "py"),
        ("score", ">=", 1.5),
    ]
    with pytest.raises(SystemExit):
        _parse_filters([(">=", "n=1e3x")])
    with pytest.raises(SystemExit):
        _parse_filters([("==", "novalue")])


def test_explain_is_sparkless(tmp_path, capsys):
    """explain introspects the plan without a Spark session or any
    execution — usable against a live index from a shell."""
    import json as _json

    from bugzilla_etl_spark.index.manifest import IndexManifest

    m = IndexManifest(n_shards=4, n_docs=10, sum_doc_len=100)
    m.commit(str(tmp_path))
    assert main(["explain", "--index", str(tmp_path), "--query", "a b"]) == 0
    out = _json.loads(capsys.readouterr().out)
    assert out["scorer_path"] == "should"
    assert out["candidate_segments"] == [] and out["execution"] == "local"


def test_round6_subcommands_end_to_end(spark, small_corpus, tmp_path, capsys):
    """match-all / agg / multi-match / phrase --slop --unordered through
    the CLI surface against a real index."""
    import json as _json

    from pyspark.sql import functions as F

    corpus_dir = str(tmp_path / "corpus")
    small_corpus.withColumn("n_chars", F.length("content")).write.parquet(
        corpus_dir
    )
    idx = str(tmp_path / "idx")
    assert main([
        "build", "--corpus", corpus_dir, "--index", idx,
        "--shards", "4", "--tb", "4", "--attr", "n_chars", "--positions",
        "--field", "sh=code_v1_shingle",
    ]) == 0
    capsys.readouterr()

    # filter-only, attr-sorted, paged
    assert main([
        "match-all", "--index", idx, "--filter", "lang=python",
        "--sort", "n_chars", "--desc", "-k", "5",
    ]) == 0
    page1 = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert len(page1) == 5
    keys = [r["sort_key"] for r in page1]
    assert keys == sorted(keys, reverse=True)
    last = page1[-1]
    assert main([
        "match-all", "--index", idx, "--filter", "lang=python",
        "--sort", "n_chars", "--desc", "-k", "5",
        "--after", str(last["sort_key"]), str(last["doc_id"]),
    ]) == 0
    page2 = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert page2 and not (
        {r["doc_id"] for r in page1} & {r["doc_id"] for r in page2}
    )

    # terms agg over a match set
    assert main([
        "agg", "--index", idx, "--kind", "terms", "--attr", "lang",
        "--query", "return int",
    ]) == 0
    rows = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert rows and all(r["n_docs"] > 0 for r in rows)

    # stats agg, match_all
    assert main([
        "agg", "--index", idx, "--kind", "stats", "--attr", "n_chars",
    ]) == 0
    st = _json.loads(capsys.readouterr().out)
    assert st["count"] == 200 and st["min"] <= st["avg"] <= st["max"]

    # percentiles agg, match_all: quantiles bracket the stats envelope
    assert main([
        "agg", "--index", idx, "--kind", "percentiles", "--attr", "n_chars",
        "--q", "0.0", "--q", "0.5", "--q", "1.0",
    ]) == 0
    pct = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert [p["q"] for p in pct] == [0.0, 0.5, 1.0]
    assert pct[0]["value"] == st["min"] and pct[2]["value"] == st["max"]
    assert pct[0]["value"] <= pct[1]["value"] <= pct[2]["value"]

    # multi-match across the two field variants
    assert main([
        "multi-match", "--index", idx, "--query", "return int fn",
        "--fields", "content,sh", "-k", "5", "--combine", "most_fields",
    ]) == 0
    hits = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert len(hits) == 5

    # wildcard: r?turn* must score identically to the exact term here
    assert main(["search", "--index", idx, "--query", "return", "-k", "5"]) == 0
    exact = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    exact = [{k: v for k, v in r.items() if k != "sort"} for r in exact]
    assert main([
        "wildcard", "--index", idx, "--query", "r?turn*", "-k", "5",
    ]) == 0
    wc = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert wc == exact and len(wc) == 5

    # _score pagination: page 2 via --after == ranks 6-10 of one shot
    assert main([
        "search", "--index", idx, "--query", "return", "-k", "10",
    ]) == 0
    ten = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert main([
        "search", "--index", idx, "--query", "return", "-k", "5",
        "--after", repr(ten[4]["sort"][0]), str(ten[4]["doc_id"]),
    ]) == 0
    page2 = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert [r["doc_id"] for r in page2] == [r["doc_id"] for r in ten[5:]]

    # query_string: "+retur*" parses to the same single required term
    assert main([
        "qs", "--index", idx, "--query", "+retur*", "-k", "5",
    ]) == 0
    qsh = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert qsh == exact and len(qsh) == 5

    # _count: no hits, exact match-set size
    assert main(["count", "--index", idx, "--query", "return",
                 "--filter", "lang=python"]) == 0
    cnt = _json.loads(capsys.readouterr().out)
    assert 0 < cnt["count"] <= 200

    # msearch: two query strings in one request, ids by flag order
    assert main([
        "msearch", "--index", idx, "--q", "+return lang:python",
        "--q", "+return lang:go", "-k", "3",
    ]) == 0
    msr = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert {r["qid"] for r in msr} == {0, 1} and len(msr) == 6

    # boosting query: --negative keeps matches but scales their scores
    assert main([
        "search", "--index", idx, "--query", "return", "-k", "200",
    ]) == 0
    plain = {
        r["doc_id"]: r["score"]
        for r in map(_json.loads, capsys.readouterr().out.splitlines())
    }
    assert main([
        "search", "--index", idx, "--query", "return",
        "--negative", "for", "--negative-boost", "0.25", "-k", "200",
    ]) == 0
    demoted = {
        r["doc_id"]: r["score"]
        for r in map(_json.loads, capsys.readouterr().out.splitlines())
    }
    assert set(demoted) == set(plain)  # match set unchanged
    import math as _math

    n_dem = sum(
        1
        for d, s in demoted.items()
        if _math.isclose(s, 0.25 * plain[d], abs_tol=1e-5)
        and not _math.isclose(s, plain[d], abs_tol=1e-5)
    )
    assert n_dem > 0 and n_dem < len(demoted)
    assert all(
        _math.isclose(s, plain[d], abs_tol=1e-5)
        or _math.isclose(s, 0.25 * plain[d], abs_tol=1e-5)
        for d, s in demoted.items()
    )

    # unordered sloppy phrase
    assert main([
        "phrase", "--index", idx, "--query", "int return",
        "--slop", "2", "--unordered", "-k", "5",
    ]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out, "transposed phrase must match at slop 2 unordered"

    # match_phrase_prefix: "int r" completes to int-return among others
    assert main([
        "phrase-prefix", "--index", idx, "--query", "int r", "-k", "5",
    ]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out, "phrase-prefix must complete 'int r'"

    # field collapsing: at most one hit per distinct lang
    assert main([
        "search", "--index", idx, "--query", "return",
        "--collapse", "lang", "-k", "10",
    ]) == 0
    hits = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert 0 < len(hits) <= 8

    # collapse + inner_hits: each group leads with its representative
    assert main([
        "search", "--index", idx, "--query", "return",
        "--collapse", "lang", "--collapse-inner-hits", "2", "-k", "3",
    ]) == 0
    ih = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert ih and all(
        r["inner_hits"][0]["doc_id"] == r["doc_id"] for r in ih
    )
    assert all(1 <= len(r["inner_hits"]) <= 2 for r in ih)

    # function_score: replace BM25 with fvf(n_chars) -> integral scores
    assert main([
        "search", "--index", idx, "--query", "return",
        "--fvf", "n_chars", "--fs-boost-mode", "replace", "-k", "5",
    ]) == 0
    rows = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(float(s).is_integer() for s in scores)

    # composite agg: two pages in key order, resumed via the after-key
    assert main([
        "agg", "--index", idx, "--kind", "composite",
        "--source", "lang", "--source", "n_chars:1000", "--size", "5",
    ]) == 0
    page1 = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert len(page1) == 5
    keys1 = [tuple(r["key"]) for r in page1]
    assert keys1 == sorted(keys1)
    assert main([
        "agg", "--index", idx, "--kind", "composite",
        "--source", "lang", "--source", "n_chars:1000", "--size", "5",
        "--composite-after", str(keys1[-1][0]), str(keys1[-1][1]),
    ]) == 0
    page2 = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    keys2 = [tuple(r["key"]) for r in page2]
    assert keys2 and all(keys1[-1] < k for k in keys2)

    # filters agg: named equality buckets in requested order
    assert main([
        "agg", "--index", idx, "--kind", "filters", "--query", "return",
        "--named", "py:lang=python", "--named", "jv:lang=java",
    ]) == 0
    fb = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert [r["name"] for r in fb] == ["py", "jv"]
    assert all(r["n_docs"] > 0 for r in fb)

    # adjacency_matrix agg: singles + the pairwise intersection
    assert main([
        "agg", "--index", idx, "--kind", "adjacency_matrix",
        "--query", "return",
        "--named", "py:lang=python", "--named", "jv:lang=java",
    ]) == 0
    am = [_json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert [r["name"] for r in am] == ["py", "jv", "py&jv"]
    assert am[0]["n_docs"] == fb[0]["n_docs"]
    assert am[2]["n_docs"] == 0  # langs are disjoint


def test_round6_surface_wiring(spark, tmp_path, capsys, monkeypatch):
    """Round-6 subcommands end-to-end on a tiny corpus: build with
    --store-source, highlight, cardinality agg (exact + HLL), terms
    --sub-stats, nested --agg, phrase --scoring sloppy_freq."""
    import pandas as pd

    corpus_dir = str(tmp_path / "corpus")
    pdf = pd.DataFrame(
        [
            ("r", "0", "c0", "py", "alpha beta gamma", 10, 100),
            ("r", "1", "c0", "py", "alpha pad beta", 10, 200),
            ("r", "2", "c0", "go", "beta alpha delta", 20, 300),
        ],
        columns=["repo", "path", "commit", "lang", "content", "parent", "n"],
    )
    spark.createDataFrame(pdf).write.parquet(corpus_dir)
    idx = str(tmp_path / "idx")
    assert main([
        "build", "--corpus", corpus_dir, "--index", idx, "--shards", "2",
        "--tb", "2", "--positions", "--store-source",
        "--attr", "parent", "--attr", "n", "--attr", "lang",
    ]) == 0
    capsys.readouterr()

    assert main(["highlight", "--index", idx, "--query", "alpha",
                 "--fragment-size", "0", "-k", "5"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert len(lines) == 3
    assert all("<em>alpha</em>" in ln["fragments"][0] for ln in lines)

    # sig_text: 'delta' is unique to the doc matching 'delta'
    assert main(["agg", "--index", idx, "--kind", "sig_text",
                 "--query", "delta", "--size", "3"]) == 0
    st = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert st and st[0]["term"] == "delta" and st[0]["fg"] == 1

    assert main(["agg", "--index", idx, "--kind", "cardinality",
                 "--attr", "lang"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == {"attr": "lang", "n_distinct": 2, "mode": "exact"}
    assert main(["agg", "--index", idx, "--kind", "cardinality",
                 "--attr", "lang", "--precision", "12"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_distinct"] == 2 and out["mode"] == "hll"

    assert main(["agg", "--index", idx, "--kind", "terms", "--attr", "lang",
                 "--query", "alpha", "--sub-stats", "n"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    by_val = {ln["value"]: ln for ln in lines}
    assert by_val["py"]["n_docs"] == 2
    assert by_val["py"]["stats"]["sum"] == 300.0
    assert by_val["go"]["stats"]["count"] == 1

    assert main(["agg", "--index", idx, "--kind", "terms", "--attr", "lang",
                 "--query", "alpha", "--sub-hits", "2"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    by_val = {ln["value"]: ln for ln in lines}
    assert by_val["py"]["n_docs"] == 2 and len(by_val["py"]["hits"]) == 2
    assert by_val["py"]["hits"][0]["score"] >= by_val["py"]["hits"][1]["score"]
    assert len(by_val["go"]["hits"]) == 1

    assert main(["nested", "--index", idx, "--query", "alpha beta",
                 "--parent-attr", "parent", "--agg", "lang",
                 "--agg-level", "parent"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert {(ln["value"], ln["n_docs"]) for ln in lines} == {("py", 1), ("go", 1)}

    assert main(["phrase", "--index", idx, "--query", "alpha beta",
                 "--slop", "2", "--scoring", "sloppy_freq"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.splitlines()]
    assert len(lines) == 2  # docs 0 (slack 0) and 1 (slack 1); 2 reversed
    assert lines[0]["score"] > lines[1]["score"]
