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
