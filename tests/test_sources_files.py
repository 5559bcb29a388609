"""Alias CSV source/sink round-trips (S14/K3) + JSON debug sink (K2) +
date normalization (P10) inside replay."""

from __future__ import annotations

import json

import pandas as pd

from bugzilla_etl_spark.functions.dates import fix_date_value
from bugzilla_etl_spark.operators.replay import EAV_SCHEMA, replay_history
from bugzilla_etl_spark.sources.files import (
    dump_versions_json,
    read_alias_csv,
    write_alias_csv,
)


def test_alias_csv_roundtrip_with_append(spark, tmp_path):
    p = str(tmp_path / "aliases")
    df1 = spark.createDataFrame(
        [("carol", "single", 3, 100), ("dave", "multi", 7, 101)],
        "alias string, alias_type string, alias_count long, bug_id long",
    )
    df2 = spark.createDataFrame(
        [("erin", "single", 1, 102)],
        "alias string, alias_type string, alias_count long, bug_id long",
    )
    write_alias_csv(df1, p)
    write_alias_csv(df2, p, append=True)  # K3 append=Y
    back = read_alias_csv(spark, p)
    assert back.count() == 3
    got = {r["alias"]: (r["alias_type"], r["alias_count"], r["bug_id"]) for r in back.collect()}
    assert got["carol"] == ("single", 3, 100)
    assert got["erin"] == ("single", 1, 102)


def test_json_debug_sink(spark, tmp_path):
    rows = [
        (5, 0, None, "creation_ts", "1000", None, None, 1),
        (5, 0, None, "status", "NEW", None, None, 1),
    ]
    eav = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "bug_id", "modified_ts", "modified_by", "field_name",
                "field_value", "field_value_removed", "attach_id", "_merge_order",
            ],
        ),
        schema=EAV_SCHEMA,
    )
    out = str(tmp_path / "versions_json")
    dump_versions_json(replay_history(eav), out)
    docs = [json.loads(line) for line in spark.read.text(out).toPandas()["value"]]
    assert docs and docs[0]["bug_version_id"] == "5.1000"


def test_date_normalization_rules():
    assert fix_date_value("deadline", "2012/01/01 00:00:00.000") == "2012-01-01"
    assert fix_date_value("cf_due_date", "2013/05/06") == "2013-05-06"
    assert fix_date_value("deadline", "") is None
    assert fix_date_value("cf_last_resolved", "2012-01-01 00:00:00") == "1325376000000"
    assert fix_date_value("cf_last_resolved", "not a date") == "not a date"
    assert fix_date_value("status", "") == ""  # non-date fields untouched


def test_date_normalization_in_replay(spark):
    rows = [
        (6, 0, None, "creation_ts", "1000", None, None, 1),
        (6, 0, None, "deadline", "2012/01/01 00:00:00.000", None, None, 1),
        (6, 0, None, "cf_last_resolved", "2012-01-01 00:00:00", None, None, 1),
    ]
    eav = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "bug_id", "modified_ts", "modified_by", "field_name",
                "field_value", "field_value_removed", "attach_id", "_merge_order",
            ],
        ),
        schema=EAV_SCHEMA,
    )
    state = json.loads(replay_history(eav).collect()[0]["state_json"])
    assert state["deadline"] == "2012-01-01"
    assert state["cf_last_resolved"] == "1325376000000"
