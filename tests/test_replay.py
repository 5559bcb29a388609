"""History-replay operator tests (FIXTURES.md F3 cases).

Covers: single-value overwrite chains; multi-value add/remove;
same-timestamp version merge; truncated "? " uncertainty repair;
expires_on chaining with the open sentinel; the incremental emission
filter; previous_values durations.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from bugzilla_etl_spark.operators.replay import (
    EAV_SCHEMA,
    OPEN_SENTINEL,
    replay_history,
)

DAY = 86_400_000


def _eav(rows):
    cols = [
        "bug_id", "modified_ts", "modified_by", "field_name",
        "field_value", "field_value_removed", "attach_id", "_merge_order",
    ]
    return pd.DataFrame(rows, columns=cols)


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        # bug 1: current state (merge order 1) — status NEW after 2 changes
        (1, 0, None, "creation_ts", "1000", None, None, 1),
        (1, 0, None, "reporter", "alice", None, None, 1),
        (1, 0, None, "status", "VERIFIED", None, None, 1),
        # multi-value current state (merge order 2)
        (1, 0, None, "cc", "carol@x.com", None, None, 2),
        (1, 0, None, "cc", "bob@x.com", None, None, 2),
        # activity log (merge order 9): newest first semantics handled inside
        (1, 1000 + 2 * DAY, "bob", "status", "VERIFIED", "ASSIGNED", None, 9),
        (1, 1000 + 1 * DAY, "alice", "status", "ASSIGNED", "NEW", None, 9),
        (1, 1000 + 1 * DAY, "alice", "cc", "carol@x.com", "", None, 9),
        # bug 2: same-timestamp merge + uncertainty repair
        (2, 0, None, "creation_ts", "5000", None, None, 1),
        (2, 0, None, "reporter", "dave", None, None, 1),
        (2, 0, None, "status", "RESOLVED", None, None, 1),
        (2, 0, None, "keywords", "crash", None, None, 2),
        (2, 5000 + DAY, "eve", "status", "RESOLVED", "NEW", None, 9),
        (2, 5000 + DAY, "eve", "keywords", "crash", "? regression", None, 9),
    ]
    return spark.createDataFrame(_eav(rows), schema=EAV_SCHEMA)


@pytest.fixture(scope="module")
def versions(spark, fixture_df):
    out = replay_history(fixture_df).toPandas()
    return out.sort_values(["bug_id", "bug_version_num"]).reset_index(drop=True)


def test_version_counts(versions):
    v1 = versions[versions.bug_id == 1]
    v2 = versions[versions.bug_id == 2]
    assert len(v1) == 3  # creation, day1 (status+cc merged), day2
    assert len(v2) == 2  # creation, one merged change version


def test_scalar_overwrite_chain(versions):
    v1 = versions[versions.bug_id == 1].reset_index(drop=True)
    states = [json.loads(s) for s in v1.state_json]
    assert states[0]["status"] == "NEW"
    assert states[1]["status"] == "ASSIGNED"
    assert states[2]["status"] == "VERIFIED"


def test_multivalue_add_and_sort(versions):
    v1 = versions[versions.bug_id == 1].reset_index(drop=True)
    states = [json.loads(s) for s in v1.state_json]
    assert states[0]["cc"] == ["bob@x.com"]  # carol added later, inverted out
    assert states[1]["cc"] == ["bob@x.com", "carol@x.com"]  # stabilized sort
    assert states[2]["cc"] == ["bob@x.com", "carol@x.com"]


def test_same_ts_merge_one_version(versions):
    v2 = versions[versions.bug_id == 2].reset_index(drop=True)
    changes = json.loads(v2.loc[1, "changes_json"])
    assert {c["field"] for c in changes} == {"status", "keywords"}


def test_uncertainty_repair(versions):
    v2 = versions[versions.bug_id == 2].reset_index(drop=True)
    assert bool(v2.loc[0, "uncertain"]) is True
    states = [json.loads(s) for s in v2.state_json]
    # "? regression" stripped to "regression" in the original state
    assert states[0]["keywords"] == ["regression"]
    assert states[1]["keywords"] == ["crash"]


def test_expires_on_chaining(versions):
    v1 = versions[versions.bug_id == 1].reset_index(drop=True)
    assert list(v1.expires_on[:-1]) == list(v1.modified_ts[1:])
    assert int(v1.expires_on.iloc[-1]) == OPEN_SENTINEL


def test_version_ids_deterministic(versions):
    v1 = versions[versions.bug_id == 1].reset_index(drop=True)
    assert v1.bug_version_id.iloc[0] == f"1.{int(v1.modified_ts.iloc[0])}"


def test_previous_values_duration(versions):
    v1 = versions[versions.bug_id == 1].reset_index(drop=True)
    prev = json.loads(v1.loc[2, "previous_values_json"])
    assert prev["status"]["duration_days"] == 1  # day1 -> day2
    assert prev["status"]["value"] == "ASSIGNED"


def test_incremental_emission_filter(spark, fixture_df):
    """Versions valid at/after start_time re-emit (open version included);
    fully-expired versions don't (js:480-483)."""
    cutoff = 1000 + 2 * DAY  # after bug1's last change
    out = replay_history(fixture_df, start_time=cutoff).toPandas()
    v1 = out[out.bug_id == 1]
    assert len(v1) == 2  # day1 version (expires at day2 >= cutoff) + open day2
    assert set(v1.expires_on) == {1000 + 2 * DAY, OPEN_SENTINEL}


def test_flag_reconciliation_and_aliases(spark):
    """J5: a removed flag with a mismatched requestee fuzzy-matches the
    dangling flag (same type+status) and emits an alias-candidate pair;
    the alias emit counts it (parse_bug_aliases.js:436-458)."""
    from bugzilla_etl_spark.operators.replay import replay_aliases

    rows = [
        # current snapshot: canonical requestee spelling
        (7, 0, None, "creation_ts", "1000", None, None, 1),
        (7, 0, None, "flags", "review?(carol@x.com)", None, None, 2),
        (7, 0, None, "flags", "approval+(frank@x.com)", None, None, 2),
        # activity log: the review request was logged with a DRIFTED
        # requestee spelling — inverting the add finds no exact flag in
        # the snapshot, so the fuzzy (type,status) match fires
        (7, 1000 + 1 * DAY, "dave", "flags", "review?(c.arol@x.com)", "", None, 9),
        (7, 1000 + 2 * DAY, "erin", "flags", "approval+(frank@x.com)", "", None, 9),
    ]
    eav = spark.createDataFrame(_eav(rows), schema=EAV_SCHEMA)

    versions = replay_history(eav).toPandas().sort_values("bug_version_num")
    states = [json.loads(s) for s in versions.state_json]
    assert states[0].get("flags", []) == []  # original state: no flags
    assert states[1]["flags"] == ["review?(c.arol@x.com)"]
    assert set(states[2]["flags"]) == {
        "review?(c.arol@x.com)", "approval+(frank@x.com)",
    }

    aliases = replay_aliases(eav).toPandas()
    assert len(aliases) == 1
    row = aliases.iloc[0]
    assert row["alias"] == "c.arol@x.com"
    assert row["alias_type"] == "single"
    assert row["alias_count"] == 1
    assert row["bug_id"] == 7


def test_nested_attachments(spark):
    """Merge-order-7 attachment state + attachment-scoped activity
    (attach_id routing): nested attachments[] with their own flags
    (parse_bug_history.js:211-219, bugzilla_to_json.ktr:293-438)."""
    rows = [
        (11, 0, None, "creation_ts", "1000", None, None, 1),
        (11, 0, None, "status", "NEW", None, None, 1),
        # attachment 55 current state
        (11, 0, None, "ispatch", "1", None, 55, 7),
        (11, 0, None, "description", "fix v2", None, 55, 7),
        (11, 0, None, "flags", "review+(rev@x.com)", None, 55, 7),
        # activity: attachment description changed, flag granted
        (11, 1000 + 1 * DAY, "dev", "description", "fix v2", "fix v1", 55, 9),
        (11, 1000 + 2 * DAY, "rev", "flags", "review+(rev@x.com)", "review?(rev@x.com)", 55, 9),
        # a bug-level change interleaved
        (11, 1000 + 2 * DAY, "rev", "status", "ASSIGNED", "NEW", None, 9),
    ]
    eav = spark.createDataFrame(_eav(rows), schema=EAV_SCHEMA)
    out = replay_history(eav).toPandas().sort_values("bug_version_num").reset_index(drop=True)
    states = [json.loads(s) for s in out.state_json]
    assert len(out) == 3
    # v1 (creation): attachment in original state
    a0 = states[0]["attachments"][0]
    assert a0["attach_id"] == 55
    assert a0["description"] == "fix v1"
    assert a0["flags"] == ["review?(rev@x.com)"]
    # v2: description updated, flag still pending
    a1 = states[1]["attachments"][0]
    assert a1["description"] == "fix v2"
    assert a1["flags"] == ["review?(rev@x.com)"]
    # v3: flag granted + bug status moved in the same version
    a2 = states[2]["attachments"][0]
    assert a2["flags"] == ["review+(rev@x.com)"]
    assert states[2]["status"] == "ASSIGNED"


def test_end_time_bounded_replay(spark, fixture_df):
    """END_TIME cap (parse_bug_history.js:72-75): replaying bug 1 with
    end_time before the second status change reproduces the historical
    state — status ASSIGNED, version chain ends open at that point."""
    cap = 1000 + 1 * DAY  # include day-1 change, exclude day-2
    out = (
        replay_history(fixture_df.filter("bug_id = 1"), end_time=cap)
        .toPandas()
        .sort_values("bug_version_num")
    )
    assert list(out["bug_version_num"]) == [1, 2]
    last = out.iloc[-1]
    assert json.loads(last["state_json"])["status"] == "ASSIGNED"
    assert last["expires_on"] == OPEN_SENTINEL  # historical chain is open
    # unbounded replay of the same bug has 3 versions ending VERIFIED
    full = replay_history(fixture_df.filter("bug_id = 1")).toPandas()
    assert len(full) == 3


def test_versions_asof_point_in_time(spark, fixture_df):
    from bugzilla_etl_spark.operators.replay import versions_asof

    v = replay_history(fixture_df.filter("bug_id = 1"))
    at = versions_asof(v, 1000 + 1 * DAY + 5).toPandas()
    assert len(at) == 1
    assert json.loads(at.iloc[0]["state_json"])["status"] == "ASSIGNED"
    # exactly at a boundary: the NEW version starts at its modified_ts
    at2 = versions_asof(v, 1000 + 2 * DAY).toPandas()
    assert json.loads(at2.iloc[0]["state_json"])["status"] == "VERIFIED"


def test_flag_tiebreak_prefers_most_recent(spark):
    """J5 modified_ts tie-break (parse_bug_history.js:589-596): a
    removal that matches no flag exactly reconciles against the MOST
    RECENTLY SET candidate of the same (type, status), not the
    lexicographically first."""
    rows = [
        (7, 0, None, "creation_ts", "1000", None, None, 1),
        (7, 0, None, "reporter", "r", None, None, 1),
        # two review? flags set at different times (aaa earlier, zzz later)
        (7, 1000 + 1 * DAY, "u1", "flags", "review?(aaa@x.com)", "", None, 9),
        (7, 1000 + 2 * DAY, "u2", "flags", "review?(zzz@x.com)", "", None, 9),
        # a removal naming a requestee that matches neither exactly
        (7, 1000 + 3 * DAY, "other@q.com", "flags", "", "review?(gone@x.com)", None, 9),
    ]
    out = replay_history(
        spark.createDataFrame(_eav(rows), schema=EAV_SCHEMA)
    ).toPandas().sort_values("bug_version_num")
    final = json.loads(out.iloc[-1]["state_json"])
    # the most recent (zzz, day 2) is consumed; aaa survives
    assert final["flags"] == ["review?(aaa@x.com)"]


def test_flag_alias_map_assists_matching(spark):
    """J5 alias-map assist (parse_bug_history.js:506-521): the actor's
    aliased identity matches the dangling flag's requestee even when the
    raw emails differ."""
    rows = [
        (8, 0, None, "creation_ts", "1000", None, None, 1),
        (8, 0, None, "reporter", "r", None, None, 1),
        (8, 1000 + 1 * DAY, "u1", "flags", "review?(aaa@x.com)", "", None, 9),
        (8, 1000 + 2 * DAY, "u2", "flags", "review?(zzz@x.com)", "", None, 9),
        # remover acts as old@x.com; the alias map says old == aaa
        (8, 1000 + 3 * DAY, "old@x.com", "flags", "", "review?(missing@x.com)", None, 9),
    ]
    eav = spark.createDataFrame(_eav(rows), schema=EAV_SCHEMA)
    out = replay_history(
        eav, aliases={"old@x.com": "aaa@x.com"}
    ).toPandas().sort_values("bug_version_num")
    final = json.loads(out.iloc[-1]["state_json"])
    # alias identity beats the ts tie-break: aaa's flag is consumed
    assert final["flags"] == ["review?(zzz@x.com)"]
    # without the alias map the ts tie-break consumes zzz instead
    out2 = replay_history(eav).toPandas().sort_values("bug_version_num")
    assert json.loads(out2.iloc[-1]["state_json"])["flags"] == ["review?(aaa@x.com)"]
