"""replay -> index composition (VERDICT r3 #2): version documents from
the §2.7 history replay feed the fulltext index; as-of queries run as
temporal predicates; incremental re-replay overwrites by deterministic
doc id (the reference's ES-upsert idempotence, SURVEY §3.2).
"""

from __future__ import annotations

import pandas as pd
import pytest

from bugzilla_etl_spark.index.manifest import IndexManifest
from bugzilla_etl_spark.operators.replay import EAV_SCHEMA, OPEN_SENTINEL, replay_history
from bugzilla_etl_spark.plans.replay_index import (
    build_version_index,
    search_versions_asof,
    upsert_versions,
    versions_to_corpus,
)

T1, T2, T3 = 1_000_000, 2_000_000, 3_000_000


def _eav(spark, rows):
    pdf = pd.DataFrame(
        rows,
        columns=[
            "bug_id", "modified_ts", "modified_by", "field_name",
            "field_value", "field_value_removed", "attach_id", "_merge_order",
        ],
    )
    return spark.createDataFrame(pdf, schema=EAV_SCHEMA)


def _phase1(spark):
    """Three bugs, two change timestamps each bug at most."""
    return _eav(spark, [
        (1, T1, "u1", "status", "alpha wolf", None, None, 9),
        (1, T2, "u1", "status", "beta wolf", None, None, 9),
        (2, T1, "u2", "status", "gamma crane", None, None, 9),
        (3, T2, "u3", "status", "delta crane", None, None, 9),
    ])


def _phase2(spark):
    """Same history plus one NEW event: bug 1 changes again at T3."""
    return _eav(spark, [
        (1, T1, "u1", "status", "alpha wolf", None, None, 9),
        (1, T2, "u1", "status", "beta wolf", None, None, 9),
        (1, T3, "u1", "status", "epsilon wolf", None, None, 9),
        (2, T1, "u2", "status", "gamma crane", None, None, 9),
        (3, T2, "u3", "status", "delta crane", None, None, 9),
    ])


def _ids(spark, versions):
    from pyspark.sql import functions as F

    return {
        (int(r["bug_id"]), int(r["modified_ts"])): int(r["doc_id"])
        for r in versions_to_corpus(versions)
        .select("bug_id", "modified_ts", F.xxhash64("repo", "path", "commit").alias("doc_id"))
        .collect()
    }


def test_replay_feeds_index_and_asof_search(spark, tmp_path):
    d = str(tmp_path / "vidx")
    versions = replay_history(_phase1(spark))
    m = build_version_index(spark, versions, d, n_shards=2, n_tb=2)
    assert m.n_docs == 4  # bug1 x2, bug2 x1, bug3 x1
    # at T1+1: bug1 v1 (alpha), bug2 v1 active; bug3 doesn't exist yet
    res = search_versions_asof(spark, d, "wolf", T1 + 1)
    ids = _ids(spark, versions)
    assert [x for x, _ in res] == [ids[(1, T1)]]
    assert search_versions_asof(spark, d, "alpha", T2 + 1) == []
    res = search_versions_asof(spark, d, "crane", T2 + 1, k=5)
    assert {x for x, _ in res} == {ids[(2, T1)], ids[(3, T2)]}


def test_upsert_overwrites_reopened_version(spark, tmp_path):
    """The reopened-bug case: a new event CHANGES the open version's
    expires_on; the incremental re-emission (modified_ts >= start OR
    expires_on >= start) re-delivers it and upsert must overwrite the
    stale interval, not duplicate the doc."""
    d = str(tmp_path / "vidx")
    build_version_index(
        spark, replay_history(_phase1(spark)), d, n_shards=2, n_tb=2
    )
    v1 = replay_history(_phase1(spark)).collect()
    open_v = {(r["bug_id"], r["modified_ts"]): r["expires_on"] for r in v1}
    assert open_v[(1, T2)] == OPEN_SENTINEL
    # incremental window: everything touched since T2+1
    delta = replay_history(_phase2(spark), start_time=T2 + 1)
    rows = delta.collect()
    emitted = {(r["bug_id"], r["modified_ts"]): r["expires_on"] for r in rows}
    # the re-emitted old version now carries the CLOSED interval; open
    # versions of untouched bugs re-emit too (sentinel expires_on always
    # satisfies the emission rule, parse_bug_history.js:480-483) and are
    # overwritten in place as identical no-ops
    assert emitted == {
        (1, T2): T3,
        (1, T3): OPEN_SENTINEL,
        (2, T1): OPEN_SENTINEL,
        (3, T2): OPEN_SENTINEL,
    }
    m = upsert_versions(spark, delta, d)
    assert m.n_docs == 5  # 4 + the new T3 version; T2 overwritten in place
    full = replay_history(_phase2(spark))
    ids = _ids(spark, full)
    # between T2 and T3 the (updated) T2 version is active...
    res = search_versions_asof(spark, d, "beta wolf", T2 + 1)
    assert [x for x, _ in res][:1] == [ids[(1, T2)]]
    # ...and after T3 it is NOT (stale sentinel would leak it here)
    res = search_versions_asof(spark, d, "wolf", T3 + 1, k=5)
    assert [x for x, _ in res] == [ids[(1, T3)]]

    # at-least-once: replaying the same increment is a no-op
    m2 = upsert_versions(spark, replay_history(_phase2(spark), start_time=T2 + 1), d)
    assert m2.n_docs == 5
    assert search_versions_asof(spark, d, "wolf", T3 + 1, k=5) == res

    # and the incremental index answers exactly like a from-scratch build
    d2 = str(tmp_path / "vidx_full")
    build_version_index(spark, full, d2, n_shards=2, n_tb=2)
    for q, t in [("wolf", T1 + 1), ("crane", T2 + 1), ("wolf", T3 + 1), ("epsilon", T3 + 1)]:
        assert search_versions_asof(spark, d, q, t, k=5) == search_versions_asof(
            spark, d2, q, t, k=5
        ), (q, t)


def test_upsert_ids_are_content_addressed(spark, tmp_path):
    """doc id = f(bug_id, modified_ts) — the bug_id.modified_ts ES _id
    analog: identical history yields identical ids at any parallelism."""
    v = replay_history(_phase1(spark))
    a = _ids(spark, v)
    b = _ids(spark, replay_history(_phase1(spark).repartition(7)))
    assert a == b


def test_phrase_search_versions_asof(spark, tmp_path):
    """VERDICT r4 #4: phrase-over-versions-asof — exact match_phrase
    composed with the temporal interval predicate (the analyzed match +
    filter context + range shape of bug_version.json:57-65,221-224)."""
    from bugzilla_etl_spark.plans.replay_index import phrase_search_versions_asof

    d = str(tmp_path / "vidx")
    versions = replay_history(_phase1(spark))
    build_version_index(spark, versions, d, n_shards=2, n_tb=2, positions=True)
    ids = _ids(spark, versions)
    # "beta wolf" is adjacent only in bug1's T2 version: absent at T1+1,
    # present at T2+1
    assert phrase_search_versions_asof(spark, d, "beta wolf", T1 + 1) == []
    res = phrase_search_versions_asof(spark, d, "beta wolf", T2 + 1)
    assert [x for x, _ in res] == [ids[(1, T2)]]
    # reversed order never matches (adjacency, not bag-of-words: plain
    # asof search DOES match the same version)
    assert phrase_search_versions_asof(spark, d, "wolf beta", T2 + 1) == []
    assert search_versions_asof(spark, d, "wolf beta", T2 + 1) != []
    # extra predicate narrows within the temporal slice
    res = phrase_search_versions_asof(
        spark, d, "gamma crane", T2 + 1, extra_predicate=[("bug_id", "==", 2)]
    )
    assert [x for x, _ in res] == [ids[(2, T1)]]
    assert phrase_search_versions_asof(
        spark, d, "gamma crane", T2 + 1, extra_predicate=[("bug_id", "==", 3)]
    ) == []
    # phrase_freq scoring composes
    pf = phrase_search_versions_asof(
        spark, d, "beta wolf", T2 + 1, scoring="phrase_freq"
    )
    assert [x for x, _ in pf] == [ids[(1, T2)]]


def test_upsert_batch_bound(spark, tmp_path):
    """VERDICT r4 item 7: the upsert id collect is bounded — a batch
    over max_batch_ids raises with chunking instructions instead of
    OOMing the driver; the driver materializes at most bound+1 ids."""
    d = str(tmp_path / "vidx")
    build_version_index(
        spark, replay_history(_phase1(spark)), d, n_shards=2, n_tb=2
    )
    delta = replay_history(_phase2(spark), start_time=T2 + 1)
    with pytest.raises(ValueError, match="max_batch_ids"):
        upsert_versions(spark, delta, d, max_batch_ids=2)
    # at/below the bound: normal upsert
    m = upsert_versions(spark, delta, d, max_batch_ids=4)
    assert m.n_docs == 5
