"""History replay: the reference's core stateful operator (SURVEY §2.7),
re-expressed as a grouped-map Arrow UDF.

Reference: ``Parse Bug History`` (transformations/bugzilla_to_json.ktr:
1325-1375 driving transformations/parse_bug_history.js). Semantics
implemented here, with file:line cites:

- input is the normalized change-event EAV relation (SURVEY §1.1):
  (bug_id, modified_ts, modified_by, field_name, field_value,
  field_value_removed, attach_id, _merge_order);
- merge orders: 1 = current-state snapshot, 2 = multi-value current
  state, 9 = activity log (bugzilla_to_json.ktr:110-117; dispatch
  parse_bug_history.js:129-148);
- the activity log is walked BACKWARDS from current state: scalar
  fields reset to field_value_removed (parse_bug_history.js:301),
  multi-value fields have added items removed and removed items
  re-added (:284-292), yielding the original state; then deltas are
  replayed forward oldest-first (:321,339);
- same-timestamp versions merge (:349-353,499-501);
- expires_on = next version's modified_ts, open version = 9999999999000
  (:356-364; sentinel configuration/es/bug_version.json:221-224);
- previous_values tracks {field}_value / change_away_ts / change_to_ts /
  duration_days = floor(ms/86400000) (:636-660);
- multi-value truncation repair: "? ?" drops the list and marks the bug
  uncertain; leading "? " strips and marks uncertain (:87-122);
- stabilize(): multi-value lists and changes sorted so between-run
  diffs stay clean (:671-678);
- emitted versions are filtered to modified_ts >= start_time OR
  expires_on >= start_time (:480-483) — the incremental re-emit rule.

Output: one row per version with scalar state as a JSON object (sorted
keys — the JSON.stringify analog, :486-494), multi-value fields as
sorted arrays, and the change list that produced the version.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MULTI_FIELDS = {"cc", "keywords", "dependson", "blocked", "bug_group", "see_also",
                "dupe_by", "dupe_of", "flags"}
OPEN_SENTINEL = 9_999_999_999_000

#: flag syntax `type[?+-](requestee)` — parse_bug_history.js:35,680-695
import re as _re

FLAG_RE = _re.compile(r"^(.*?)([?+-])(?:\((.*)\))?$")


def parse_flag(raw: str) -> tuple[str, str, str | None]:
    """'review?(x@y)' -> ('review', '?', 'x@y'); malformed -> (raw,'',None)."""
    m = FLAG_RE.match(raw)
    if not m:
        return raw, "", None
    return m.group(1), m.group(2), m.group(3)

EAV_SCHEMA = T.StructType(
    [
        T.StructField("bug_id", T.LongType()),
        T.StructField("modified_ts", T.LongType()),
        T.StructField("modified_by", T.StringType()),
        T.StructField("field_name", T.StringType()),
        T.StructField("field_value", T.StringType()),
        T.StructField("field_value_removed", T.StringType()),
        T.StructField("attach_id", T.LongType()),
        T.StructField("_merge_order", T.LongType()),
    ]
)

VERSION_SCHEMA = T.StructType(
    [
        T.StructField("bug_id", T.LongType()),
        T.StructField("bug_version_id", T.StringType()),
        T.StructField("bug_version_num", T.IntegerType()),
        T.StructField("modified_ts", T.LongType()),
        T.StructField("modified_by", T.StringType()),
        T.StructField("expires_on", T.LongType()),
        T.StructField("state_json", T.StringType()),
        T.StructField("changes_json", T.StringType()),
        T.StructField("previous_values_json", T.StringType()),
        T.StructField("uncertain", T.BooleanType()),
    ]
)


def _split_multi(value: str) -> list[str]:
    """split(/\\s*,\\s*/) — parse_bug_history.js:780-786."""
    import re

    if value is None or value == "":
        return []
    return [v for v in re.split(r"\s*,\s*", value.strip()) if v != ""]


def _repair_truncation(items: list[str]) -> tuple[list[str], bool]:
    """Bugzilla bug 55161 workaround — parse_bug_history.js:87-122."""
    uncertain = False
    out = []
    for v in items:
        if v == "? ?" or v == "??":
            uncertain = True  # drop the broken element entirely
            continue
        if v.startswith("? "):
            uncertain = True
            out.append(v[2:])
        else:
            out.append(v)
    return out, uncertain


ALIAS_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType()),
        T.StructField("alias_type", T.StringType()),
        T.StructField("alias_count", T.LongType()),
        T.StructField("bug_id", T.LongType()),
    ]
)


def _replay_group(
    pdf: pd.DataFrame,
    start_time: int,
    emit: str = "versions",
    end_time: int | None = None,
    aliases: dict[str, str] | None = None,
) -> pd.DataFrame:
    bug_id = int(pdf["bug_id"].iloc[0])
    pdf = pdf.sort_values(
        ["_merge_order", "modified_ts", "field_name"], kind="mergesort"
    )
    aliases = aliases or {}

    def _canon(email) -> str | None:
        """BZ_ALIASES-assisted identity (parse_bug_history.js:506-521):
        emails are compared through the alias map, lowercased."""
        if email is None:
            return None
        e = str(email).lower()
        return aliases.get(e, e)

    # per-target flag set-timestamps for the J5 reconciliation tie-break
    # (parse_bug_history.js:589-596): key None = bug, else attach_id
    flag_ts: dict[object, dict[str, int]] = {}

    def _tsmap(aid) -> dict[str, int]:
        return flag_ts.setdefault(aid, {})

    # 1. current state from merge orders 1 and 2 (js:129-148)
    state: dict[str, object] = {}
    atts: dict[int, dict] = {}  # attach_id -> attachment state (js:211-219)
    uncertain = False
    cur_rows = pdf[pdf["_merge_order"].isin([1, 2, 7])]
    meta_ts, meta_by = None, None
    for r in cur_rows.itertuples():
        f, v = r.field_name, r.field_value
        if f == "modified_ts":
            meta_ts = int(v)
            continue
        if f == "modified_by":
            meta_by = v
            continue
        target = (
            atts.setdefault(int(r.attach_id), {})
            if pd.notna(r.attach_id)
            else state
        )
        if f in MULTI_FIELDS:
            items, unc = _repair_truncation(_split_multi(v))
            prev = target.get(f, [])
            target[f] = sorted(set(prev) | set(items))  # stabilize() sort
            uncertain |= unc
            if f == "flags":
                tsm = _tsmap(int(r.attach_id) if pd.notna(r.attach_id) else None)
                for it in items:
                    tsm.setdefault(it, meta_ts or 0)
        else:
            target[f] = v

    alias_pairs: list[tuple[str, str | None]] = []  # J5 unmatched requestees

    def _fuzzy_flag_discard(
        cur: set, flag: str, by: str | None, tsm: dict[str, int]
    ) -> None:
        """Discard ``flag`` from ``cur``; when absent, fuzzy-match by
        (request_type, status), preferring (1) a candidate whose
        requestee equals the actor through the alias map
        (parse_bug_history.js:506-521), else (2) the MOST RECENTLY SET
        candidate (the modified_ts tie-break, js:589-596; ties broken
        lexicographically), and record the requestee pair as an
        identity-alias candidate (parse_bug_aliases.js:685-703)."""
        if flag in cur:
            cur.discard(flag)
            tsm.pop(flag, None)
            return
        ftype, fstatus, freq = parse_flag(flag)
        cands = sorted(
            c for c in cur if parse_flag(c)[0] == ftype and parse_flag(c)[1] == fstatus
        )
        match = None
        for c in cands:
            creq = parse_flag(c)[2]
            if creq and by and _canon(creq) == _canon(by):
                match = c
                break
        if match is None and cands:
            match = max(cands, key=lambda c: (tsm.get(c, -1), c))
        if match is not None:
            cur.discard(match)
            tsm.pop(match, None)
            mreq = parse_flag(match)[2]
            if freq and mreq and freq != mreq:
                alias_pairs.append((freq, mreq))
        elif freq:
            alias_pairs.append((freq, None))

    # 2. walk the activity log BACKWARDS (js:284-301): invert each change
    acts = pdf[pdf["_merge_order"] == 9].sort_values(
        ["modified_ts", "field_name"], ascending=[False, True], kind="mergesort"
    )
    deltas: list[dict] = []  # newest-first
    for r in acts.itertuples():
        f = r.field_name
        added, unc_a = _repair_truncation(_split_multi(r.field_value))
        removed, unc_r = _repair_truncation(_split_multi(r.field_value_removed))
        uncertain |= unc_a or unc_r
        aid = int(r.attach_id) if pd.notna(r.attach_id) else None
        deltas.append(
            {
                "ts": int(r.modified_ts),
                "by": r.modified_by,
                "field": f,
                "attach_id": aid,
                "added": added if f in MULTI_FIELDS else r.field_value,
                "removed": removed if f in MULTI_FIELDS else r.field_value_removed,
            }
        )
        # attachment-scoped changes target the nested object; a missing
        # attachment is created empty (the js "missing attachment"
        # warning path, :265-267,390-397)
        target = atts.setdefault(aid, {}) if aid is not None else state
        if f in MULTI_FIELDS:
            cur = set(target.get(f, []))
            tsm = _tsmap(aid)
            for a in added:  # invert: remove what was added
                if f == "flags":
                    _fuzzy_flag_discard(cur, a, r.modified_by, tsm)
                else:
                    cur.discard(a)
            for rm in removed:  # invert: re-add what was removed
                cur.add(rm)
                if f == "flags":
                    # set-ts unknown pre-history; the change ts is the
                    # tightest upper bound (js uses the same)
                    tsm[rm] = int(r.modified_ts)
            target[f] = sorted(cur)
        else:
            target[f] = r.field_value_removed  # reset scalar (js:301)

    # state is now the ORIGINAL state; replay forward oldest-first (js:321,339)
    deltas.reverse()
    if end_time is not None:
        # END_TIME-bounded replay (bugzilla_to_json.ktr:17-21,
        # parse_bug_history.js:72-75; bin/rewind.sh): the backward walk
        # already restored the original state, so replaying only deltas
        # <= end_time reconstructs the exact historical state
        deltas = [d for d in deltas if d["ts"] <= end_time]

    # initial version: creation_ts if known, else the first delta ts
    creation_ts = state.get("creation_ts")
    first_ts = int(creation_ts) if creation_ts not in (None, "") else (
        deltas[0]["ts"] if deltas else (meta_ts or 0)
    )
    # if the initial ts coincides with the first delta, the creation
    # snapshot merges into that version (same-ts merge, js:349-353)
    emit_initial = not deltas or first_ts < deltas[0]["ts"]
    if not deltas and len(cur_rows) == 0:
        # end_time bound dropped every delta and there is no snapshot:
        # the entity does not exist yet at end_time
        emit_initial = False

    versions = []  # (ts, by, state snapshot, changes)
    prev_values: dict[str, dict] = {}

    def snapshot(ts, by, changes):
        import copy

        from ..functions.dates import fix_date_value

        # P10 date normalization at emit time (js:447-473)
        for k in list(state.keys()):
            if not isinstance(state[k], list):
                state[k] = fix_date_value(k, state[k])
        multi = {k: list(v) for k, v in state.items() if isinstance(v, list)}
        att_arr = [
            {"attach_id": k, **copy.deepcopy(v)} for k, v in sorted(atts.items())
        ]
        scalars = {
            k: v for k, v in state.items() if not isinstance(v, list) and v not in (None, "")
        }
        versions.append(
            {
                "ts": ts,
                "by": by,
                "scalars": scalars,
                "multi": multi,
                "changes": sorted(changes, key=lambda c: c["field"]),  # stabilize()
                "attachments": att_arr,
                "prev": {k: dict(v) for k, v in prev_values.items()},
            }
        )

    if emit_initial:
        snapshot(first_ts, state.get("reporter") or meta_by, [])

    i = 0
    while i < len(deltas):
        ts = deltas[i]["ts"]
        by = deltas[i]["by"]
        changes = []
        # merge same-timestamp deltas into one version (js:349-353)
        while i < len(deltas) and deltas[i]["ts"] == ts:
            d = deltas[i]
            f = d["field"]
            target = (
                atts.setdefault(d["attach_id"], {})
                if d.get("attach_id") is not None
                else state
            )
            old = target.get(f)
            if f == "flags":
                # J5 fuzzy reconciliation on the forward pass too
                cur = set(target.get(f, []))
                tsm = _tsmap(d.get("attach_id"))
                for rm in d["removed"]:
                    _fuzzy_flag_discard(cur, rm, d["by"], tsm)
                for a in d["added"]:
                    cur.add(a)
                    tsm[a] = ts
                target[f] = sorted(cur)
            elif f in MULTI_FIELDS:
                cur = set(target.get(f, []))
                for rm in d["removed"]:
                    cur.discard(rm)
                for a in d["added"]:
                    cur.add(a)
                target[f] = sorted(cur)
            else:
                target[f] = d["added"]
            # previous_values duration tracking (js:636-660)
            pv = prev_values.setdefault(f, {})
            prev_to = pv.get("change_to_ts", first_ts)
            pv["value"] = old if not isinstance(old, list) else ",".join(old)
            pv["change_away_ts"] = ts
            pv["change_to_ts"] = ts
            pv["duration_days"] = (ts - prev_to) // 86_400_000
            changes.append(
                {
                    "field": f,
                    "added": d["added"] if not isinstance(d["added"], list) else ",".join(d["added"]),
                    "removed": d["removed"] if not isinstance(d["removed"], list) else ",".join(d["removed"]),
                }
            )
            i += 1
        snapshot(ts, by, changes)

    if emit == "aliases":
        # the parse_bug_aliases.js fork: emit per-bug counts of flag
        # requestees seen in unmatched/fuzzy removals (:436-458,685-703)
        from collections import Counter, defaultdict

        matched: dict[str, set] = defaultdict(set)
        counts: Counter = Counter()
        for rreq, mreq in alias_pairs:
            counts[rreq] += 1
            if mreq:
                matched[rreq].add(mreq)
        return pd.DataFrame(
            [
                (r, "multi" if len(matched[r]) > 1 else "single", counts[r], bug_id)
                for r in sorted(counts)
            ],
            columns=[f.name for f in ALIAS_SCHEMA.fields],
        )

    # expires_on chaining (js:356-364)
    rows = []
    for vi, v in enumerate(versions):
        expires = versions[vi + 1]["ts"] if vi + 1 < len(versions) else OPEN_SENTINEL
        if not (v["ts"] >= start_time or expires >= start_time):
            continue  # incremental emission filter (js:480-483)
        payload = dict(v["scalars"])
        payload.update({k: v["multi"][k] for k in sorted(v["multi"])})
        if v["attachments"]:
            payload["attachments"] = v["attachments"]
        rows.append(
            (
                bug_id,
                f"{bug_id}.{v['ts']}",  # deterministic doc id (js:168)
                vi + 1,
                v["ts"],
                v["by"],
                expires,
                json.dumps(payload, sort_keys=True),
                json.dumps(v["changes"], sort_keys=True),
                json.dumps(v["prev"], sort_keys=True),
                uncertain,
            )
        )
    return pd.DataFrame(rows, columns=[f.name for f in VERSION_SCHEMA.fields])


def replay_history(
    eav: DataFrame,
    start_time: int = 0,
    end_time: int | None = None,
    aliases: dict[str, str] | None = None,
) -> DataFrame:
    """EAV change events -> versioned snapshots, one group per bug_id.

    ``df.groupBy('bug_id').applyInPandas`` — the Spark-native shape of
    the reference's per-group stateful fold (N change rows in, M version
    docs out). ``end_time`` caps the replay for deterministic historical
    reproduction (bin/rewind.sh + bin/get_time_range.sh:23-26);
    ``aliases`` is the BZ_ALIASES email->canonical map consulted during
    flag reconciliation (small: closure-captured, shipped with the task
    like a broadcast)."""

    def run(pdf):  # (pd.DataFrame) -> pd.DataFrame
        return _replay_group(pdf, start_time, end_time=end_time, aliases=aliases)

    return eav.groupBy("bug_id").applyInPandas(run, schema=VERSION_SCHEMA)


def versions_asof(versions: DataFrame, ts: int) -> DataFrame:
    """Point-in-time slice over validity intervals: the version active
    at ``ts`` per bug — ``modified_ts <= ts < expires_on`` (the
    reference's query-side temporal filter, parse_bug_history.js:356-364;
    open-version sentinel configuration/es/bug_version.json:221-224)."""
    from pyspark.sql import functions as F

    return versions.filter(
        (F.col("modified_ts") <= ts) & (F.col("expires_on") > ts)
    )


def replay_aliases(eav: DataFrame, aliases: dict[str, str] | None = None) -> DataFrame:
    """The find_aliases variant (SURVEY §3.3): same grouped fold,
    alternate emit — per-bug (alias, single|multi, count) rows from
    flag-requestee reconciliation misses."""

    def run(pdf):  # (pd.DataFrame) -> pd.DataFrame
        return _replay_group(pdf, 0, emit="aliases", aliases=aliases)

    return eav.groupBy("bug_id").applyInPandas(run, schema=ALIAS_SCHEMA)
