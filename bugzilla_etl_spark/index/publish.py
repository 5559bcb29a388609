"""Zero-downtime full-rebuild publication (VERDICT r4 item 8).

The reference rebuilds into a FRESH ES index and repoints the ``bugs``
alias only when the import finishes (/root/reference/bin/import_bugs.sh:
21-23) — readers keep hitting the old index during the hours-long build
and flip atomically at the end. The engine analog is a POINTER file:

- a build lands in its own directory (its manifest commit is already
  atomic *within* the dir);
- ``publish_index(build_dir, pointer_path)`` atomically repoints the
  pointer (temp file + ``os.replace`` — same discipline as the
  manifest/watermark commits) after validating the build is complete;
- readers resolve the pointer per query (``resolve_index``) and see
  either the old or the new directory, never a torn state; the old
  directory is left intact for readers already inside it (caller GCs
  old generations once drained).

The pointer carries a generation counter so successive rebuilds get
monotonically-named directories (``gen_00001``, ...) without wall-clock
naming.
"""

from __future__ import annotations

import json
import os

from .manifest import IndexManifest, path_lock


def resolve_index(pointer_path: str) -> str:
    """The directory queries should run against right now."""
    with open(pointer_path) as f:
        return json.load(f)["index_dir"]


def read_pointer(pointer_path: str) -> dict:
    with open(pointer_path) as f:
        return json.load(f)


def publish_index(build_dir: str, pointer_path: str) -> str | None:
    """Atomically repoint ``pointer_path`` at ``build_dir``.

    Validates the build is committed (manifest loads, has live docs or
    at least segments metadata) before the flip, so a crashed build can
    never be published. Returns the PREVIOUS index dir (None on first
    publish) — the caller decides when in-flight readers have drained
    and the old generation can be deleted."""
    build_dir = os.path.abspath(build_dir)
    m = IndexManifest.load(build_dir)  # raises if nothing committed
    if m.checkpoints:
        # a full build clears its checkpoints on completion; leftovers
        # mean the build died mid-way and resume never finished
        incomplete = [k for k in m.checkpoints if not m.segments]
        if incomplete:
            raise ValueError(
                f"build at {build_dir} is incomplete (checkpoints "
                f"{sorted(m.checkpoints)} without committed segments)"
            )
    prev = None
    gen = 0
    if os.path.exists(pointer_path):
        cur = read_pointer(pointer_path)
        prev = cur.get("index_dir")
        gen = int(cur.get("generation", 0))
    tmp = pointer_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "index_dir": build_dir,
                "generation": gen + 1,
                "n_docs": m.n_docs,
                "previous": prev,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    os.replace(tmp, pointer_path)
    return prev


def next_build_dir(root: str, pointer_path: str | None = None) -> str:
    """Monotonic generation directory under ``root`` (``gen_00001``...):
    one past the pointer's generation, skipping any dirs already on
    disk (a crashed previous rebuild leaves its dir behind)."""
    os.makedirs(root, exist_ok=True)
    gen = 0
    if pointer_path and os.path.exists(pointer_path):
        gen = int(read_pointer(pointer_path).get("generation", 0))
    while True:
        gen += 1
        d = os.path.join(root, f"gen_{gen:05d}")
        if not os.path.exists(d):
            return d


# ----------------------------------------------------------- multi-index
def publish_alias(index_dirs: list[str], alias_path: str) -> list | None:
    """Atomically (re)point an ALIAS at several index directories — the
    ES alias-spanning-indices model (time-partitioned indexes queried
    as one, ``logs-*`` style). Every member build is validated exactly
    like publish_index; readers resolve the member list per query and
    see the old or new list, never a torn one. Returns the previous
    member list (None on first publish)."""
    dirs = [os.path.abspath(d) for d in index_dirs]
    if not dirs:
        raise ValueError("an alias needs at least one index dir")
    if len(set(dirs)) != len(dirs):
        raise ValueError(f"duplicate alias members: {dirs}")
    total = 0
    for d in dirs:
        m = IndexManifest.load(d)  # raises if nothing committed
        total += m.n_docs
    # the same load->commit race as manifests (ADVICE r5 on gc): two
    # concurrent publishers would clobber each other's generation
    with path_lock(alias_path + ".lock"):
        prev = None
        gen = 0
        if os.path.exists(alias_path):
            cur = read_pointer(alias_path)
            prev = cur.get("index_dirs")
            gen = int(cur.get("generation", 0))
        tmp = alias_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "index_dirs": dirs,
                    "generation": gen + 1,
                    "n_docs": total,
                    "previous": prev,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        os.replace(tmp, alias_path)
    return prev


def resolve_alias(alias_path: str) -> list[str]:
    """The member index directories queries should fan out to right
    now. A single-index POINTER file resolves as a one-member alias,
    so readers can treat every published target uniformly."""
    cur = read_pointer(alias_path)
    if "index_dirs" in cur:
        return list(cur["index_dirs"])
    return [cur["index_dir"]]


def rollover(
    alias_path: str,
    root: str,
    max_docs: int | None = None,
    max_segments: int | None = None,
) -> str | None:
    """ES index ``rollover``: when the alias's WRITE member (its last
    member) exceeds a threshold, start a fresh member with the same
    mapping and atomically repoint the alias — the ILM discipline that
    keeps time-partitioned indexes individually small enough to merge,
    snapshot, and expire. No Spark session and no data movement: the
    new member is an empty committed manifest CLONING the write
    member's fixed config (analyzer, sharding, fields, typed attrs,
    positions, store_source), so ``incremental_update`` ingests into it
    unchanged and every multi_index_* entry point spans old + new
    members immediately.

    Returns the new member dir when a rollover happened, None when no
    threshold was exceeded (give at least one). Old members stay
    queryable alias members until the caller drops/archives them."""
    import dataclasses

    if max_docs is None and max_segments is None:
        raise ValueError("rollover needs max_docs and/or max_segments")
    from .manifest import IndexManifest

    # hold the alias lock across the WHOLE check->create->publish cycle:
    # two concurrent rollovers would otherwise both see the old write
    # member over-threshold and each add a member (path_lock is
    # re-entrant, so the inner publish_alias just nests)
    with path_lock(alias_path + ".lock"):
        members = resolve_alias(alias_path)
        cur = members[-1]
        m = IndexManifest.load(cur)
        over = (
            (max_docs is not None and m.n_docs >= int(max_docs))
            or (max_segments is not None
                and len(m.segments) >= int(max_segments))
        )
        if not over:
            return None
        new_dir = next_build_dir(root)
        fresh = IndexManifest(
            **{
                f.name: getattr(m, f.name)
                for f in dataclasses.fields(IndexManifest)
                if f.name in (
                    "version", "k1", "b", "tokenizer", "n_shards", "n_tb",
                    "n_sb", "n_salts", "block_size", "positions",
                    "store_source",
                )
            },
            fields=dict(m.fields),
            doc_attrs=list(m.doc_attrs),
            doc_attr_types=dict(m.doc_attr_types),
        )
        fresh.commit(new_dir)
        publish_alias(members + [new_dir], alias_path)
    return new_dir
