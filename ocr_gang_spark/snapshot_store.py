"""Versioned snapshot table layer: time-travel reads + snapshot expiry.

north_rule names Iceberg as the table format; this sandbox has no
Iceberg jars (checkpoint.py module docstring), so the engine's other
Iceberg-analog surfaces (dynamic-overwrite idempotent commit, changelog
merge-on-read, compaction, orphan cleanup, schema-evolution reads,
snapshot diff) are joined here by the metadata design itself: an
append-only manifest log over immutable parquet data directories,
giving O(1) atomic commits, time-travel reads of any retained version,
and safe expiry of old snapshots.

Layout (all under one table_dir):

    data/v00000001-3fa9c1d2/        immutable files of one commit
                                    ATTEMPT — the name is writer-unique
                                    (version label + random token), so
                                    concurrent or retried writers can
                                    never clobber each other's data;
                                    only manifests give dirs meaning
    meta/v00000001.json             manifest: full list of live data
                                    dirs AS OF that version (Iceberg
                                    style: each snapshot is
                                    self-contained, never a delta
                                    chain to replay)
    meta/current                    pointer {"version": N}, updated by
                                    atomic rename LAST — a crash at any
                                    earlier point leaves the previous
                                    version current and only orphan
                                    files behind (healed by expiry or
                                    the next commit)

Commit protocol (optimistic concurrency, the Iceberg model: data file
names are writer-unique, only the metadata commit contends):

    1. write new data files into a fresh writer-unique dir
    2. verify the current pointer still names the parent we planned
       against; write manifest to meta/.tmp-v{N}.json, os.replace to
       the final name
    3. re-verify the pointer, then os.replace meta/current

A writer that finds the pointer moved raises SnapshotConflictError
instead of publishing (its data dir is unreferenced garbage the next
expire_snapshots sweeps); commit_snapshot_retrying re-attempts the
METADATA commit against the new parent, reusing the already-written
data — Iceberg's CommitFailedException + retry, where a conflict costs
one manifest write, never a data rewrite.  Atomicity: steps 2-3 run
under an exclusive per-table fcntl lock (_commit_lock) — the
single-host analog of the catalog compare-and-swap a lakehouse
provides — so no interleaving of two metadata commits is possible at
all; the kernel releases the lock on process death, so a crash while
holding it cannot wedge the table.  Data writes never run under the
lock.  The lock serializes METADATA commits only: expire_snapshots
computes its referenced-set under the lock but sweeps data dirs after
releasing it, so a concurrent writer whose _write_data starts in that
window could lose its fresh (not-yet-referenced) dir — expiry remains
single-writer-only (no writers in flight), as its own docstring
states.  A real deployment swaps the lock + pointer rename for a
catalog CAS; the conflict semantics (SnapshotConflictError, retry
against the new parent) are identical.

Scale notes: manifests list data DIRECTORIES (one per commit), not
individual files, so manifest size is O(commits since last overwrite),
not O(10^12 rows); reads plan a normal multi-path parquet scan with
full predicate pushdown/pruning.  All metadata ops are driver-side
local-FS JSON of that same bounded size — at real scale the identical
protocol runs against an object store + catalog.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_META = "meta"
_DATA = "data"


class SnapshotConflictError(RuntimeError):
    """A concurrent writer committed first: the current pointer no
    longer names the parent this commit was planned against.  The
    loser's data dir is unreferenced (expire_snapshots sweeps it);
    nothing it did is visible.  Retry against the new current —
    commit_snapshot_retrying does exactly that, reusing the data."""


@contextmanager
def _commit_lock(table_dir: str):
    """Exclusive per-table metadata lock (fcntl.flock on
    meta/.commitlock): every writer that mutates the manifest slots or
    the current pointer — plain commit, stage, publish, abandon, expiry
    — holds it for the (file-rename-sized) critical section.  This is
    the single-host analog of the catalog compare-and-swap a lakehouse
    provides: conflicts are still DETECTED optimistically (the pointer
    check inside the lock), but interleavings cannot corrupt state —
    before this lock, a loser's post-replace cleanup could os.remove a
    manifest slot the winner's pointer had just started referencing
    (round-4 review), and the heal-a-phantom overwrite could clobber a
    racer's in-flight manifest.  flock is released by the kernel on
    process death, so a crash while holding it cannot wedge the table
    (the unfinished writer's tmp files are expiry-sweepable garbage).
    Data writes NEVER happen under the lock — only metadata renames."""
    os.makedirs(os.path.join(table_dir, _META), exist_ok=True)
    f = open(os.path.join(table_dir, _META, ".commitlock"), "w")
    try:
        fcntl.flock(f, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(f, fcntl.LOCK_UN)
        f.close()


def _vname(version: int) -> str:
    return f"v{version:08d}"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _META, _vname(version) + ".json")


def current_version(table_dir: str) -> int | None:
    """Committed current version, or None for an empty/absent table."""
    ptr = os.path.join(table_dir, _META, "current")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(json.load(f)["version"])


def _load_manifest(table_dir: str, version: int) -> dict:
    """Load a COMMITTED manifest.  A manifest whose version exceeds the
    current pointer is a crashed commit's leftover (the pointer is
    published last) — it must be invisible to reads, not silently
    served as data that was never committed."""
    cur = current_version(table_dir)
    path = _manifest_path(table_dir, version)
    if cur is None or version > cur or not os.path.exists(path):
        raise FileNotFoundError(
            f"snapshot v{version} of {table_dir} does not exist "
            f"(expired, never committed, or uncommitted leftover; "
            f"current={cur})"
        )
    with open(path) as f:
        return json.load(f)


def _write_data(table_dir: str, df: DataFrame, version_label: int) -> str:
    """Write df into a fresh WRITER-UNIQUE data dir and return its
    table-relative path.  The version in the name is a human label of
    the slot the writer was aiming at when it wrote (a conflict retry
    may commit the same dir under a later version); the random token is
    what makes concurrent and crashed-then-retried writers physically
    unable to clobber one another — the Iceberg rule that data file
    names are unique and only metadata contends."""
    rel_dir = f"{_DATA}/{_vname(version_label)}-{uuid.uuid4().hex[:8]}"
    df.write.mode("error").parquet(os.path.join(table_dir, rel_dir))
    return rel_dir


def _check_slot_not_staged(table_dir: str, version: int) -> None:
    """The version slot may hold a crashed commit's phantom manifest
    (no staged flag) — healing that by overwrite is the crash contract
    — but never an in-flight write-audit-publish stage."""
    existing = _manifest_path(table_dir, version)
    if os.path.exists(existing):
        with open(existing) as f:
            if json.load(f).get("staged"):
                raise RuntimeError(
                    f"snapshot v{version} is staged for audit in "
                    f"{table_dir}; publish or abandon it before committing"
                )


def _try_commit_metadata(
    table_dir: str,
    rel_dir: str,
    op: str,
    tag: str | None,
    parent: int | None,
) -> int:
    """Attempt the metadata half of a commit against ``parent``:
    manifest write + pointer swap, with the pointer re-verified before
    each visible step.  Raises SnapshotConflictError the moment the
    pointer is found to have moved — the already-written data dir stays
    on disk, unreferenced, reusable by a retry and sweepable by
    expiry."""
    with _commit_lock(table_dir):
        cur = current_version(table_dir)
        if cur != parent:
            raise SnapshotConflictError(
                f"commit against parent {parent} lost: current of "
                f"{table_dir} is now {cur}"
            )
        version = 1 if parent is None else parent + 1
        _check_slot_not_staged(table_dir, version)

        if op == "append" and parent is not None:
            files = list(_load_manifest(table_dir, parent)["files"])
        else:
            files = []
        files.append(rel_dir)

        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": files,
            "tag": tag,
        }
        mpath = _manifest_path(table_dir, version)
        # writer-unique tmp name: a crashed writer's stale tmp must not
        # be interleaved into by a retry
        tmp = os.path.join(
            table_dir, _META,
            f".tmp-{_vname(version)}-{uuid.uuid4().hex[:8]}.json",
        )
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        # under the lock the pointer cannot move between here and the
        # swap, so the replace may safely overwrite a crashed commit's
        # phantom manifest (the heal rule) — a LIVE racer's manifest
        # can never be at this slot, because every slot writer holds
        # the same lock and checked the pointer first.  (The previous
        # lock-free protocol re-checked the pointer after this replace
        # and os.remove'd the slot on conflict — which could delete
        # the manifest a winning racer's pointer had just started
        # referencing; round-4 review.)
        os.replace(tmp, mpath)

        ptr_tmp = os.path.join(table_dir, _META, ".tmp-current")
        with open(ptr_tmp, "w") as f:
            json.dump({"version": version}, f)
        os.replace(ptr_tmp, os.path.join(table_dir, _META, "current"))
        return version


def commit_snapshot(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    op: str = "append",
    tag: str | None = None,
) -> int:
    """Commit df as a new snapshot; returns the new version number.

    op='append' carries the parent's data dirs forward plus the new
    one; op='overwrite' starts the file list fresh (the caller's df may
    itself be a filtered read of an older snapshot — a GDPR-delete
    rewrite — which is safe because it writes to a NEW data dir, never
    the dirs it reads).  The data write happens before any metadata
    becomes visible; a crash mid-commit leaves an orphan data dir that
    expire_snapshots removes; a retry simply writes a fresh unique dir.

    ``tag`` is an opaque idempotency token recorded in the manifest —
    a replayed producer (e.g. a restarted streaming micro-batch, see
    streaming.snapshot_append_stream) checks has_tag() before
    committing so re-delivery cannot double-append.

    Concurrency: if another writer publishes between this writer's plan
    and its pointer swap, SnapshotConflictError is raised and the table
    is exactly as the winner left it — this writer's data dir is
    unreferenced garbage for the next expiry sweep.  Use
    commit_snapshot_retrying to re-attempt automatically."""
    if op not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot op {op!r}")
    parent = current_version(table_dir)
    version = 1 if parent is None else parent + 1
    # early refusal (cheap, before the data write); re-checked inside
    # the metadata commit
    _check_slot_not_staged(table_dir, version)
    rel_dir = _write_data(table_dir, df, version)
    return _try_commit_metadata(table_dir, rel_dir, op, tag, parent)


def commit_snapshot_retrying(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    op: str = "append",
    tag: str | None = None,
    max_retries: int = 5,
) -> int:
    """commit_snapshot with Iceberg's conflict-retry semantics: the
    data is written ONCE into its writer-unique dir; on
    SnapshotConflictError only the metadata commit is re-attempted
    against the new current.  An append retry is always semantically
    safe (the rows still belong after someone else's commit); an
    overwrite retry replaces the CONFLICTING winner's state too, which
    is last-writer-wins by design here — callers needing
    read-validate-overwrite semantics should catch the conflict and
    re-derive df instead.

    If ``tag`` is set and the conflicting winner carried the same tag,
    the commit is recognized as our own replayed twin and skipped
    (idempotent), returning the current version."""
    if tag is not None and has_tag(table_dir, tag):
        return current_version(table_dir)
    parent = current_version(table_dir)
    rel_dir = _write_data(table_dir, df, 1 if parent is None else parent + 1)
    for attempt in range(max_retries + 1):
        try:
            return _try_commit_metadata(table_dir, rel_dir, op, tag, parent)
        except SnapshotConflictError:
            if tag is not None and has_tag(table_dir, tag):
                return current_version(table_dir)
            if attempt == max_retries:
                raise
            parent = current_version(table_dir)


def has_tag(table_dir: str, tag: str) -> bool:
    """True if any RETAINED committed manifest carries the idempotency
    tag.  O(commits) over the manifest log — the producer's replay
    window must be shorter than the expiry horizon, the same contract
    Iceberg's WAP/branch tags carry."""
    return any(m.get("tag") == tag for m in snapshot_log(table_dir))


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read the table AS OF a version, a named ref, or current.  Plans
    a plain multi-path parquet scan over the manifest's immutable data
    dirs — pushdown, pruning and mergeSchema behave exactly as on any
    parquet read.  Raises FileNotFoundError for an expired version or
    unknown ref."""
    if ref is not None:
        if version is not None:
            raise ValueError("pass version or ref, not both")
        r = refs(table_dir)
        if ref not in r:
            raise FileNotFoundError(f"no ref {ref!r} in {table_dir}")
        version = r[ref]
    if version is None:
        version = current_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"{table_dir} has no committed snapshot")
    manifest = _load_manifest(table_dir, version)
    paths = [os.path.join(table_dir, rel) for rel in manifest["files"]]
    return spark.read.parquet(*paths)


def read_incremental(
    spark: SparkSession, table_dir: str, from_version: int, to_version: int
) -> DataFrame:
    """Rows ADDED between two snapshots (Iceberg incremental-scan
    analog) — the input an incremental consumer (re-extraction, dedup
    index update, downstream sync) processes instead of the full table.

    Exact and O(new files) for append chains: the delta is the data
    dirs in to_version's manifest that from_version's lacks — no diff
    join, no full scan.  An overwrite in the range rewrites history
    rather than appending, so the file-list delta is no longer
    'added rows'; that case raises instead of silently returning
    wrong data (consumers restart from the overwritten snapshot, the
    same rule Iceberg's incremental read applies)."""
    if to_version <= from_version:
        raise ValueError(
            f"to_version {to_version} must exceed from_version {from_version}"
        )
    old = _load_manifest(table_dir, from_version)
    for v in range(from_version + 1, to_version + 1):
        if _load_manifest(table_dir, v)["op"] != "append":
            raise ValueError(
                f"snapshot v{v} is an overwrite: incremental read across "
                f"it is undefined — restart from v{v}"
            )
    new = _load_manifest(table_dir, to_version)
    added = [f for f in new["files"] if f not in set(old["files"])]
    if not added:
        raise ValueError(
            f"no data dirs added between v{from_version} and v{to_version}"
        )
    return spark.read.parquet(
        *[os.path.join(table_dir, rel) for rel in added]
    )


def _refs_path(table_dir: str) -> str:
    return os.path.join(table_dir, _META, "refs.json")


def refs(table_dir: str) -> dict:
    """Named refs (Iceberg tags): {name: version}.  A ref gives
    readers a stable name ('prod', 'eval-2026-08') and PINS its
    snapshot against expiry."""
    path = _refs_path(table_dir)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def set_ref(table_dir: str, name: str, version: int | None) -> None:
    """Create/move a named ref to a committed version, or delete it
    with version=None.  Atomic (tmp + rename), same as every other
    metadata write here."""
    if version is not None:
        _load_manifest(table_dir, version)  # must be committed
    r = refs(table_dir)
    if version is None:
        r.pop(name, None)
    else:
        r[name] = version
    tmp = _refs_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(r, f, sort_keys=True)
    os.replace(tmp, _refs_path(table_dir))


def stage_snapshot(
    spark: SparkSession,
    table_dir: str,
    df: DataFrame,
    op: str = "append",
    tag: str | None = None,
) -> int:
    """Write-audit-publish, step 1: commit df's data and manifest but
    NOT the current pointer — the snapshot exists for auditors
    (read_staged) yet is invisible to every normal reader, exactly the
    Iceberg WAP staging state.  Returns the staged version
    (current + 1).  Finish with publish_snapshot (pointer swap, O(1))
    or abandon_snapshot (delete data + manifest, table never changed).
    Single-writer: at most one stage in flight; a second stage_snapshot
    before publish/abandon raises."""
    parent = current_version(table_dir)
    version = 1 if parent is None else parent + 1
    # fast pre-flight (unlocked, advisory): fail before the expensive
    # data write if a stage is already in flight
    existing = _manifest_path(table_dir, version)
    if os.path.exists(existing):
        with open(existing) as f:
            if json.load(f).get("staged"):
                raise RuntimeError(
                    f"a staged snapshot v{version} already exists in "
                    f"{table_dir}; publish or abandon it first"
                )
        # no staged flag: a crashed plain commit's phantom manifest
        # (pointer was never published, so nothing it names was ever
        # visible).  Healed by the slot overwrite under the lock below —
        # the same rule commit_snapshot applies — instead of
        # dead-ending the operator (ADVICE r3: both remedies the old
        # error suggested refused a phantom).  Its data dirs become
        # unreferenced; expiry sweeps.
    os.makedirs(os.path.join(table_dir, _META), exist_ok=True)
    if op not in ("append", "overwrite"):
        raise ValueError(f"unknown snapshot op {op!r}")

    rel_dir = _write_data(table_dir, df, version)
    with _commit_lock(table_dir):
        cur = current_version(table_dir)
        if cur != parent:
            # a plain commit published during our data write; staging at
            # the stale slot would collide with the winner's successor
            raise SnapshotConflictError(
                f"stage against parent {parent} lost: current of "
                f"{table_dir} is now {cur}"
            )
        _check_slot_not_staged(table_dir, version)
        files = (
            list(_load_manifest(table_dir, parent)["files"])
            if op == "append" and parent is not None
            else []
        )
        files.append(rel_dir)
        manifest = {
            "version": version,
            "parent": parent,
            "op": op,
            "files": files,
            "tag": tag,
            "staged": True,
        }
        tmp = os.path.join(table_dir, _META, f".tmp-{_vname(version)}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, _manifest_path(table_dir, version))
        return version


def read_staged(
    spark: SparkSession, table_dir: str, version: int
) -> DataFrame:
    """Audit-side read of a STAGED (unpublished) snapshot — the one
    reader allowed past the current-pointer visibility rule."""
    path = _manifest_path(table_dir, version)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no staged snapshot v{version} in {table_dir}"
        )
    with open(path) as f:
        manifest = json.load(f)
    cur = current_version(table_dir)
    # the pointer decides publication: a still-flagged manifest at
    # version <= current is a publish that crashed before its cosmetic
    # flag clear — published, not auditable
    if not manifest.get("staged") or (cur is not None and version <= cur):
        raise ValueError(f"snapshot v{version} is published; use read_snapshot")
    return spark.read.parquet(
        *[os.path.join(table_dir, rel) for rel in manifest["files"]]
    )


def publish_snapshot(table_dir: str, version: int) -> None:
    """Write-audit-publish, step 3a: the audited staged snapshot goes
    live — pure O(1) metadata, no data moves.  Refuses non-contiguous
    versions (the stage must sit directly on current).

    Crash-retryable by ORDER (ADVICE r3): the current-pointer swap is
    the publish point and happens FIRST; the staged-flag clear is
    cosmetic cleanup AFTER it.  The pointer alone decides visibility
    everywhere (_load_manifest, snapshot_log, expiry), so a crash
    between the two steps leaves a fully-published snapshot whose
    manifest still says staged — a state every reader already treats
    as published and a publish RETRY completes idempotently by just
    clearing the flag.  Under the old flag-then-pointer order that
    crash window left an audit-passed snapshot that retry refused,
    reads refused, and expiry DELETED."""
    with _commit_lock(table_dir):
        cur = current_version(table_dir)
        expected = 1 if cur is None else cur + 1
        path = _manifest_path(table_dir, version)
        if not os.path.exists(path):
            if version != expected and version != cur:
                raise ValueError(
                    f"cannot publish v{version}: current is {cur}, expected "
                    f"v{expected} (stage sits directly on current)"
                )
            raise FileNotFoundError(f"no staged snapshot v{version}")
        with open(path) as f:
            manifest = json.load(f)
        if not manifest.get("staged"):
            # pointer-first order invariant: a staged=false manifest is
            # always <= current, i.e. fully published
            raise ValueError(f"snapshot v{version} is already published")
        if version == expected:
            # the publish point
            ptr_tmp = os.path.join(table_dir, _META, ".tmp-current")
            with open(ptr_tmp, "w") as f:
                json.dump({"version": version}, f)
            os.replace(ptr_tmp, os.path.join(table_dir, _META, "current"))
        elif version != cur:
            raise ValueError(
                f"cannot publish v{version}: current is {cur}, expected "
                f"v{expected} (stage sits directly on current)"
            )
        # else: version == cur — pointer already swapped by a publish that
        # crashed before reaching the flag clear below; finish that step
        manifest["staged"] = False
        tmp = os.path.join(table_dir, _META, f".tmp-{_vname(version)}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, path)


def abandon_snapshot(table_dir: str, version: int) -> None:
    """Write-audit-publish, step 3b: the audit failed — delete the
    staged manifest and its data dir; the table never changed.  Only
    the dir the stage itself wrote is deleted (an append stage's
    inherited parent dirs stay live)."""
    with _commit_lock(table_dir):
        path = _manifest_path(table_dir, version)
        if not os.path.exists(path):
            raise FileNotFoundError(f"no staged snapshot v{version}")
        with open(path) as f:
            manifest = json.load(f)
        cur = current_version(table_dir)
        if not manifest.get("staged") or (cur is not None and version <= cur):
            raise ValueError(
                f"snapshot v{version} is published; use expire_snapshots"
            )
        os.remove(path)
        # the stage's OWN dir is the last files entry (writer-unique
        # name); an append stage's inherited parent dirs stay live
        own_dir = os.path.join(table_dir, manifest["files"][-1])
    shutil.rmtree(own_dir, ignore_errors=True)


def compact_snapshots(spark: SparkSession, table_dir: str) -> int:
    """Collapse the current version's N-data-dir append chain into one
    dir, committed as a NEW overwrite snapshot (checkpoint.py's
    compact_output for the snapshot layer; Iceberg rewrite_data_files'
    coarse-grained analog where the rewrite unit is the commit dir).

    History is untouched: every prior version stays time-travelable
    until expire_snapshots reclaims it, and a crash mid-compaction is
    the ordinary commit crash (invisible, swept, retryable).  After
    compaction + expiry the table holds one data dir, so read planning
    and the manifest are O(1) until appends accumulate again.  No-op
    (returns the current version) when the chain is already one dir.

    Note the cost model: this rewrites the WHOLE live table (the unit
    is the data dir, not the file), so schedule it when the append
    chain's planning overhead outweighs one full rewrite — or prefer
    the finer-grained per-partition compact_output for the
    partitioned output table."""
    cur = current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"{table_dir} has no committed snapshot")
    if len(_load_manifest(table_dir, cur)["files"]) <= 1:
        return cur
    # safe self-read: the commit writes to a NEW data dir, never the
    # dirs this frame scans (same rule as the GDPR-delete rewrite)
    live = read_snapshot(spark, table_dir, cur)
    return commit_snapshot(
        spark, table_dir, live, op="overwrite", tag=f"compact-of-v{cur}"
    )


def snapshot_log(table_dir: str) -> list[dict]:
    """Retained COMMITTED manifests, oldest first — the table's
    lineage.  Manifests beyond the current pointer (a crashed commit
    died between manifest and pointer publish) are excluded, same rule
    as _load_manifest."""
    meta = os.path.join(table_dir, _META)
    if not os.path.isdir(meta):
        return []
    cur = current_version(table_dir)
    out = []
    for name in sorted(os.listdir(meta)):
        if name.startswith("v") and name.endswith(".json"):
            with open(os.path.join(meta, name)) as f:
                m = json.load(f)
            if cur is not None and m["version"] <= cur:
                # pointer-first publish: a manifest at <= current IS
                # published even if a crash left its staged flag set —
                # normalize so lineage consumers see the truth
                if m.get("staged"):
                    m["staged"] = False
                out.append(m)
    return out


def expire_snapshots(table_dir: str, keep_last: int = 2) -> dict:
    """Expire all but the newest keep_last snapshots and remove data
    dirs no retained manifest references (Iceberg expire_snapshots +
    remove_orphan_files in one pass).

    Correctness rule the append chain makes non-obvious: a data dir
    written by an EXPIRED version often remains live because a retained
    append manifest still lists it — referenced-ness is computed over
    the kept manifests' file lists, never over version numbers.  Orphan
    dirs from crashed commits are removed by the same sweep — both
    kinds: data written before the manifest (no manifest exists) and
    the rarer manifest-published-pointer-unpublished leftover, whose
    manifest (version > current, invisible to reads) and stale
    meta tmp files are deleted here too.  Single-writer assumption:
    don't run concurrently with a commit, whose data dir exists before
    its manifest does."""
    cur = current_version(table_dir)
    if cur is None:
        return {"expired_versions": [], "removed_data_dirs": []}
    keep_last = max(1, keep_last)
    cutoff = cur - keep_last + 1  # keep versions >= cutoff

    meta_dir = os.path.join(table_dir, _META)
    staged_refs: set = set()
    # the metadata portion holds the commit lock so the sweep can never
    # interleave with a racer's tmp-write/manifest-rename; the DATA
    # sweep below stays outside it (see single-writer note above — a
    # commit's data dir exists before its manifest, which no metadata
    # lock can make atomic)
    with _commit_lock(table_dir):
        for name in list(os.listdir(meta_dir)):
            if name.startswith(".tmp-"):
                os.remove(os.path.join(meta_dir, name))
            elif name.startswith("v") and name.endswith(".json"):
                if int(name[1:-5]) > cur:
                    with open(os.path.join(meta_dir, name)) as f:
                        m = json.load(f)
                    if m.get("staged"):
                        # in-flight write-audit-publish stage: exempt
                        # from the sweep (abandon_snapshot is its
                        # cleanup path), and its data dirs count as
                        # referenced below
                        staged_refs.update(m["files"])
                    else:
                        # uncommitted leftover: manifest published,
                        # pointer never was (crashed commit)
                        os.remove(os.path.join(meta_dir, name))

        pinned = set(refs(table_dir).values())
        expired = []
        for m in snapshot_log(table_dir):
            # a named ref pins its snapshot against expiry (Iceberg tag
            # retention rule) — drop the ref first to let it age out
            if m["version"] < cutoff and m["version"] not in pinned:
                os.remove(_manifest_path(table_dir, m["version"]))
                expired.append(m["version"])

        referenced = set(staged_refs)
        for m in snapshot_log(table_dir):
            referenced.update(m["files"])
    removed = []
    data_root = os.path.join(table_dir, _DATA)
    if os.path.isdir(data_root):
        for name in sorted(os.listdir(data_root)):
            rel = f"{_DATA}/{name}"
            if rel not in referenced:
                shutil.rmtree(os.path.join(data_root, name))
                removed.append(rel)
    return {"expired_versions": expired, "removed_data_dirs": removed}
