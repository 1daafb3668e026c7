"""Partition-level resumable extraction runs with lineage + metrics.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics".  The reference has no counterpart (single-image CLI); this is
a batch-resumability design (SURVEY.md §2.7: Structured Streaming not
required):

* every document deterministically belongs to a partition
  ``part_id = pmod(xxhash64(doc_id), n_parts)`` — a pure function, so
  resume needs NO join against the output, only an anti-join of the
  *input* against the tiny checkpoint table;
* output is written partitionBy(part_id) with dynamic partition
  overwrite => re-running a part is idempotent (exactly-once per part);
* after the write, per-part metrics (docs, spans, chars) are aggregated
  from the *written* files (cheap columnar count, also validates the
  write) and appended to the checkpoint table with run_id lineage.

A killed run leaves some parts absent from the checkpoint table; the
next invocation processes exactly those.  Iceberg note: on a real
cluster the output/checkpoint tables would be Iceberg
(``writeTo(...).overwritePartitions()`` gives the same idempotency with
snapshot isolation); this sandbox has no Iceberg jars, so the parquet
dynamic-overwrite path is the tested implementation and the API keeps
the table abstraction.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import broadcast_weights, extract_documents

CHECKPOINT_SCHEMA = (
    "part_id int, n_parts int, n_docs long, n_spans_out long, n_chars_out long, "
    "wall_ms long, status string, run_id string"
)


def with_part_id(df: DataFrame, n_parts: int) -> DataFrame:
    return df.withColumn("part_id", F.pmod(F.xxhash64("doc_id"), F.lit(n_parts)).cast("int"))


def completed_parts(spark: SparkSession, checkpoint_dir: str, n_parts: int) -> DataFrame:
    """Distinct part_ids already marked done *under the same n_parts
    partitioning* (empty DF if no checkpoint).  part_id is only
    meaningful relative to n_parts, so entries written with a different
    configuration are ignored rather than silently short-circuiting a
    run with genuine remaining work (ADVICE r1).  Defense-in-depth: via
    run_extraction an n_parts change is refused outright by the run
    manifest before this filter ever applies (r3)."""
    try:
        cp = spark.read.parquet(checkpoint_dir)
        return (
            cp.where((F.col("status") == "done") & (F.col("n_parts") == n_parts))
            .select("part_id")
            .distinct()
        )
    except Exception:
        return spark.createDataFrame([], "part_id int")


# Underscore-prefixed so Spark's parquet reader ignores it inside
# checkpoint_dir.  On a real cluster this lives behind the Hadoop FS API
# (or as Iceberg table properties); local-FS json is the sandbox stand-in.
MANIFEST_NAME = "_run_manifest.json"


def _check_run_manifest(
    checkpoint_dir: str, opts: dict, defaults: dict | None = None
) -> None:
    """Pin output-affecting options across resumes (ADVICE r2): the first
    run records them next to the done-part ledger; a resume with a
    different value would silently mix e.g. deskewed and non-deskewed
    parts in one output directory, so refuse instead.

    ``defaults`` maps keys ADDED to the manifest after older runs were
    created to the value those runs implicitly had (a flag that did not
    exist behaved as its default; a versioned rule was at its previous
    version).  A key absent from an old manifest compares against that
    implied value — so resuming a pre-flag checkpoint with default
    options proceeds, while resuming across a behavior change still
    refuses (code-review fix: the bare prev.get(k) made EVERY old
    checkpoint refuse, even when the resumed run was byte-identical)."""
    defaults = defaults or {}
    path = os.path.join(checkpoint_dir, MANIFEST_NAME)
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        diff = {
            k: (prev.get(k, defaults.get(k)), v)
            for k, v in opts.items()
            if prev.get(k, defaults.get(k)) != v
        }
        if diff:
            raise ValueError(
                f"refusing to resume: run manifest {path} pins "
                + ", ".join(f"{k}={old!r} but this run passes {new!r}" for k, (old, new) in diff.items())
                + "; clear the checkpoint and output directories to rerun with new options"
            )
        return
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(opts, f, sort_keys=True)
    os.replace(tmp, path)


@dataclass
class RunResult:
    run_id: str
    n_parts_processed: int
    n_docs: int
    wall_ms: int


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    media: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    n_parts: int = 64,
    run_id: str | None = None,
    weights_bc=None,
    deskew: bool = False,
    on_error: str = "fail",
    with_margins: bool = False,
    degrade_slice: bool = False,
) -> RunResult:
    """One (possibly resuming) extraction run.

    Documents whose part_id is already checkpointed as done are skipped
    via a broadcast anti-join (the checkpoint table is tiny); remaining
    parts are extracted, written idempotently, measured, and marked done.
    """
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    # n_parts is output-affecting too: the ledger ignores done entries
    # from a different n_parts (full reprocess), but dynamic partition
    # overwrite only replaces the NEW part_id dirs — stale dirs from the
    # old partitioning would silently duplicate documents in the output;
    # on_error changes what rows corrupt blobs produce; margin/degrade
    # flags change the output schema and the OCR input respectively
    _check_run_manifest(
        checkpoint_dir,
        {"deskew": bool(deskew), "n_parts": int(n_parts),
         "on_error": str(on_error), "with_margins": bool(with_margins),
         "degrade_slice": bool(degrade_slice)},
        # keys added after the first manifests shipped: a checkpoint
        # from before a flag existed behaved as that flag's default
        defaults={"on_error": "fail", "with_margins": False,
                  "degrade_slice": False},
    )
    weights_bc = weights_bc or broadcast_weights(spark)
    t0 = time.time()

    docs_p = with_part_id(docs, n_parts)
    done = completed_parts(spark, checkpoint_dir, n_parts)
    remaining = docs_p.join(F.broadcast(done), "part_id", "left_anti")

    # No pre-scan of the input to enumerate work (the old
    # remaining.distinct().collect() was a full input scan + shuffle —
    # pure fixed cost on every run): the anti-join alone decides what is
    # processed, and the parts completed THIS run are read back off the
    # written output below.  Only a resume pays the cheap done/empty
    # probes; a fresh run goes straight to the extraction job.
    done_ids = {r.part_id for r in done.collect()}
    if len(done_ids) >= n_parts or (done_ids and remaining.isEmpty()):
        return RunResult(run_id, 0, 0, int((time.time() - t0) * 1000))

    extracted = extract_documents(
        remaining.drop("part_id"), media, weights_bc, deskew=deskew,
        on_error=on_error, with_margins=with_margins,
        degrade_slice=degrade_slice,
    )
    # per-doc span stats become plain columns so the lineage pass can
    # read 3 small columns instead of re-exploding the spans arrays
    out = with_part_id(extracted, n_parts).select(
        "*",
        F.size("spans").alias("n_spans"),
        F.aggregate(
            F.transform("spans", lambda s: F.coalesce(F.length(s.text), F.lit(0))),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_chars"),
    )

    # co-locate each part before the partitioned write: otherwise every
    # write task emits a file into every part_id dir (tasks x parts small
    # files — a real cost on object stores and this box alike).
    # partitionOverwriteMode rides the WRITER as an option (scoped to
    # this write), never spark.conf.set — a session-level set leaked
    # dynamic semantics into unrelated overwrite writes after the job
    # returned (round-4 review)
    out.repartition("part_id").write.mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).partitionBy("part_id").parquet(output_dir)

    # lineage metrics from the *written* files (validates the write too);
    # column pruning means this scans only (part_id, n_spans, n_chars);
    # the filter against the old checkpoint keeps the parts completed by
    # THIS run.  Assumption (documented, ADVICE r1): inputs are immutable
    # across resumes — an orphan part_id left in output_dir by a crashed
    # run whose docs no longer appear in the input would be attributed to
    # this run's lineage; with immutable inputs that part is exactly the
    # data this run would have produced, so attribution stays truthful.
    try:
        written = spark.read.parquet(output_dir)
    except Exception:  # empty input, nothing written -> no output dir/schema
        return RunResult(run_id, 0, 0, int((time.time() - t0) * 1000))
    if done_ids:
        written = written.where(~F.col("part_id").isin(list(done_ids)))
    wall_ms = int((time.time() - t0) * 1000)
    metrics_rows = (
        written.groupBy("part_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_spans").alias("n_spans_out"),
            F.sum("n_chars").alias("n_chars_out"),
        )
        .withColumn("n_parts", F.lit(n_parts))
        .withColumn("wall_ms", F.lit(wall_ms))
        .withColumn("status", F.lit("done"))
        .withColumn("run_id", F.lit(run_id))
        .select(
            "part_id", "n_parts", "n_docs", "n_spans_out", "n_chars_out",
            "wall_ms", "status", "run_id",
        )
    ).collect()
    spark.createDataFrame(metrics_rows, CHECKPOINT_SCHEMA).write.mode("append").parquet(
        checkpoint_dir
    )

    n_docs = sum(r.n_docs for r in metrics_rows)
    return RunResult(run_id, len(metrics_rows), n_docs, wall_ms)


@dataclass
class CompactResult:
    run_id: str
    n_parts_compacted: int
    files_before: int
    files_after: int
    n_rows: int


COMPACTION_LOG = "_compactions.json"


def _part_file_stats(output_dir: str) -> dict[int, tuple[int, int]]:
    """{part_id: (n_files, total_bytes)} from the directory listing —
    metadata only, no data scan.  On a real cluster this is the Iceberg
    manifest read (data_files per partition); local-FS walk is the
    sandbox stand-in, same as the run manifest."""
    stats: dict[int, tuple[int, int]] = {}
    if not os.path.isdir(output_dir):
        return stats
    for name in os.listdir(output_dir):
        if not name.startswith("part_id="):
            continue
        pid = int(name.split("=", 1)[1])
        n, b = 0, 0
        for f in os.listdir(os.path.join(output_dir, name)):
            if f.endswith(".parquet"):
                n += 1
                b += os.path.getsize(os.path.join(output_dir, name, f))
        if n:
            stats[pid] = (n, b)
    return stats


def compact_output(
    spark: SparkSession,
    output_dir: str,
    target_bytes: int = 128 << 20,
    run_id: str | None = None,
) -> CompactResult:
    """Small-file maintenance over a part_id-partitioned output table —
    the Iceberg OPTIMIZE/rewrite_data_files analog.  Resumed runs,
    streaming micro-batches and high write parallelism all strand many
    small files per partition; at 10^12 documents the scan-planning and
    object-store-request cost of those files dominates reads, so
    compaction is a first-class maintenance operator, not a nicety.

    Mechanics: pick every partition holding more files than its
    target file count ceil(total_bytes / target_bytes) — a 300x1MB
    partition compacts to 3 files at the 128MB default, a 4x10MB one
    to a single file (the old rule skipped any partition whose total
    exceeded target_bytes, which excluded exactly the resume-heavy
    fragmented partitions the operator exists for, at every possible
    target; round-4 review).  Read exactly those partitions
    (partition-pruned scan), rewrite via one hash repartition on
    (part_id, _ck) where _ck buckets doc_id into the partition's
    target file count (<= that many output files per partition, one
    for small ones), and swap with dynamic partition overwrite — the
    same idempotent commit run_extraction uses, so untouched
    partitions are never rewritten.  Rows are
    validated pre/post (count per partition must match; loud failure
    otherwise) and every compaction appends a JSON lineage entry
    (run_id, parts, files before/after, rows) to _compactions.json
    next to the data.  Iceberg note: on a real cluster the swap is a
    snapshot commit (atomic, time-travelable); the parquet
    dynamic-overwrite stand-in has a crash window between partition
    replacements, which a re-run heals idempotently."""
    run_id = run_id or f"compact-{int(time.time() * 1000)}"
    stats = _part_file_stats(output_dir)
    n_target = {
        pid: max(1, -(-b // target_bytes)) for pid, (n, b) in stats.items()
    }
    todo = {
        pid: (n, b)
        for pid, (n, b) in stats.items()
        if n > n_target[pid]
    }
    if not todo:
        return CompactResult(run_id, 0, 0, 0, 0)

    pids = sorted(todo)
    src = spark.read.parquet(output_dir).where(F.col("part_id").isin(pids))
    # _ck buckets each oversized partition's rows into its target file
    # count, via a broadcast join against the tiny (part_id, n_target)
    # table.  The first version built this as a nested CASE WHEN chain
    # (one F.when per fragmented partition), whose expression tree —
    # and therefore codegen — grew linearly in partition count and
    # would hit Catalyst codegen limits with thousands of fragmented
    # partitions (ADVICE r4); the broadcast join keeps the plan size
    # constant no matter how many partitions compact.
    tgt = spark.createDataFrame(
        [(pid, int(n_target[pid])) for pid in pids],
        "part_id int, _ck_n int",
    )
    src = (
        src.join(F.broadcast(tgt), "part_id")
        .withColumn("_ck", F.pmod(F.xxhash64("doc_id"), F.col("_ck_n")))
        .drop("_ck_n")
    )
    # Spark (correctly) refuses to overwrite a path it is reading from;
    # localCheckpoint materializes the pruned partitions to executor
    # storage (memory-and-disk) and detaches the plan from the source
    # files.  Storage bound = sum of the fragmented partitions' bytes;
    # for a huge backlog, compact a subset of partitions per call by
    # pre-splitting the table, or run on a session with executor disk
    # to spare.  (Iceberg commits read+replace as one snapshot, no
    # materialization needed — see module docstring.)
    src = src.localCheckpoint(eager=True)
    n_before = src.count()

    src.repartition("part_id", "_ck").drop("_ck").write.mode(
        "overwrite"
    ).option("partitionOverwriteMode", "dynamic").partitionBy(
        "part_id"
    ).parquet(output_dir)

    after = _part_file_stats(output_dir)
    n_after = (
        spark.read.parquet(output_dir)
        .where(F.col("part_id").isin(pids))
        .count()
    )
    if n_after != n_before:
        raise RuntimeError(
            f"compaction row-count mismatch on parts {pids}: "
            f"{n_before} before vs {n_after} after"
        )

    files_before = sum(n for n, _ in todo.values())
    files_after = sum(after.get(pid, (0, 0))[0] for pid in pids)
    entry = {
        "run_id": run_id,
        "ts": int(time.time() * 1000),
        "parts": pids,
        "files_before": files_before,
        "files_after": files_after,
        "n_rows": n_before,
        "target_bytes": target_bytes,
    }
    log_path = os.path.join(output_dir, COMPACTION_LOG)
    log = []
    if os.path.exists(log_path):
        with open(log_path) as f:
            log = json.load(f)
    log.append(entry)
    tmp = log_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f, sort_keys=True)
    os.replace(tmp, log_path)
    return CompactResult(run_id, len(pids), files_before, files_after, n_before)


def clean_orphans(output_dir: str, n_parts: int) -> dict:
    """Orphan cleanup for the output table — the Iceberg
    remove_orphan_files analog, closing the two documented local-FS
    hazards a snapshot store would prevent:

    * **stale partition dirs from an older n_parts** — dynamic
      overwrite only replaces the new partitioning's dirs, so a
      part_id >= n_parts dir left by a previous configuration would
      silently DUPLICATE documents on read (run_extraction's manifest
      refuses the resume, but a cleared-manifest rerun could still
      read the stale dirs);
    * **write-protocol leftovers** (_temporary staging trees from a
      crashed commit).

    Deliberately NOT removed: in-range partition dirs (live data),
    the compaction log and run manifest.  Returns
    {removed_part_dirs, removed_staging} counts; pure local-FS
    metadata work, no Spark job."""
    import shutil

    removed_parts, removed_staging = [], 0
    if not os.path.isdir(output_dir):
        return {"removed_part_dirs": [], "removed_staging": 0}
    for name in list(os.listdir(output_dir)):
        path = os.path.join(output_dir, name)
        if name.startswith("part_id="):
            pid = int(name.split("=", 1)[1])
            if not (0 <= pid < n_parts):
                shutil.rmtree(path)
                removed_parts.append(pid)
        elif name.startswith("_temporary") or name.startswith(".spark-staging"):
            shutil.rmtree(path, ignore_errors=True)
            removed_staging += 1
    return {
        "removed_part_dirs": sorted(removed_parts),
        "removed_staging": removed_staging,
    }


def load_output(spark: SparkSession, output_dir: str) -> DataFrame:
    return spark.read.parquet(output_dir)


def checkpoint_table(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    if not os.path.exists(checkpoint_dir):
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
    try:
        return spark.read.parquet(checkpoint_dir)
    except AnalysisException:
        # dir exists but holds only the underscore-prefixed run
        # manifest (a first run crashed between manifest write and the
        # first metrics append): same empty-progress answer
        # completed_parts already gives for this state, instead of
        # 'Unable to infer schema' (round-4 review)
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)
