"""Tuned SparkSession builder (local mode here; cluster-safe confs).

Reads SPARK_GRAFT_CPUS (default 32) so the same code runs the N-vs-4N
scaling evidence (local[2] vs local[8]) required by BASELINE.json.

Two execution modes (SPARK_GRAFT_EXEC_MODE or the exec_mode param):

* ``threads`` (default) — ``local[N]``: N task threads in one JVM.
* ``processes`` — ``local-cluster[N,1,M]``: N SEPARATE single-core
  executor JVMs, each with its own python workers, heap, and a real
  netty shuffle between processes.  This is the honest stand-in for
  "N executors vs 4N executors" in the north rule's scaling criterion:
  executors are isolated OS processes exactly as on a real cluster,
  only co-scheduled on one box.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str,
    cpus: int | None = None,
    exec_mode: str | None = None,
) -> SparkSession:
    """Job-entry session bootstrap (shared by jobs/*.py): under
    spark-submit the master/conf come from the CLI, so defer to the
    plain builder; standalone, fall back to the tuned local builder.
    One copy — a fix to the submit-detection rule must reach every
    job (code-review reuse finding)."""
    if os.environ.get("SPARK_SUBMIT_RUNNING") or "spark.master" in os.environ:
        return SparkSession.builder.getOrCreate()
    return get_spark(app_name, cpus=cpus, exec_mode=exec_mode)


def get_spark(
    app_name: str = "ocr_gang_spark",
    cpus: int | None = None,
    exec_mode: str | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    exec_mode = exec_mode or os.environ.get("SPARK_GRAFT_EXEC_MODE", "threads")
    if exec_mode not in ("threads", "processes"):
        raise ValueError(f"exec_mode must be 'threads' or 'processes', got {exec_mode!r}")
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    # multi-MB Arrow record batches of blob columns allocate as G1
    # "humongous" objects at the default region size, and with many
    # concurrent pandas-UDF tasks that thrashes the collector (measured:
    # JVM GC 107.6 core-s at local[16] vs 1.0 at local[4] on the same job)
    g1_opt = "-XX:G1HeapRegionSize=32m"
    if exec_mode == "processes":
        exec_mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "3072"))
        master = f"local-cluster[{cpus},1,{exec_mem_mb}]"
    else:
        master = f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound pandas-UDF batch memory: pages decode to ~(HxWx3) uint8
        # inside the OCR kernel; 512 blobs/batch keeps a batch < ~100MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.extraJavaOptions", g1_opt)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # diagnostics hook: SPARK_GRAFT_EVENTLOG_DIR=/some/dir turns on the
    # event log so per-stage task/GC/fetch-wait time can be attributed
    # offline (scripts/stage_times.py) without changing any run script
    event_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if event_dir:
        os.makedirs(event_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.dir", f"file://{event_dir}")
        )
    if exec_mode == "processes":
        # ActiveProcessorCount: each single-core executor JVM otherwise
        # sizes its GC/JIT/netty thread pools for the HOST's core count —
        # 8 co-scheduled executors then run 8x32-core-sized JVM
        # housekeeping and oversubscribe the box (measured: in-run steal
        # probe 1.0-1.8s mean from a quiet 0.27s gate, throughput 2.4x
        # below threads mode).  On a real cluster the resource manager
        # sets this via cgroups; here it is explicit.
        builder = (
            builder.config("spark.executor.memory", f"{exec_mem_mb}m")
            .config(
                "spark.executor.extraJavaOptions",
                f"{g1_opt} -XX:ActiveProcessorCount=2",
            )
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if exec_mode == "processes":
        # separate executor JVMs spawn python workers that do NOT inherit
        # the driver's sys.path, so ship the package exactly as
        # spark-submit --py-files would (scripts/submit.sh builds the
        # same artifact)
        spark.sparkContext.addPyFile(_package_zip())
    return spark


def _package_zip() -> str:
    """Zip the ocr_gang_spark package for addPyFile/--py-files shipping."""
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    fd, path = tempfile.mkstemp(prefix="ocr_gang_spark_pyfiles_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return path
