"""Tuned SparkSession builder (local mode here; cluster-safe confs).

Reads SPARK_GRAFT_CPUS (default 32) so the same code runs the N-vs-4N
scaling evidence (local[2] vs local[8]) required by BASELINE.json.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ocr_gang_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
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
        # 32MB G1 regions: multi-MB Arrow record batches of blob columns
        # otherwise allocate as G1 "humongous" objects, and with many
        # concurrent pandas-UDF tasks that thrashes the collector
        # (measured: JVM GC 107.6 core-s at local[16] vs 1.0 at local[4]
        # on the same job)
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
