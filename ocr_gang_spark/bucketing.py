"""Bucketed tables: shuffle-elimination for repeated joins on a key.

At 100 TB the media table is the heavyweight side of every extraction
join.  The pipeline's per-run treatment (explode + media_ref-hash
shuffle, pipeline.py) moves each blob across the network once per run;
when the SAME corpus is joined repeatedly (re-extraction after a model
update, A/B kernel comparisons, backfills), writing it ONCE as a
bucketed table moves each blob across the network once per CORPUS
LIFETIME instead: `bucketBy(n, media_ref)` persists the hash
partitioning into the files + catalog, so every later join reads the
buckets in place and shuffles only the (small) probe side.  Pinned by
tests/test_plans.py::test_bucketed_media_join_shuffles_only_probe_side
— exactly one Exchange in the join plan, and it is not on the bucketed
side.

Spark-native feature (saveAsTable + bucketBy); works with the
in-memory catalog locally and a Hive/Iceberg-backed catalog on a real
cluster (Iceberg's bucket partition transform is the same idea — see
checkpoint.py's Iceberg note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a parquet table bucketed (and per-file sorted)
    by ``key``.  ``n_buckets`` is the lifetime parallelism floor of the
    join — size it like shuffle partitions at full scale (e.g. 2-4x
    executor count), not at test scale."""
    w = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table; the bucket spec rides along from the
    catalog, so joins/aggregations on the bucket key skip their
    Exchange."""
    return spark.table(table)
