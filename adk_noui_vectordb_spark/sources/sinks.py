"""Sinks: keyed upsert over Parquet + job-report JSON.

The reference upserts (insert-or-replace by id) into ChromaDB collections
(reference: coding_agent/tools/indexing_agent.py:332-373) and dumps a JSON
job report (indexing_manager.py:79-83). Without Delta in the container, the
upsert is the classic parquet MERGE emulation: union(new, existing) ->
keep-one-per-key with new rows winning -> atomic directory swap via
overwrite. At scale this becomes a real Delta/Iceberg ``MERGE INTO`` keyed
on id (the plan shape — anti-join + union — is what MERGE executes anyway).

This also fixes the reference's stale-row leak (SURVEY.md §2.10): a changed
element REPLACES its old row because precedence is by key, not by
content-hash id.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _recover_interrupted_swap(path: str) -> None:
    """Heal BOTH directory-swap crash windows.

    The swap is two renames plus a cleanup (path -> .__old__, then
    .__tmp__/.__compact__ -> path, then rmtree .__old__); POSIX has no
    atomic directory exchange, so every writer/reader entry point calls
    this first. Two distinct crash windows:

    - between the renames: no table at ``path``, intact copy at
      ``.__old__`` — restore it (the interrupted write is simply lost,
      which upsert semantics allow — the caller re-runs it);
    - after the second rename but before the rmtree: the swap COMPLETED
      (``path`` is the new table) but a stale ``.__old__`` remains —
      remove it, otherwise the next swap's ``os.rename(path, old)``
      hits an existing non-empty directory and every subsequent
      upsert/compaction fails with ENOTEMPTY.
    """
    import shutil

    old = path + ".__old__"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def _swap_into_place(tmp: str, path: str) -> None:
    old = path + ".__old__"
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        import shutil

        shutil.rmtree(old)


def upsert_parquet(
    spark: SparkSession, new_rows: DataFrame, path: str, key: str
) -> None:
    """Insert-or-replace by ``key`` into the parquet table at ``path``.

    New rows win over existing rows with the same key; duplicate keys
    WITHIN the new batch are resolved deterministically by a full-row
    digest tie-break (lowest digest wins), so repeated runs pick the same
    survivor regardless of partitioning order.
    """
    _recover_interrupted_swap(path)
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in new_rows.columns])))
    tagged_new = new_rows.withColumn("_prec", F.lit(0)).withColumn(
        "_tie", digest
    )
    if os.path.exists(path):
        existing = (
            spark.read.parquet(path)
            .withColumn("_prec", F.lit(1))
            .withColumn("_tie", F.lit(""))
        )
        merged = tagged_new.unionByName(existing)
    else:
        merged = tagged_new
    w = Window.partitionBy(key).orderBy(F.asc("_prec"), F.asc("_tie"))
    result = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_prec", "_tie", "_rn")
    )
    # Materialize before overwrite (reading and overwriting the same path in
    # one job is not safe); then swap via the recoverable two-rename dance.
    tmp = path + ".__tmp__"
    result.write.mode("overwrite").parquet(tmp)
    _swap_into_place(tmp, path)


def write_json_report(df: DataFrame, path: str) -> None:
    """Persist a small job-stats DataFrame as JSON (indexing_manager.py:79-83)."""
    df.coalesce(1).write.mode("overwrite").json(path)


def write_bucketed(
    df, name: str, path: str, key: str, buckets: int = 8
) -> None:
    """Persist a table bucketed (and sorted) by its join key.

    Two tables bucketed by the same key with the same bucket count join
    WITHOUT any exchange — the shuffle happened once at write time and is
    amortized over every later join/aggregation on that key. This is the
    co-located fact-fact join strategy for keys too big to broadcast
    (verified by plan assertion in tests/test_plans.py).
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(name)
    )


def compact_parquet(
    spark: SparkSession, path: str, target_bytes_per_file: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files. Returns the new file count.

    The 100 TB operational chore: streaming/incremental upserts accumulate
    small files; scans then pay per-file open cost and lose row-group
    pruning. Rewrite via coalesce (no shuffle) into ~128 MB files, atomic
    directory swap like upsert_parquet.
    """
    import math

    _recover_interrupted_swap(path)
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, math.ceil(total / target_bytes_per_file))
    df = spark.read.parquet(path)
    tmp = path + ".__compact__"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    _swap_into_place(tmp, path)
    return n_files


def write_partitioned(df, path: str, partition_col: str) -> None:
    """Persist a table hive-partitioned by a column (one directory per
    value). Queries filtering on the partition column read ONLY the
    matching directories — partition pruning happens at planning time,
    before any IO (verified by plan assertion in tests/test_plans.py).
    The 100 TB default layout for time-series: partition by date, bucket
    or sort within partitions by the hot join key.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
