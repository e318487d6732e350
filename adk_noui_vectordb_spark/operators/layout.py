"""Data-layout operators — multi-dimensional clustering for scan pruning.

At 100 TB, which rows share a parquet row group decides how much IO a
filter can skip: min/max statistics prune a row group only when the
filtered column's values are locally clustered. A single-dimension sort
gives perfect pruning on that dimension and none on any other; Z-ORDER
(bit-interleaved) clustering spreads locality across dimensions so BOTH
`user_id = ?` point filters and `ts BETWEEN ...` range filters skip most
row groups — the layout strategy behind Delta/Iceberg `ZORDER BY` /
`sort_order(z)`, implemented here as a pure-Catalyst expression (the
reference has no storage layer at all; north-star surface).

``zorder_events`` is the oracle-checked kernel (the interleave is exact
integer arithmetic, reproducible in any engine); ``write_zorder_layout``
materializes the sorted layout; the row-group statistics improvement is
pinned by tests/test_layout.py reading back the parquet footers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

Z_BITS = 16  # bits per dimension -> 32-bit z-values


def _bucket16(c: Column) -> Column:
    """Clamp a non-negative bigint into 16 bits (mod keeps the arithmetic
    exact and engine-agnostic; real deployments range-rank first)."""
    return c % F.lit(1 << Z_BITS)


def z_interleave(x: Column, y: Column) -> Column:
    """32-bit Morton code: bit b of ``x`` lands at position 2b, bit b of
    ``y`` at 2b+1. Pure shift/mask integer arithmetic with LITERAL shift
    amounts — whole-stage codegen, bigint-exact, and identical in DuckDB
    (``(x // 2^b) % 2 * 2^(2b)`` terms)."""
    z = F.lit(0).cast("bigint")
    for b in range(Z_BITS):
        z = z + F.shiftleft(F.shiftright(x, b) % 2, 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b) % 2, 2 * b + 1)
    return z


def zorder_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, ux, tx, zval) for every event: the Morton code over
    (user_id, event minute). ``tx`` is the epoch minute of the µs-
    truncated ``ts_ns`` (the loader's cross-engine time contract), so
    both engines derive identical buckets."""
    e = load_table(spark, sf_dir, "events")
    ux = _bucket16(F.col("user_id").cast("bigint"))
    tx = _bucket16(
        F.expr("ts_ns div 1000000000 div 60").cast("bigint")
    )
    return e.select(
        "event_id",
        ux.alias("ux"),
        tx.alias("tx"),
        z_interleave(ux, tx).alias("zval"),
    )


def write_zorder_layout(
    spark: SparkSession, sf_dir: str, path: str, rows_per_group: int = 2000
) -> None:
    """Materialize events in Z-order: compute zval, range-partition and
    sort by it, write with bounded row groups so footer min/max stats are
    the pruning granularity. ``sortWithinPartitions`` after
    ``repartitionByRange`` gives a TOTAL z-order across files without a
    single-partition bottleneck — the same two-step a Delta OPTIMIZE
    ZORDER executes."""
    e = load_table(spark, sf_dir, "events")
    z = zorder_events(spark, sf_dir).select("event_id", "zval")
    (
        e.join(z, "event_id")
        .repartitionByRange(4, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .option("parquet.block.size", 64 * 1024)
        .option("maxRecordsPerFile", str(rows_per_group))
        .parquet(path)
    )


N_TRAINING_SHARDS = 8


def shard_expr(doc_id: Column, n_shards: int = N_TRAINING_SHARDS) -> Column:
    """Deterministic training-shard assignment: md5 of the salted doc
    key (the ':shard' salt decorrelates it from every other md5 bucket
    family in the engine — dbucket/vbucket/mbucket — so shard and
    index-bucket skew can't align). Uniform by construction, so shards
    balance to within sampling noise at any corpus size."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(doc_id.cast("string"), F.lit(":shard"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")


def shard_manifest_counts(
    spark: SparkSession, sf_dir: str, n_shards: int = N_TRAINING_SHARDS
) -> DataFrame:
    """Per-shard manifest rows (shard, doc_count, total_chars) for the
    training export — the assignment is pure column arithmetic, so the
    manifest is ONE map-side-combined aggregate over the corpus."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            shard_expr(F.col("doc_id"), n_shards).alias("shard"), "n_chars"
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("shard")
    )


def export_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_shards: int = N_TRAINING_SHARDS,
    max_records_per_file: int = 0,
) -> dict:
    """Materialize the corpus as N balanced training shards — the hand-
    off from curation to the training loader: ``out_dir/data/shard=K/``
    parquet per shard plus a ``manifest.json`` recording per-shard row
    counts, byte sizes, and the assignment contract (written LAST via
    tmp+rename — its presence marks a complete export, the poor
    engine's _SUCCESS with content).

    Scale shape: one deterministic hash projection + one shuffle
    (``repartition(n_shards, shard)`` co-locates each shard's rows so
    every shard directory is written by its own tasks — no small-file
    spray), ``maxRecordsPerFile`` bounds file sizes for loader
    parallelism. Balance is md5-uniform; the manifest records the
    realized counts so a training job can weight or verify.
    """
    import json
    import os

    d = load_table(spark, sf_dir, "documents").withColumn(
        "shard", shard_expr(F.col("doc_id"), n_shards)
    )
    data_dir = os.path.join(out_dir, "data")
    w = (
        d.repartition(n_shards, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(data_dir)

    counts = {
        int(r["shard"]): (int(r["doc_count"]), int(r["total_chars"]))
        for r in shard_manifest_counts(spark, sf_dir, n_shards).collect()
    }
    shards = []
    for k in range(n_shards):
        sd = os.path.join(data_dir, f"shard={k}")
        files = (
            sorted(f for f in os.listdir(sd) if f.endswith(".parquet"))
            if os.path.isdir(sd)
            else []
        )
        n, chars = counts.get(k, (0, 0))
        shards.append(
            {
                "shard": k,
                "rows": n,
                "total_chars": chars,
                "files": len(files),
                "bytes": sum(os.path.getsize(os.path.join(sd, f)) for f in files),
            }
        )
    manifest = {
        "n_shards": n_shards,
        "assignment": "conv(substr(md5(doc_id || ':shard'),1,8),16,10) % n",
        "total_rows": sum(s["rows"] for s in shards),
        "shards": shards,
    }
    tmp = os.path.join(out_dir, ".manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest
