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
