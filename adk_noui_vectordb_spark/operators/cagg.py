"""Continuous aggregate: an incrementally-maintained events rollup.

The TimescaleDB continuous-aggregate / materialized-rollup primitive,
Spark-first (reference parity: the reference keeps no aggregates at
all — its ChromaDB collection is rebuilt per-file on upsert,
indexing_agent.py:332-361; at 100 TB a dashboard query cannot re-scan
the event log, so the engine needs the maintained-rollup shape the
same way it needs maintained indexes).

Layout (one versioned root, the sources/versioning.py lifecycle):

    v_NNNNNN/agg/day=<yyyy-MM-dd>/   (event_type, user_id, n_events,
                                      sum_value_micro)

The stored grain is (day, event_type, user_id) — fine enough that
every coarser rollup (daily totals, per-type counts, distinct users)
is an EXACT aggregation of the stored rows, never a re-scan of the
event log. ``sum_value_micro`` is the house exact-integer discipline:
``floor(value * 1e6 + 0.5)`` per event, summed as BIGINT — associative
under any partitioning and bit-equal cross-engine (SCALE.md float-sum
tie class).

Incremental maintenance is O(batch + affected day partitions), never
O(history): a batch's delta rollup merges (sum-of-sums) into exactly
the day partitions it touches — events arrive time-ordered-ish, so
that is typically today's partition while years of history hardlink —
through the shared CAS commit kernel (writer lock, auto-compaction).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

ROLLUP_SCHEMA = (
    "event_type string, user_id bigint, n_events bigint,"
    " sum_value_micro bigint, day string"
)
# applied-batch digests ride IN the version (ADVICE r11): rollup counts
# are ADDITIVE, so idempotence markers must commit atomically WITH the
# data they guard — a sidecar marker file leaves a crash window where a
# replayed batch double-counts, and version-scoped markers get swept by
# gc so a multi-batch checkpoint reset re-applies older batches. One
# tiny row per ever-applied batch, carried forward by every commit
# (O(n_batches) rows in one small file — negligible against the agg).
APPLIED_SCHEMA = "s1 bigint, s2 bigint, n bigint"
ROLLUP_COMPONENTS = [("agg", ["day"]), ("applied", [])]


def events_rollup_root(sf_dir: str) -> str:
    from ..memo import index_root

    return index_root("events_rollup", sf_dir)


def rollup_frame_for(e: DataFrame) -> DataFrame:
    """The rollup kernel over ANY events-shaped frame (ts, user_id,
    event_type, value) — shared by the build and the incremental
    update so batch deltas are bit-identical to build-time rows."""
    return (
        e.select(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
            "user_id",
            F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("vmic"),
        )
        .groupBy("day", "event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vmic").alias("sum_value_micro"),
        )
    )


def build_events_rollup(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the rollup and return the current version dir.
    Idempotent (fingerprint-tagged root, the index-build contract)."""
    from ..sources import versioning as vn

    root = events_rollup_root(sf_dir)
    cur = vn.current_dir(root)
    if cur is not None:
        return cur
    e = load_table(spark, sf_dir, "events")
    try:
        return vn.commit_version(
            spark,
            root,
            [
                vn.Component(
                    "agg", ("day",), frozenset(), (rollup_frame_for(e),)
                )
            ],
            expected=None,
        )
    except vn.ConcurrentWriterError:
        # an interleaved builder won the race to the initial version —
        # theirs is equivalent (same dataset fingerprint in the root tag)
        return vn.current_dir(root)


def _applied_digests(spark: SparkSession, cur: str) -> "DataFrame | None":
    p = os.path.join(cur, "applied")
    if not os.path.isdir(p):
        return None
    return spark.read.schema(APPLIED_SCHEMA).parquet(p)


def update_events_rollup(
    spark: SparkSession,
    sf_dir: str,
    new_events: DataFrame,
    auto_compact_threshold: int = 16,
    applied_digest: "tuple[int, int, int] | None" = None,
) -> str:
    """Incremental rollup maintenance: the batch's delta rollup merges
    (sum-of-sums — count and micro-sum are both associative) into
    exactly the day partitions the batch touches; untouched history
    hardlinks. Late/out-of-order events are handled by construction —
    a late event simply merges into its (old) day's partition. Returns
    the new current version dir.

    ``applied_digest`` (a ``(s1, s2, n)`` content digest from the
    streaming layer) makes the ADDITIVE merge exactly-once under
    at-least-once delivery: the digest is checked against the full
    applied set carried in the CURRENT version (so a replay of ANY
    previously merged batch — not just the most recent — is a no-op)
    and, on a real apply, committed atomically WITH the merged data in
    the same version (so there is no crash window between data and
    marker). Callers without a delivery-replay problem (ad-hoc merges)
    omit it and pay nothing."""
    from ..sources import versioning as vn

    cur = build_events_rollup(spark, sf_dir)
    root = os.path.dirname(cur)

    old_digests = _applied_digests(spark, cur)
    if applied_digest is not None and old_digests is not None:
        s1, s2, n = applied_digest
        hit = old_digests.filter(
            (F.col("s1") == s1) & (F.col("s2") == s2) & (F.col("n") == n)
        ).head(1)
        if hit:
            return cur  # replayed batch: already merged — would double-count

    delta = rollup_frame_for(
        new_events.select("ts", "user_id", "event_type", "value")
    ).localCheckpoint(eager=True)
    days = sorted(r["day"] for r in delta.select("day").distinct().collect())
    if not days:
        return cur

    old_aff = (
        spark.read.schema(ROLLUP_SCHEMA)
        .parquet(os.path.join(cur, "agg"))
        .filter(F.col("day").isin(days))
    )
    merged = (
        old_aff.select(
            "day", "event_type", "user_id", "n_events", "sum_value_micro"
        )
        .unionByName(
            delta.select(
                "day", "event_type", "user_id", "n_events", "sum_value_micro"
            )
        )
        .groupBy("day", "event_type", "user_id")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value_micro").alias("sum_value_micro"),
        )
    )
    components = [
        vn.Component(
            "agg",
            ("day",),
            frozenset(f"day={d}" for d in days),
            (merged,),
        )
    ]
    if applied_digest is not None:
        s1, s2, n = applied_digest
        newd = spark.createDataFrame([(s1, s2, n)], APPLIED_SCHEMA)
        alldig = newd if old_digests is None else old_digests.unionByName(newd)
        components.append(vn.Component("applied", (), frozenset(), (alldig,)))
    elif old_digests is not None:
        # a digest-less merge must still CARRY the applied set forward,
        # or it would amnesia the stream's exactly-once history
        components.append(
            vn.Component("applied", link_from=os.path.join(cur, "applied"))
        )
    return vn.commit_version(
        spark,
        root,
        components,
        expected=os.path.basename(cur),
        compact=ROLLUP_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )


def events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily dashboard aggregate SERVED from the stored rollup — event
    counts, distinct users, distinct types, exact micro-unit value sum
    per day, all exact aggregations of the (day, type, user) grain;
    the event log is never scanned at query time (the driver oracle
    recomputes the same numbers from the raw events)."""
    cur = build_events_rollup(spark, sf_dir)
    agg = spark.read.schema(ROLLUP_SCHEMA).parquet(os.path.join(cur, "agg"))
    return agg.groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.count_distinct("event_type").alias("n_types"),
        F.sum("sum_value_micro").alias("sum_value_micro"),
    )


def events_rollup_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(day, event_type) serving aggregate from the stored rollup —
    the second dashboard grain, again an exact aggregation of the
    (day, type, user) store with zero event-log scans."""
    cur = build_events_rollup(spark, sf_dir)
    agg = spark.read.schema(ROLLUP_SCHEMA).parquet(os.path.join(cur, "agg"))
    return agg.groupBy("day", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum("sum_value_micro").alias("sum_value_micro"),
    )


def delete_user_from_rollup(
    spark: SparkSession,
    sf_dir: str,
    user_ids: DataFrame,
    auto_compact_threshold: int = 16,
) -> str:
    """Right-to-be-forgotten on the AGGREGATE: retract every rollup row
    of the given users (the event log's own deletion is the storage
    layer's job; a served rollup must forget too, or the deletion
    leaks through dashboards). O(rollup + affected day partitions) —
    the rollup is user-grain, orders of magnitude smaller than the
    event log; a user active on every day rewrites every day partition,
    which is inherent to the request. Absent users are a no-op. Shared
    CAS kernel commit."""
    from ..sources import versioning as vn

    cur = build_events_rollup(spark, sf_dir)
    root = os.path.dirname(cur)

    ids = user_ids.select("user_id").dropDuplicates(["user_id"])
    agg = spark.read.schema(ROLLUP_SCHEMA).parquet(os.path.join(cur, "agg"))
    days = sorted(
        r["day"]
        for r in agg.join(ids, "user_id", "leftsemi")
        .select("day")
        .distinct()
        .collect()
    )
    if not days:
        return cur
    survivors = (
        agg.filter(F.col("day").isin(days))
        .join(ids, "user_id", "left_anti")
        .select("day", "event_type", "user_id", "n_events", "sum_value_micro")
    )
    components = [
        vn.Component(
            "agg",
            ("day",),
            frozenset(f"day={d}" for d in days),
            (survivors,),
        )
    ]
    if os.path.isdir(os.path.join(cur, "applied")):
        # retraction must not amnesia the stream's applied-digest set
        components.append(
            vn.Component("applied", link_from=os.path.join(cur, "applied"))
        )
    return vn.commit_version(
        spark,
        root,
        components,
        expected=os.path.basename(cur),
        compact=ROLLUP_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )
