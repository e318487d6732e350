"""Continuous aggregate (incrementally-maintained events rollup, r10):
incremental merge equals a fresh build over the combined events, late
events land in their own (old) day partition, and the streaming mode
converges with replay protection."""

import os

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators import cagg


def _agg_rows(spark, ver):
    return {
        tuple(r)
        for r in spark.read.schema(cagg.ROLLUP_SCHEMA)
        .parquet(os.path.join(ver, "agg"))
        .collect()
    }


def test_rollup_update_equals_fresh_build(spark, sf_dir, tmp_path):
    """Merging a batch into the rollup must equal rebuilding over the
    combined event log — sum-of-sums associativity made concrete."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base, alldir = str(tmp_path / "cabase"), str(tmp_path / "caall")
    os.makedirs(base), os.makedirs(alldir)
    ev.filter(F.col("event_id") % 3 != 0).write.parquet(
        os.path.join(base, "events.parquet")
    )
    ev.write.parquet(os.path.join(alldir, "events.parquet"))

    cagg.build_events_rollup(spark, base)
    from adk_noui_vectordb_spark.sources.tables import load_table

    batch = load_table(spark, alldir, "events").filter(
        F.col("event_id") % 3 == 0
    )
    v_inc = cagg.update_events_rollup(spark, base, batch)
    v_all = cagg.build_events_rollup(spark, alldir)
    assert _agg_rows(spark, v_inc) == _agg_rows(spark, v_all)

    # served daily aggregate from the merged store equals the direct
    # aggregation over ALL events
    served = {
        tuple(r) for r in cagg.events_rollup_daily(spark, base).collect()
    }
    direct = {
        tuple(r) for r in cagg.events_rollup_daily(spark, alldir).collect()
    }
    assert served == direct


def test_rollup_late_event_merges_into_old_day(spark, sf_dir, tmp_path):
    """A late event for a historical day merges into exactly that day's
    partition; other day partitions are untouched (hardlinked)."""
    base = str(tmp_path / "latebase")
    os.makedirs(base)
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).write.parquet(
        os.path.join(base, "events.parquet")
    )
    v0 = cagg.build_events_rollup(spark, base)
    rows0 = _agg_rows(spark, v0)
    some_day = sorted({t[4] for t in rows0})[0]  # oldest day, surely old

    late = spark.createDataFrame(
        [(999_999_001, f"{some_day} 12:00:00", 42, "click", 1.5)],
        "event_id bigint, ts_s string, user_id bigint, event_type string, value double",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    v1 = cagg.update_events_rollup(spark, base, late)
    rows1 = _agg_rows(spark, v1)
    changed = rows1 ^ rows0
    assert changed  # something moved
    assert all(t[4] == some_day for t in changed)  # only that day
    # the late event's contribution: one (day, click, 42) row gained
    # n_events+1 and sum_value_micro+1_500_000
    gained = {t for t in rows1 - rows0 if t[0] == "click" and t[1] == 42}
    lost = {t for t in rows0 - rows1 if t[0] == "click" and t[1] == 42}
    dn = sum(t[2] for t in gained) - sum(t[2] for t in lost)
    dv = sum(t[3] for t in gained) - sum(t[3] for t in lost)
    assert (dn, dv) == (1, 1_500_000)


def test_stream_rollup_ingest_converges_and_skips_replay(
    spark, sf_dir, tmp_path
):
    """Streamed event batches merge into the rollup; re-running the
    stream over the same input (fresh checkpoint — the replay shape)
    must NOT double-count thanks to the content-digest markers."""
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_events_rollup_ingest,
    )

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    base = str(tmp_path / "casbase")
    stream_dir = str(tmp_path / "casin")
    os.makedirs(base), os.makedirs(stream_dir)
    ev.filter(F.col("event_id") % 5 != 0).write.parquet(
        os.path.join(base, "events.parquet")
    )
    cagg.build_events_rollup(spark, base)
    from adk_noui_vectordb_spark.sources.tables import load_table

    load_table(spark, sf_dir, "events").filter(
        F.col("event_id") % 5 == 0
    ).select("event_id", "ts", "user_id", "event_type", "value").write.parquet(
        os.path.join(stream_dir, "b1")
    )

    q = stream_events_rollup_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_ca1")
    )
    q.awaitTermination(180)
    v1 = cagg.build_events_rollup(spark, base)
    after_first = _agg_rows(spark, v1)

    # replay: same input, FRESH checkpoint (the redelivery shape)
    q2 = stream_events_rollup_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_ca2")
    )
    q2.awaitTermination(180)
    v2 = cagg.build_events_rollup(spark, base)
    assert _agg_rows(spark, v2) == after_first  # no double count

    # and the converged store equals a fresh build over everything
    alldir = str(tmp_path / "caall2")
    os.makedirs(alldir)
    ev.write.parquet(os.path.join(alldir, "events.parquet"))
    v_all = cagg.build_events_rollup(spark, alldir)
    assert after_first == _agg_rows(spark, v_all)


def test_delete_user_from_rollup_forgets_everywhere(spark, sf_dir, tmp_path):
    """User retraction removes every rollup row of the victim across all
    days, leaves everyone else bit-identical, and absent users no-op."""
    base = str(tmp_path / "rtbf")
    os.makedirs(base)
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).write.parquet(
        os.path.join(base, "events.parquet")
    )
    v0 = cagg.build_events_rollup(spark, base)
    rows0 = _agg_rows(spark, v0)
    victim = sorted({t[1] for t in rows0})[0]
    assert any(t[1] == victim for t in rows0)

    v1 = cagg.delete_user_from_rollup(
        spark, base, spark.createDataFrame([(victim,)], "user_id bigint")
    )
    rows1 = _agg_rows(spark, v1)
    assert not any(t[1] == victim for t in rows1)
    assert rows1 == {t for t in rows0 if t[1] != victim}

    v2 = cagg.delete_user_from_rollup(
        spark, base, spark.createDataFrame([(987654321,)], "user_id bigint")
    )
    assert v2 == v1


def test_applied_digest_makes_additive_merge_exactly_once(
    spark, sf_dir, tmp_path
):
    """ADVICE r11 (medium), both double-count windows pinned:
    (a) a replay AFTER the data committed but with no sidecar marker —
    impossible to distinguish now, since the digest commits atomically
    WITH the data; (b) a multi-batch checkpoint reset replaying a batch
    whose digest belongs to an OLDER version — still skipped, because
    the applied set carries forward in every version."""
    from adk_noui_vectordb_spark.sources.tables import load_table

    base = str(tmp_path / "exobase")
    os.makedirs(base)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ev.filter(F.col("event_id") % 4 == 1).write.parquet(
        os.path.join(base, "events.parquet")
    )
    cagg.build_events_rollup(spark, base)
    loaded = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    b1 = loaded.filter(F.col("event_id") % 4 == 2).localCheckpoint(eager=True)
    b2 = loaded.filter(F.col("event_id") % 4 == 3).localCheckpoint(eager=True)
    d1, d2 = (101, 201, b1.count()), (102, 202, b2.count())

    v1 = cagg.update_events_rollup(spark, base, b1, applied_digest=d1)
    rows1 = _agg_rows(spark, v1)
    # (a) immediate replay of the same batch+digest: no-op, no new version
    vr = cagg.update_events_rollup(spark, base, b1, applied_digest=d1)
    assert vr == v1 and _agg_rows(spark, vr) == rows1

    v2 = cagg.update_events_rollup(spark, base, b2, applied_digest=d2)
    rows2 = _agg_rows(spark, v2)
    assert rows2 != rows1
    # (b) checkpoint reset replays BOTH batches: d1 is two versions old
    # (the window the swept sidecar markers used to double-count)
    va = cagg.update_events_rollup(spark, base, b1, applied_digest=d1)
    vb = cagg.update_events_rollup(spark, base, b2, applied_digest=d2)
    assert va == v2 and vb == v2
    assert _agg_rows(spark, vb) == rows2

    # and the applied set survives a retraction commit
    users = b1.select("user_id").distinct().limit(2)
    v3 = cagg.delete_user_from_rollup(spark, base, users)
    assert v3 != v2
    vc = cagg.update_events_rollup(spark, base, b2, applied_digest=d2)
    assert vc == v3, "applied set lost across delete_user_from_rollup"
