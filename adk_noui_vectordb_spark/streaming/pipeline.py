"""Structured Streaming: incremental re-index + watermarked event windows.

The reference *intended* incremental indexing (watchdog pinned but never
wired, content-hash change detection — SURVEY.md section 2.10) but re-scans
everything per run and leaks stale rows. The Spark-native design:

- ``stream_incremental_index``: file-source stream over a corpus directory
  -> the same chunk pipeline as batch -> ``foreachBatch`` keyed upsert.
  New/changed files are the only work per trigger (the file source tracks
  processed files in checkpointed state); the keyed upsert replaces stale
  rows (fixing the reference's leak).
- ``stream_events_tumbling``: watermarked tumbling event-time windows over
  the events table — the streaming twin of the batch
  ``events_tumbling_counts`` query; the watermark bounds state for late
  data, which is what makes the aggregation runnable forever at scale.

Both run with ``trigger(availableNow=True)`` in tests: process everything
currently available, then stop — which also makes streaming/batch
equivalence assertable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_fixed_lines
from ..sources.sinks import upsert_parquet
from ..sources.tables import events_time_exprs


def _batch_digest(batch: DataFrame, cols: "tuple[str, ...]"):
    """Order-independent content digest of a micro-batch: per-row md5
    split into two 32-bit words, summed, plus the row count (32-bit word
    sums stay < 2^63 for any batch the planet can deliver — ANSI mode
    makes overflow an ERROR, so the margin is kept 2^31 rows wide).
    CONTENT-keyed, never batch_id-keyed: a checkpoint reset renumbers
    batches from 0, and an id-keyed marker would silently skip a
    genuinely new batch (ADVICE r8). Returns (s1, s2, n), or None for an
    empty batch. One Spark aggregate — a scalar collect, never rows."""
    h = F.md5(F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols]))

    def word(start: int) -> F.Column:
        return F.conv(F.substring(h, start, 8), 16, 10).cast("bigint")

    row = (
        batch.select(word(1).alias("h1"), word(9).alias("h2"))
        .agg(
            F.sum("h1").alias("s1"),
            F.sum("h2").alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .head()
    )
    if row["n"] == 0:
        return None
    return (row["s1"], row["s2"], row["n"])


def _decisions_part(decisions_dir: str, digest) -> str:
    """Content-keyed partition dir for one batch's audit rows — the
    exactly-once decisions trail (ADVICE r11): a replayed batch
    OVERWRITES its own ``digest=<...>`` dir instead of appending, so
    crash-replay cannot duplicate decision rows and a partial write is
    cleared by the overwrite. Identical-content batches share a dir by
    design (the content-marker discipline already treats them as one
    re-delivery)."""
    s1, s2, n = digest
    return os.path.join(decisions_dir, f"digest={s1}_{s2}_{n}")


def _retry_cas(fn, attempts: int = 3) -> None:
    """Run a versioned-index update, retrying when an interleaved
    committer wins the CAS race (sources/versioning.py single-writer
    enforcement, r10): every ``update_*`` re-derives its whole plan from
    the NEW current version on each call, so a plain re-invoke is
    exactly the documented loser protocol. One stream per root never
    hits this; it exists for deployments pointing several ingest
    streams at one index root."""
    from ..sources.versioning import ConcurrentWriterError

    last = None
    for _ in range(attempts):
        try:
            fn()
            return
        except ConcurrentWriterError as e:
            last = e
    raise last


def _marker_path(root: str, prefix: str, digest) -> str:
    """Idempotence-marker path under ``root/applied/``, keyed on the
    index's CURRENT version name (ADVICE r9, medium): replace semantics
    make over-application harmless, but a content marker that outlives
    the version that wrote it is a correctness bug — after a
    ``delete_from_*`` retraction bumps the version, a legitimate
    re-ingest of the same rows must NOT be skipped by the stale marker.
    Version-scoped markers also expire naturally: ``gc_versions`` sweeps
    every marker not keyed to the current version, which bounds the
    ``applied/`` directory at O(batches since last commit) instead of
    growing forever. The caller checks the marker BEFORE an update
    (keyed on the pre-update version) and writes it AFTER (keyed on the
    version the update produced) — re-resolving here each time."""
    from ..sources import versioning as vn

    applied = os.path.join(root, "applied")
    os.makedirs(applied, exist_ok=True)
    cur = vn.current_name(root) or "v_none"
    s1, s2, n = digest
    return os.path.join(applied, f"{prefix}.{cur}.{s1}_{s2}_{n}")


def stream_events_tumbling(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, queryName: str
):
    """Watermarked 1-hour tumbling counts per event_type, to a memory sink.

    Returns the started StreamingQuery; caller awaits termination (tests
    use availableNow so it drains and stops).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # schema from a batch read of the same directory; the ts projection is
    # schema-adaptive (ns bigint or timestamp[us] — see events_time_exprs)
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.select(
        events_time_exprs(batch_schema)[0].alias("ts"),
        "event_type",
        "value",
    )
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_index(
    spark: SparkSession,
    corpus_dir: str,
    index_path: str,
    checkpoint_dir: str,
    chunk_size: int = 50,
):
    """File-source stream -> chunk -> keyed upsert into the element index.

    Each micro-batch contains only files not seen by the checkpoint; the
    foreachBatch upsert keys on (path, name) so a re-written file replaces
    its old chunks instead of leaking them (the reference's stale-row bug,
    SURVEY.md section 2.10).
    """
    raw = (
        spark.readStream.option("recursiveFileLookup", "true")
        .text(corpus_dir, wholetext=True)
        .select(
            F.input_file_name().alias("path"), F.col("value").alias("content")
        )
    )

    def _upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        elements = chunk_fixed_lines(batch_df, chunk_size=chunk_size)
        # start_line in the key: chunk names can repeat within a file, and
        # the upsert must not collapse distinct elements (same rule as
        # build_index_from_corpus).
        keyed = elements.withColumn(
            "element_key",
            F.concat_ws("#", "path", "name", F.col("start_line").cast("string")),
        )
        if keyed.isEmpty():
            return
        upsert_parquet(
            batch_df.sparkSession, keyed, index_path, key="element_key"
        )

    return (
        raw.writeStream.foreachBatch(_upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_user_running_totals(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, queryName: str
):
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running (n_events, total_value), state carried across
    micro-batches.

    This is the arbitrary-state surface the built-in windowed aggregations
    can't express (e.g. per-key counters with custom merge/expiry logic);
    state lives in the state store partitioned by user_id, so it scales
    horizontally with key cardinality. Emits one updated row per user per
    micro-batch (update mode).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.select("user_id", "value")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update_totals(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    updated = events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, queryName: str
):
    """Streaming exact dedup: drop duplicate event_ids within the watermark.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only for the
    watermark horizon — the streaming twin of ``dedup_exact`` that runs
    forever on an unbounded stream with BOUNDED state (the naive
    dropDuplicates would grow state without limit). Emits the deduplicated
    per-type counts to a memory sink.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.select(
        "event_id",
        events_time_exprs(batch_schema)[0].alias("ts"),
        "event_type",
    )
    deduped = events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    agg = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_purchase_click_join(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, queryName: str
):
    """Stream-stream inner join with event-time bounds: each purchase joined
    to the same user's clicks from the preceding hour.

    Both sides are watermarked; the time-range join condition lets Spark
    BOUND the buffered state on each side (clicks older than the watermark
    minus the join window are evicted) — without the range condition a
    stream-stream join must buffer forever. This is the streaming analog
    of the batch banded range join (operators/temporal.py).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema

    def side(event_type: str, prefix: str):
        raw = (
            spark.readStream.schema(batch_schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        return (
            raw.filter(F.col("event_type") == event_type)
            .select(
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("event_id").alias(f"{prefix}_id"),
                events_time_exprs(batch_schema)[0].alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    purchases = side("purchase", "p")
    clicks = side("click", "c")
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
    ).select("p_id", "c_id", "p_user")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize_events(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str, queryName: str
):
    """Streaming sessionization via the built-in ``session_window``: per-user
    sessions close after a 30-minute silence, aggregated incrementally as
    events arrive — the streaming twin of the batch ``events_sessionize``
    gaps-and-islands query.

    Gap calibration against the batch rule: the batch query starts a new
    session when the SECOND-truncated timestamp gap exceeds 1800 s, i.e.
    a gap of exactly 1800 s stays in-session. Spark's ``session_window``
    merge is boundary-INCLUSIVE — an event arriving exactly at session end
    (last_ts + gap) still extends the session — so gap = 1800 s reproduces
    the batch predicate exactly (integer-second gaps: merge iff <= 1800).
    A 1801-s gap setting would wrongly merge an exactly-1801-s silence
    (one such pair exists at sf0.01; caught by the round-3 driver sweep).
    Both boundaries are pinned in tests/test_streaming.py.

    State scales with OPEN sessions per user (the watermark closes idle
    ones at production; complete mode here because availableNow's final
    watermark would hold back the trailing hour of sessions in append
    mode). Session state is partitioned by user_id — horizontal scale-out
    is by key, the same story as the other stateful operators.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    events = raw.select(
        "user_id",
        "value",
        F.date_trunc("second", events_time_exprs(batch_schema)[0]).alias(
            "ts_sec"
        ),
    )
    agg = (
        events.groupBy(
            F.session_window("ts_sec", "1800 seconds").alias("win"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_text_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    docs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming lexical-index freshness: document files landing in
    ``docs_stream_dir`` merge into the on-disk inverted index via the
    incremental bucket-rewrite path (``invindex.update_text_index``) —
    the 6th streaming mode closes the loop between ingestion and
    serving: a query through ``bm25_topk_served``'s index sees a
    document one micro-batch after it lands, at the cost of rewriting
    only the term buckets that batch touched.

    foreachBatch is AT-LEAST-ONCE: a crash between a completed merge
    and the checkpoint commit re-delivers the batch on restart. Since
    r9 the merge itself is an idempotent doc-level REPLACE under an
    atomic versioned commit (invindex.update_text_index), so
    re-application is harmless; the per-batch marker remains as a
    work-skip and is keyed on a CONTENT digest of the batch — an
    order-independent sum of per-row md5(doc_id, text) — not on
    (checkpoint, batch_id) (ADVICE r8: after a checkpoint reset,
    Structured Streaming renumbers batches from 0, so an id-keyed
    marker could silently skip a genuinely NEW batch that happens to
    reuse an old batch_id; a content key skips only true
    re-deliveries). The digest is one Spark aggregate (a scalar
    collect), never a row collect.
    """
    from ..operators.invindex import (
        build_text_index,
        text_index_root,
        update_text_index,
    )

    raw = spark.readStream.schema("doc_id bigint, text string").parquet(
        docs_stream_dir
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_text_index(batch_df.sparkSession, sf_dir)
        root = text_index_root(sf_dir)
        batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        digest = _batch_digest(batch, ("doc_id", "text"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return  # same content already merged into the current version
        _retry_cas(
            lambda: update_text_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_vector_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    vecs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming VECTOR-index freshness — the 8th streaming mode and the
    exact vector twin of ``stream_text_index_ingest``: embedding batches
    landing in ``vecs_stream_dir`` upsert into the on-disk RP-LSH index
    via ``ann.update_rp_index`` (same banding kernel as the build, vec-
    level replace, atomic versioned commit), so an ``ann_rp_lsh_topk``
    probe serves a vector one micro-batch after it lands. This is the
    reference's core continuous-ingestion loop (indexing_agent.py:
    332-361 upserts re-embedded files into ChromaDB as they change)
    re-expressed as Structured Streaming over the Spark-native index.

    foreachBatch is AT-LEAST-ONCE; update_rp_index's replace semantics
    make re-application idempotent, and the content-digest marker (the
    stream_text_index_ingest discipline — order-independent md5-word
    sums, never batch_id-keyed) skips true re-deliveries even across a
    checkpoint reset without ever skipping a genuinely new batch.
    """
    from ..operators.ann import build_rp_index, rp_index_root, update_rp_index

    raw = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(vecs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_rp_index(batch_df.sparkSession, sf_dir)
        root = rp_index_root(sf_dir)
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("vec_id", "embedding"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return  # same content already merged into the current version
        _retry_cas(
            lambda: update_rp_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_graph_index_deletes(
    spark: SparkSession,
    sf_dir: str,
    ids_stream_dir: str,
    checkpoint_dir: str,
):
    """Streamed mark-deletes for the navigable-graph index (the 16th
    mode) — the retraction side of ``stream_graph_index_ingest``: id
    batches tombstone via ``graph_ann.delete_from_graph_index`` (the
    hnswlib mark_deleted analog: a kilobyte ``tomb/`` append, every
    other component hardlinks through), so a deleted vector stops
    surfacing one micro-batch after the delete lands while the graph
    keeps routing through it. Same content-digest-marker contract; the
    delete itself is replay-idempotent (a fully-tombstoned batch
    no-ops), so the crash window between commit and marker cannot
    wedge the stream on the partial-overlap guard."""
    from ..operators.graph_ann import (
        build_graph_index,
        delete_from_graph_index,
        graph_index_root,
    )

    raw = spark.readStream.schema("vec_id bigint").parquet(ids_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_graph_index(batch_df.sparkSession, sf_dir)
        root = graph_index_root(sf_dir)
        batch = batch_df.select("vec_id").localCheckpoint(eager=True)
        digest = _batch_digest(batch, ("vec_id",))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "d", digest)):
            return
        ids = [r["vec_id"] for r in batch.distinct().collect()]
        _retry_cas(
            lambda: delete_from_graph_index(
                batch_df.sparkSession, sf_dir, ids
            )
        )
        with open(_marker_path(root, "d", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ivf_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    vecs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming IVF freshness — the trained-quantizer twin of
    ``stream_vector_index_ingest``: embedding batches upsert into the
    on-disk IVF index via ``ann.update_ivf_index`` (frozen centroids,
    append-mostly, atomic versioned commit), so an
    ``ann_ivf_trained_topk`` probe serves a vector one micro-batch
    after it lands. Same at-least-once/content-digest-marker contract
    as the text and RP ingest modes."""
    from ..operators.ann import (
        build_ivf_index,
        ivf_index_root,
        update_ivf_index,
    )

    raw = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(vecs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_ivf_index(batch_df.sparkSession, sf_dir)
        root = ivf_index_root(sf_dir, 8, 2)
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("vec_id", "embedding"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return
        _retry_cas(
            lambda: update_ivf_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_binq_ivf_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    vecs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming freshness for the binary-IVF index (the 17th mode):
    embedding batches sign-pack under the frozen coarse centroids and
    upsert via ``quantize.update_binq_ivf_index`` (vec-level REPLACE,
    append-mostly, shared-kernel CAS commit), so an
    ``ann_binq_ivf_topk`` probe serves a vector one micro-batch after
    it lands — every updatable index family now has its stream. Same
    at-least-once/content-digest-marker contract; the REPLACE update is
    naturally replay-safe (identical batch rewrites identical rows)."""
    from ..operators.quantize import (
        binq_ivf_root,
        build_binq_ivf_index,
        update_binq_ivf_index,
    )

    raw = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(vecs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_binq_ivf_index(batch_df.sparkSession, sf_dir)
        root = binq_ivf_root(sf_dir)
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("vec_id", "embedding"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return
        _retry_cas(
            lambda: update_binq_ivf_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_containment_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    docs_stream_dir: str,
    checkpoint_dir: str,
    tag: str = "",
):
    """Streaming freshness for the containment shingle index (the 18th
    mode, VERDICT r15 next #4): document batches landing in
    ``docs_stream_dir`` ADMIT via ``dedup.update_containment_index``
    (doc-level REPLACE under the frozen-dfs discipline, shared-kernel
    CAS commit), so a ``dedup_containment_gate_for`` probe catches a
    subset-duplicate of a streamed document one micro-batch after it
    lands — the admit lifecycle that landed in r15 gets its stream like
    every other updatable family (minhash 14, graph 15/16, binary-IVF
    17). Same at-least-once/content-digest-marker contract
    (order-independent md5 content sums, never batch_id-keyed); the
    REPLACE admit is naturally replay-safe — an identical batch locates
    its own postings through its stored shingles and rewrites identical
    rows."""
    from ..operators.dedup import (
        build_containment_index,
        containment_index_root,
        update_containment_index,
    )

    raw = spark.readStream.schema("doc_id bigint, text string").parquet(
        docs_stream_dir
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_containment_index(batch_df.sparkSession, sf_dir, tag)
        root = containment_index_root(sf_dir, tag)
        batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        digest = _batch_digest(batch, ("doc_id", "text"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return  # same content already admitted into the current version
        _retry_cas(
            lambda: update_containment_index(
                batch_df.sparkSession, sf_dir, batch, tag
            )
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_li_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    docs_stream_dir: str,
    checkpoint_dir: str,
    tag: str = "",
):
    """Streaming freshness for the late-interaction chunk index (the
    19th mode): document batches landing in ``docs_stream_dir`` ADMIT
    via ``embed.update_li_index`` (doc-level REPLACE — chunk + embed +
    band through the build kernels, dbucket-pruned stale-row retraction,
    shared-kernel CAS commit), so a ``late_interaction_topk_served``
    query scores a streamed document one micro-batch after it lands.
    Same at-least-once/content-digest-marker contract; the REPLACE
    admit is naturally replay-safe (identical batch rewrites identical
    rows)."""
    from ..operators.embed import build_li_index, li_index_root, update_li_index

    raw = spark.readStream.schema(
        "doc_id bigint, text string, lang string"
    ).parquet(docs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_li_index(batch_df.sparkSession, sf_dir, tag=tag)
        root = li_index_root(sf_dir, tag=tag)
        batch = batch_df.select("doc_id", "text", "lang").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("doc_id", "text", "lang"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return  # same content already admitted into the current version
        _retry_cas(
            lambda: update_li_index(
                batch_df.sparkSession, sf_dir, batch, tag=tag
            )
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ivfpq_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    vecs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming freshness for the composed residual-IVFPQ index (r10):
    embedding batches residual-encode under the frozen coarse centroids
    and codebooks and upsert via ``ann.update_ivfpq_index``
    (append-mostly, shared-kernel CAS commit), so an ``ann_ivfpq_topk``
    probe serves a vector one micro-batch after it lands. Same
    at-least-once/content-digest-marker contract as the other vector
    ingest modes."""
    from ..operators.ann import (
        build_ivfpq_index,
        ivfpq_index_root,
        update_ivfpq_index,
    )

    raw = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(vecs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_ivfpq_index(batch_df.sparkSession, sf_dir)
        root = ivfpq_index_root(sf_dir, 8, 2, 4, 8, 2)
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("vec_id", "embedding"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return
        _retry_cas(
            lambda: update_ivfpq_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_events_rollup_ingest(
    spark: SparkSession,
    sf_dir: str,
    events_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming maintenance of the continuous aggregate (12th mode):
    event micro-batches merge into the versioned rollup via
    ``cagg.update_events_rollup`` (sum-of-sums into the touched day
    partitions, shared-kernel CAS commit). Idempotence is CRITICAL
    here, not just hygiene: rollup counts are ADDITIVE (unlike the
    replace-semantics indexes, re-applying a batch double-counts), so
    the content digest does NOT use this module's sidecar marker files
    (ADVICE r11: a crash between the data commit and the marker write
    re-applies on restart, and gc sweeps non-current-version markers so
    a multi-batch checkpoint reset re-applies every older batch).
    Instead the digest rides INSIDE the rollup version as the tiny
    ``applied`` component — committed atomically with the merged data
    and checked against the FULL ever-applied set — making the additive
    merge exactly-once under any at-least-once replay shape."""
    from ..operators.cagg import build_events_rollup, update_events_rollup

    raw = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double"
    ).parquet(events_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_events_rollup(batch_df.sparkSession, sf_dir)
        batch = batch_df.select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).localCheckpoint(eager=True)
        digest = _batch_digest(batch, ("event_id", "event_type"))
        if digest is None:
            return
        _retry_cas(
            lambda: update_events_rollup(
                batch_df.sparkSession, sf_dir, batch, applied_digest=digest
            )
        )

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_collection_ingest(
    spark: SparkSession,
    coll_root: str,
    batch_stream_dir: str,
    checkpoint_dir: str,
    schema: str = "id string, embedding array<double>, document string, lang string",
):
    """Streaming writes into the ChromaDB-compatible ``Collection``
    facade (api/collection.py) — the 13th streaming mode and the full
    reference loop as one flow: the reference's indexing agent watches
    for changed files and ``collection.upsert``s them continuously
    (indexing_agent.py:332-361); here, batches of (id, embedding,
    document, metadata) rows landing in ``batch_stream_dir`` upsert
    into the collection root, so ``Collection.query``/``get`` serve a
    row one micro-batch after it lands.

    ``schema`` is the stream's row shape (Structured Streaming needs a
    static schema); its metadata columns must match the collection's
    schema-on-first-write contract — a drifting producer fails loudly
    at the upsert, never corrupts.

    foreachBatch is AT-LEAST-ONCE; ``Collection.upsert`` is an
    id-level REPLACE under an atomic CAS commit, so re-application is
    idempotent, and the version-scoped content-digest marker (the
    stream_text_index_ingest discipline) skips true re-deliveries
    without ever skipping a new batch after a checkpoint reset.
    An EMPTY collection root is fine — the first batch is the initial
    build (the facade's bootstrap path).

    ``maxFilesPerTrigger=1`` pins one producer file per micro-batch:
    after a checkpoint reset the file source re-delivers history in
    its original (mod-time, path) order as SEPARATE upserts, so a
    replay converges to the same final state even when one id was
    written at two points in time — coalescing them into one batch
    would instead trip the facade's duplicate-ids-within-batch check
    (found by the redelivery test)."""
    from ..api.collection import Collection

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_stream_dir)
    )
    digest_cols = tuple(f.split()[0].strip() for f in schema.split(","))

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        digest = _batch_digest(batch, digest_cols)
        if digest is None:
            return
        if os.path.exists(_marker_path(coll_root, "c", digest)):
            return  # same content already committed to the current version
        coll = Collection(batch_df.sparkSession, coll_root)
        _retry_cas(lambda: coll.upsert(batch))
        with open(_marker_path(coll_root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_gated_collection_ingest(
    spark: SparkSession,
    sf_dir: str,
    coll_root: str,
    batch_stream_dir: str,
    checkpoint_dir: str,
    decisions_dir: str,
    schema: str = "id string, embedding array<double>, document string, lang string",
):
    """Near-dup-GATED ingest into the ChromaDB ``Collection`` facade —
    the 14th streaming mode and the full curated-vector-DB loop: the
    reference's indexing agent continuously upserts changed files into
    its collection (indexing_agent.py:332-361) with NO curation; at
    crawl scale the same loop must reject near-duplicate documents
    BEFORE they enter the serving index, or retrieval returns k copies
    of one page. Batches of (id, embedding, document, metadata) rows
    landing in ``batch_stream_dir`` are (1) gated against the persisted
    MinHash index (``dedup_gate_for``'s serving path — the gate doc_id
    is the collection's own 60-bit surrogate, so the two systems share
    one identity), (2) rejections logged to ``decisions_dir``
    (new_doc_id, dup_of, matches — the audit trail), (3) admissions
    upsert into BOTH the MinHash index (the next batch dedups against
    them) and the collection (they serve via ``Collection.query`` one
    batch later).

    Replay safety: the stream_gated_ingest discipline verbatim — the
    gate decision is a pure function of (batch, pre-batch corpus)
    because candidates naming the batch's own surrogates are excluded,
    both updates are id-level REPLACEs under CAS commits, and the
    content-digest markers skip true re-deliveries. maxFilesPerTrigger=1
    keeps a checkpoint-reset replay in original producer order (the
    collection's duplicate-ids-within-batch check rejects coalesced
    replays — the stream_collection_ingest finding)."""
    from ..api.collection import Collection, _sid_expr
    from ..operators.dedup import (
        build_minhash_index,
        dedup_gate_for,
        minhash_index_root,
        update_minhash_index,
    )

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(batch_stream_dir)
    )
    digest_cols = tuple(f.split()[0].strip() for f in schema.split(","))

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        build_minhash_index(bspark, sf_dir)
        root = minhash_index_root(sf_dir)
        batch = batch_df.localCheckpoint(eager=True)
        digest = _batch_digest(batch, digest_cols)
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "gc", digest)):
            return  # true re-delivery: already gated and applied
        gdocs = batch.select(
            _sid_expr(F.col("id")).alias("doc_id"),
            F.col("document").alias("text"),
        ).localCheckpoint(eager=True)
        # replay self-match exclusion: a crash between the index update
        # and the marker write must not make the batch reject itself
        dups = (
            dedup_gate_for(bspark, sf_dir, gdocs)
            .join(
                gdocs.select(F.col("doc_id").alias("dup_of")),
                "dup_of",
                "left_anti",
            )
            .localCheckpoint(eager=True)
        )
        # idempotent audit write (ADVICE r11): each batch's decisions
        # OVERWRITE their own digest=<...> partition dir instead of
        # appending under a separate marker — a crash between the old
        # append and its marker re-appended the same rows on replay
        # (and a mid-append crash left partial files). Overwrite of a
        # content-keyed dir makes the replay rewrite the SAME rows and
        # clears any partial files; readers scan decisions_dir as a
        # digest-partitioned table.
        os.makedirs(decisions_dir, exist_ok=True)  # all-clean runs still read
        if dups.take(1):
            dups.select("new_doc_id", "dup_of", "matches").write.mode(
                "overwrite"
            ).parquet(_decisions_part(decisions_dir, digest))
        admitted = batch.join(
            dups.select(F.col("new_doc_id").alias("_sid")).distinct(),
            _sid_expr(F.col("id")) == F.col("_sid"),
            "left_anti",
        ).localCheckpoint(eager=True)
        if admitted.take(1):
            admitted_docs = admitted.select(
                _sid_expr(F.col("id")).alias("doc_id"),
                F.col("document").alias("text"),
            )
            _retry_cas(
                lambda: update_minhash_index(bspark, sf_dir, admitted_docs)
            )
            coll = Collection(bspark, coll_root)
            _retry_cas(lambda: coll.upsert(admitted))
        with open(_marker_path(root, "gc", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_gated_ingest(
    spark: SparkSession,
    sf_dir: str,
    docs_stream_dir: str,
    checkpoint_dir: str,
    decisions_dir: str,
    intra_batch_gate: bool = False,
):
    """The COMPOSED ingestion pipeline — the r9 capabilities chained as
    one streaming flow (the 10th streaming mode): document batches
    landing in ``docs_stream_dir`` are (1) near-dup GATED against the
    persisted MinHash index (``dedup_gate_against_index``'s serving
    path — candidates from the band table, verification from stored
    signatures, zero corpus re-signing), (2) REJECTED duplicates are
    logged to ``decisions_dir`` (an append-only parquet audit trail:
    new_doc_id, dup_of, matches), and (3) ADMITTED documents upsert
    into BOTH the MinHash index (so the next batch dedups against them
    too) and the lexical text index (so they serve BM25 one batch
    later). Content-digest idempotence markers as in every ingest mode.

    At-least-once replay safety (ADVICE r9, high): the gate's contract
    is batch-vs-corpus-OUTSIDE-the-batch, so candidates whose ``dup_of``
    is one of the batch's own doc_ids are EXCLUDED. Without that, a
    crash between the two index updates made the replayed batch match
    ITSELF in the already-updated MinHash index — every doc logged as a
    bogus self-duplicate, dropped, and permanently missing from the text
    index. With the exclusion the gate decision is a pure function of
    (batch, pre-batch corpus), so a replay decides identically and the
    idempotent replace-updates converge both indexes. The audit write
    is EXACTLY-once: each batch's decisions overwrite a content-keyed
    ``digest=<...>`` partition dir, so a crash anywhere in the ingest
    makes the replay rewrite the same rows, never append duplicates.

    ``intra_batch_gate=True`` additionally rejects near-dups WITHIN the
    batch, keeping the md5-min doc_id of each duplicate pair as the one
    admitted canonical copy (``dedup.intra_batch_dup_decisions``) — the
    crawl-ingest shape where the same page arrives twice in one batch.
    Default False preserves the original contract (intra-batch dedup
    deferred to compaction-time ``dedup_minhash_pairs``).
    """
    from ..operators.dedup import (
        build_minhash_index,
        dedup_gate_for,
        intra_batch_dup_decisions,
        minhash_index_root,
        update_minhash_index,
    )
    from ..operators.invindex import update_text_index

    raw = spark.readStream.schema("doc_id bigint, text string").parquet(
        docs_stream_dir
    )

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        build_minhash_index(bspark, sf_dir)
        root = minhash_index_root(sf_dir)
        batch = batch_df.select("doc_id", "text").localCheckpoint(eager=True)
        digest = _batch_digest(batch, ("doc_id", "text"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "g", digest)):
            return  # true re-delivery: already gated and applied

        # dedup_gate_for already applies the GATE_MIN_MATCHES floor; the
        # anti-join removes candidates naming the batch's own docs (the
        # replay self-match exclusion documented above).
        dups = dedup_gate_for(bspark, sf_dir, batch).join(
            batch.select(F.col("doc_id").alias("dup_of")),
            "dup_of",
            "left_anti",
        )
        if intra_batch_gate:
            dups = dups.unionByName(
                intra_batch_dup_decisions(bspark, batch)
            )
        dups = dups.localCheckpoint(eager=True)
        # idempotent audit write — see stream_gated_collection_ingest
        os.makedirs(decisions_dir, exist_ok=True)
        if dups.take(1):
            dups.select("new_doc_id", "dup_of", "matches").write.mode(
                "overwrite"
            ).parquet(_decisions_part(decisions_dir, digest))
        admitted = batch.join(
            dups.select(F.col("new_doc_id").alias("doc_id")).distinct(),
            "doc_id",
            "left_anti",
        ).localCheckpoint(eager=True)
        if admitted.take(1):
            _retry_cas(lambda: update_minhash_index(bspark, sf_dir, admitted))
            _retry_cas(lambda: update_text_index(bspark, sf_dir, admitted))
        with open(_marker_path(root, "g", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_graph_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    vecs_stream_dir: str,
    checkpoint_dir: str,
):
    """Streaming freshness for the navigable-graph ANN index (the 15th
    mode, r12): embedding batches INSERT into the on-disk k-NN graph
    via ``graph_ann.update_graph_index`` (frozen centroids and hubs,
    append-mostly edges + star bridges + capped reversals, atomic CAS
    commit), so an ``ann_graph_topk`` beam serves a vector one
    micro-batch after it lands — the hnswlib add_items loop as a
    stream. Same at-least-once/content-digest-marker contract as the
    other vector ingest modes; the insert itself is replay-idempotent
    (a fully-present batch is a no-op), so the crash window between
    commit and marker cannot wedge the stream on the ADD-only guard."""
    from ..operators.graph_ann import (
        build_graph_index,
        graph_index_root,
        update_graph_index,
    )

    raw = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(vecs_stream_dir)

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        build_graph_index(batch_df.sparkSession, sf_dir)
        root = graph_index_root(sf_dir)
        batch = batch_df.select("vec_id", "embedding").localCheckpoint(
            eager=True
        )
        digest = _batch_digest(batch, ("vec_id", "embedding"))
        if digest is None:
            return
        if os.path.exists(_marker_path(root, "c", digest)):
            return
        _retry_cas(
            lambda: update_graph_index(batch_df.sparkSession, sf_dir, batch)
        )
        with open(_marker_path(root, "c", digest), "w") as f:
            f.write("ok\n")

    return (
        raw.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_funnel_progress(
    spark: SparkSession,
    sf_dir: str,
    checkpoint_dir: str,
    queryName: str,
    horizon_hours: int = 24,
):
    """Per-user funnel state machine via ``applyInPandasWithState`` (the
    20th mode): view → click → purchase with earliest-completion
    semantics inside ``horizon_hours``, state = the three stage
    timestamps carried across micro-batches — the streaming twin of the
    batch ``events_funnel_conversion``.

    Each micro-batch's rows are applied in event-time order, so under
    in-order arrival (each batch later than the last) the state machine
    reproduces the batch key's earliest-completion result EXACTLY
    (pinned in tests/test_streaming.py); cross-batch late data advances
    from the locked-in state without retraction — the standard
    no-retraction trade every streaming funnel makes. State is three
    nullable bigints per user, partitioned by user_id in the state
    store: scale-out is by key cardinality, the
    stream_user_running_totals story. Emits one row per touched user
    per micro-batch (update mode) with the reached stage and the exact
    integer gaps from first view to each completed stage — enough to
    reconstruct the batch key's per-stage (users, total_gap_s) rollup
    from the sink alone (the ``stream_funnel`` driver key does).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import LongType, StructField, StructType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")
    ).schema
    raw = (
        spark.readStream.schema(batch_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    _, ts_ns = events_time_exprs(batch_schema)
    events = raw.select(
        "user_id", "event_type", ts_ns.alias("tn")
    )
    h_ns = int(horizon_hours) * 3600 * 1_000_000_000

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("stage", LongType()),
            StructField("gap2_s", LongType()),
            StructField("gap3_s", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("t1", LongType()),
            StructField("t2", LongType()),
            StructField("t3", LongType()),
        ]
    )

    def advance(key, pdfs, state: GroupState):
        t1, t2, t3 = state.get if state.exists else (None, None, None)

        def _ok(v):
            return v is not None and not pd.isna(v)

        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows):
            rows = rows.sort_values("tn", kind="mergesort")
            for et, tn in zip(rows["event_type"], rows["tn"]):
                tn = int(tn)
                if et == "view" and not _ok(t1):
                    t1 = tn
                elif (
                    et == "click"
                    and _ok(t1)
                    and not _ok(t2)
                    and t1 < tn <= t1 + h_ns
                ):
                    t2 = tn
                elif (
                    et == "purchase"
                    and _ok(t2)
                    and not _ok(t3)
                    and t2 < tn <= t2 + h_ns
                ):
                    t3 = tn
        state.update((t1, t2, t3))
        if not _ok(t1):
            return  # no funnel entry yet: nothing to emit
        stage = 3 if _ok(t3) else (2 if _ok(t2) else 1)
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage": [stage],
                "gap2_s": [
                    (int(t2) - int(t1)) // 1_000_000_000 if _ok(t2) else None
                ],
                "gap3_s": [
                    (int(t3) - int(t1)) // 1_000_000_000 if _ok(t3) else None
                ],
            }
        )

    updated = events.groupBy("user_id").applyInPandasWithState(
        advance,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        updated.writeStream.outputMode("update")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
