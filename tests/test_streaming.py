import uuid

from adk_noui_vectordb_spark.operators import relational as rel
from adk_noui_vectordb_spark.streaming.pipeline import (
    stream_events_tumbling,
    stream_incremental_index,
)


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    name = f"ev_{uuid.uuid4().hex[:8]}"
    q = stream_events_tumbling(spark, sf_dir, str(tmp_path / "ckpt"), name)
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in rel.events_tumbling_counts(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_incremental_index_upserts_changed_files(spark, tmp_path):
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    index = str(tmp_path / "index")
    (corpus / "a.txt").write_text("\n".join(f"a{i}" for i in range(60)))
    (corpus / "b.txt").write_text("b0\nb1")

    q = stream_incremental_index(
        spark, str(corpus), index, str(tmp_path / "ck1")
    )
    q.awaitTermination(120)
    rows = {
        (r["element_key"]): r["content"]
        for r in spark.read.parquet(index).collect()
    }
    # a.txt -> 2 chunks (60 lines @ 50), b.txt -> 1
    assert len(rows) == 3
    assert any(k.endswith("a.txt#chunk_1#51") for k in rows)

    # new file arrives; restart with the SAME checkpoint -> only c.txt processed
    (corpus / "c.txt").write_text("c0")
    q2 = stream_incremental_index(
        spark, str(corpus), index, str(tmp_path / "ck1")
    )
    q2.awaitTermination(120)
    rows2 = spark.read.parquet(index).collect()
    keys = {r["element_key"] for r in rows2}
    assert len(rows2) == 4
    assert any(k.endswith("c.txt#chunk_0#1") for k in keys)
    # prior elements survived the incremental upsert
    assert any(k.endswith("a.txt#chunk_0#1") for k in keys)


def test_stateful_running_totals_match_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.sources.tables import load_table
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_user_running_totals,
    )

    q = stream_user_running_totals(
        spark, sf_dir, str(tmp_path / "ckpt_state"), "user_totals"
    )
    q.awaitTermination(120)
    # keep the LAST emitted row per user (update mode may emit per batch)
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM user_totals").collect()
    }
    expected = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, total) in expected.items():
        assert got[uid][0] == n, uid
        assert abs(got[uid][1] - total) < 0.05, (uid, got[uid], total)


def test_stream_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.sources.tables import load_table
    from adk_noui_vectordb_spark.streaming.pipeline import stream_dedup_events

    q = stream_dedup_events(spark, sf_dir, str(tmp_path / "ckpt_dd"), "dedup_counts")
    q.awaitTermination(120)
    got = {
        r.event_type: r.n_events
        for r in spark.sql("SELECT * FROM dedup_counts").collect()
    }
    expected = {
        r.event_type: r.n
        for r in load_table(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expected


def test_session_window_boundary_calibration(spark):
    """Pin Spark's session_window merge semantics at the gap boundary.

    The batch sessionize rule splits when gap > 1800 s. Spark's merge is
    boundary-INCLUSIVE (an event at exactly last_ts + gap extends the
    session), so the streaming gap must be 1800 s, not 1801: with gap=1800,
    a 1800-s silence merges and a 1801-s silence splits — exactly the batch
    predicate. (Round-3 red row: gap=1801 wrongly merged a 1801-s silence.)
    """
    from pyspark.sql import functions as F

    rows = [
        ("u", "2024-01-01 00:00:00"),
        ("u", "2024-01-01 00:30:00"),  # gap = 1800 s -> same session
        ("v", "2024-01-01 00:00:00"),
        ("v", "2024-01-01 00:30:01"),  # gap = 1801 s -> new session
    ]
    df = spark.createDataFrame(rows, "user_id string, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts_sec")
    )
    per_user = (
        df.groupBy(F.session_window("ts_sec", "1800 seconds"), "user_id")
        .count()
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    )
    got = {r["user_id"]: r["n_sessions"] for r in per_user}
    assert got == {"u": 1, "v": 2}


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """The streaming session count must equal the batch gaps-and-islands
    count (split iff second-truncated gap > 1800 s)."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from adk_noui_vectordb_spark.sources.tables import load_table
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_sessionize_events,
    )

    q = stream_sessionize_events(
        spark, sf_dir, str(tmp_path / "ckpt_sess"), "sess_counts"
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT count(*) AS n FROM sess_counts").collect()[0].n

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_timestamp(
            F.date_trunc("second", F.timestamp_micros(F.expr("ts_ns div 1000")))
        ).alias("es"),
    )
    w = Window.partitionBy("user_id").orderBy("es")
    batch = (
        ev.withColumn("prev", F.lag("es").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull() | (F.col("es") - F.col("prev") > 1800)).cast(
                "int"
            ),
        )
        .agg(F.sum("new_sess").alias("n"))
        .collect()[0]
        .n
    )
    assert streamed == batch


def test_stream_stream_join_matches_batch(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.sources.tables import load_table
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_purchase_click_join,
    )

    q = stream_purchase_click_join(
        spark, sf_dir, str(tmp_path / "ckpt_ss"), "pc_join"
    )
    q.awaitTermination(180)
    got = {
        (r.p_id, r.c_id)
        for r in spark.sql("SELECT * FROM pc_join").collect()
    }
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("p_id"),
        F.col("ts_ns").alias("p_ns"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("c_id"),
        F.col("ts_ns").alias("c_ns"),
    )
    expected = {
        (r.p_id, r.c_id)
        for r in p.join(
            c,
            (F.col("pu") == F.col("cu"))
            & (F.col("c_ns") <= F.col("p_ns"))
            & (F.col("c_ns") >= F.col("p_ns") - 3_600_000_000_000),
        ).collect()
    }
    assert got == expected


def test_stream_text_index_ingest_equals_fresh_build(spark, sf_dir, tmp_path):
    """Streaming document files into the inverted index via the
    incremental bucket-rewrite must converge to the same index a
    from-scratch build produces over base + streamed docs — and a
    second availableNow run ingests nothing new (checkpoint exactly-
    once)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import invindex
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_text_index_ingest,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "base")
    all_dir = str(tmp_path / "all")
    stream_dir = str(tmp_path / "incoming")
    os.makedirs(base_dir), os.makedirs(all_dir), os.makedirs(stream_dir)
    docs.filter(F.col("doc_id") % 4 != 0).write.parquet(
        os.path.join(base_dir, "documents.parquet")
    )
    docs.write.parquet(os.path.join(all_dir, "documents.parquet"))
    invindex.build_text_index(spark, base_dir)
    # two "arriving" files -> two entries for the file stream
    docs.filter(F.col("doc_id") % 8 == 0).select("doc_id", "text").write.parquet(
        os.path.join(stream_dir, "b1")
    )
    docs.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") % 8 != 0)).select(
        "doc_id", "text"
    ).write.parquet(os.path.join(stream_dir, "b2"))

    q = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ix")
    )
    q.awaitTermination(180)

    root_inc = invindex.build_text_index(spark, base_dir)  # same root, updated
    root_all = invindex.build_text_index(spark, all_dir)

    def postings(root):
        return {
            (r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in spark.read.parquet(os.path.join(root, "postings")).collect()
        }

    assert postings(root_inc) == postings(root_all)
    s_inc = spark.read.parquet(os.path.join(root_inc, "stats")).head()
    s_all = spark.read.parquet(os.path.join(root_all, "stats")).head()
    assert (s_inc["n_docs"], s_inc["tot_dl"]) == (s_all["n_docs"], s_all["tot_dl"])

    # replay: checkpoint already covers both files -> index unchanged
    before = postings(root_inc)
    q2 = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ix")
    )
    q2.awaitTermination(180)
    assert postings(root_inc) == before

    # at-least-once re-DELIVERY (not just re-run): wipe the checkpoint so
    # Structured Streaming re-delivers every file as fresh micro-batches.
    # Markers are VERSION-scoped since r10 (ADVICE r9: a marker must not
    # outlive the version that wrote it, or a delete-then-reingest is
    # silently skipped), so a reset AFTER the version moved re-applies —
    # and the replace semantics must leave the index CONTENT-identical.
    import shutil

    shutil.rmtree(str(tmp_path / "ckpt_ix"))
    q3 = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ix")
    )
    q3.awaitTermination(180)
    assert postings(invindex.build_text_index(spark, base_dir)) == before

    # ADVICE r8 regression: after ANOTHER checkpoint reset, a genuinely
    # NEW batch re-uses the old batch_ids (numbering restarts at 0) — an
    # id-keyed marker would silently skip it; the content key must not.
    shutil.rmtree(str(tmp_path / "ckpt_ix"))
    spark.createDataFrame(
        [(30_000_000, "freshly-streamed-term")], "doc_id bigint, text string"
    ).write.parquet(os.path.join(stream_dir, "b3"))
    q4 = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ix")
    )
    q4.awaitTermination(180)
    cur = invindex.build_text_index(spark, base_dir)  # resolve new version
    p_now = postings(cur)
    assert p_now[("freshly-streamed-term", 30_000_000)] == (1, 1)
    assert {k: v for k, v in p_now.items() if k[1] != 30_000_000} == before


def test_stream_vector_index_ingest_serves_next_probe(spark, sf_dir, tmp_path):
    """Embedding batches streamed into the RP-LSH index must converge to
    the same band table a fresh build over base + streamed vectors
    produces, be immediately servable (the stream_text_index_ingest
    contract on the vector side), and replay as a no-op across both a
    checkpoint re-run and a checkpoint reset."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_vector_index_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "vbase")
    all_dir = str(tmp_path / "vall")
    stream_dir = str(tmp_path / "vincoming")
    os.makedirs(base_dir), os.makedirs(all_dir), os.makedirs(stream_dir)
    emb.filter(F.col("vec_id") % 4 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    emb.write.parquet(os.path.join(all_dir, "embeddings.parquet"))
    ann.build_rp_index(spark, base_dir)
    emb.filter(F.col("vec_id") % 8 == 0).select("vec_id", "embedding").write.parquet(
        os.path.join(stream_dir, "b1")
    )
    emb.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") % 8 != 0)).select(
        "vec_id", "embedding"
    ).write.parquet(os.path.join(stream_dir, "b2"))

    q = stream_vector_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_vx")
    )
    q.awaitTermination(180)

    def bands(p):
        return {
            (r["band"], r["band_key"], r["vec_id"])
            for r in spark.read.parquet(p).collect()
        }

    got = bands(ann.build_rp_index(spark, base_dir))
    want = bands(ann.build_rp_index(spark, all_dir))
    assert got == want

    # immediately servable: vec 0 (streamed in b1) answers a probe
    top = ann.ann_rp_lsh_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    assert len(top) == 3

    # checkpoint reset + re-delivery: content markers keep it a no-op
    shutil.rmtree(str(tmp_path / "ckpt_vx"))
    q2 = stream_vector_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_vx")
    )
    q2.awaitTermination(180)
    assert bands(ann.build_rp_index(spark, base_dir)) == want


def test_stream_ivf_index_ingest_serves_next_probe(spark, sf_dir, tmp_path):
    """Embedding batches streamed into the IVF index must match a
    frozen-centroid re-assignment of base + streamed vectors, and a
    streamed clone of vec 0 must be served by the next probe."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_ivf_index_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "ivfsbase")
    stream_dir = str(tmp_path / "ivfsin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    emb.filter(F.col("vec_id") % 4 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    assign_p, cents_p = ann.build_ivf_index(spark, base_dir)
    cent_rows = sorted(
        (
            {"cluster": r["cluster"], "c": list(r["c"])}
            for r in spark.read.parquet(cents_p).collect()
        ),
        key=lambda r: r["cluster"],
    )
    emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "embedding").write.parquet(
        os.path.join(stream_dir, "b1")
    )
    spark.createDataFrame(
        [(987654325, [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]])],
        "vec_id bigint, embedding array<double>",
    ).write.parquet(os.path.join(stream_dir, "b2"))

    q = stream_ivf_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ivfx")
    )
    q.awaitTermination(180)

    assign_p2, _ = ann.build_ivf_index(spark, base_dir)
    got = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(assign_p2).collect()
    }
    combined = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).unionByName(
        emb.filter(F.col("vec_id") == 0).select(
            F.lit(987654325).cast("bigint").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    want = {
        r["vec_id"]: r["cluster"]
        for r in ann.assign_to_centroids(combined, cent_rows).collect()
    }
    assert got == want
    top = ann.ann_ivf_trained_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 987654325
    assert top[0]["sim"] == 1.0


def test_stream_gated_ingest_rejects_dups_and_admits_fresh(
    spark, sf_dir, tmp_path
):
    """The composed pipeline: a streamed batch containing a clone of an
    indexed doc plus fresh documents must log the clone to the decision
    trail and admit ONLY the fresh docs into both indexes — after which
    a SECOND batch cloning one of those fresh docs is rejected too
    (the index the gate consults includes prior admissions)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import dedup, invindex
    from adk_noui_vectordb_spark.streaming.pipeline import stream_gated_ingest

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "gstream")
    stream_dir = str(tmp_path / "gincoming")
    dec_dir = str(tmp_path / "gdecisions")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)
    invindex.build_text_index(spark, base_dir)

    clone_text = docs.filter(F.col("doc_id") == 5).head()["text"]
    fresh1 = "wholly original ingest sentence alpha bravo charlie delta"
    spark.createDataFrame(
        [(8_000_001, clone_text), (8_000_002, fresh1)],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_gated_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "gckpt"), dec_dir
    )
    q.awaitTermination(180)

    decisions = {
        (r["new_doc_id"], r["dup_of"])
        for r in spark.read.parquet(dec_dir).collect()
    }
    assert (8_000_001, 5) in decisions
    assert not any(nd == 8_000_002 for nd, _ in decisions)
    # admitted doc is in BOTH indexes; the clone is in NEITHER
    sigs = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    }
    assert 8_000_002 in sigs and 8_000_001 not in sigs
    ver = invindex.build_text_index(spark, base_dir)
    docs_comp = {
        r["doc_id"]
        for r in spark.read.schema(invindex.DOCS_SCHEMA)
        .parquet(os.path.join(ver, "docs"))
        .collect()
    }
    assert 8_000_002 in docs_comp and 8_000_001 not in docs_comp

    # second wave: cloning the PREVIOUSLY ADMITTED doc must be rejected
    spark.createDataFrame(
        [(8_000_003, fresh1)], "doc_id bigint, text string"
    ).write.parquet(os.path.join(stream_dir, "b2"))
    q2 = stream_gated_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "gckpt"), dec_dir
    )
    q2.awaitTermination(180)
    decisions2 = {
        (r["new_doc_id"], r["dup_of"])
        for r in spark.read.parquet(dec_dir).collect()
    }
    assert (8_000_003, 8_000_002) in decisions2
    sigs2 = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    }
    assert 8_000_003 not in sigs2


def test_stream_gated_ingest_replay_after_partial_apply(
    spark, sf_dir, tmp_path, monkeypatch
):
    """ADVICE r9 (high): a crash AFTER update_minhash_index but BEFORE
    update_text_index must not poison the replay. Pre-fix, the
    redelivered batch's docs were already in the MinHash index and
    matched THEMSELVES (and intra-batch near-dups admitted by contract
    cross-rejected): bogus self-dup audit rows, docs dropped, the two
    indexes permanently divergent. The batch-exclusion gate makes the
    replay decide identically to the first attempt and converge both."""
    import os

    from adk_noui_vectordb_spark.operators import dedup, invindex
    from adk_noui_vectordb_spark.streaming import pipeline as sp

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "gcrash")
    stream_dir = str(tmp_path / "gcrashin")
    dec_dir = str(tmp_path / "gcrashdec")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)
    invindex.build_text_index(spark, base_dir)

    twin_text = "crash recovery twin sentence kilo lima mike november oscar"
    batch_ids = {9_000_001, 9_000_002, 9_000_003}
    spark.createDataFrame(
        [
            (9_000_001, twin_text),   # intra-batch near-dups: admitted
            (9_000_002, twin_text),   # by contract (no intra gate)
            (9_000_003, "wholly distinct crash recovery paragraph papa"),
        ],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(stream_dir, "b1"))

    real_update = invindex.update_text_index

    def crashing(spark_, sf, batch):
        raise RuntimeError("injected crash between the two index updates")

    monkeypatch.setattr(invindex, "update_text_index", crashing)
    q = sp.stream_gated_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "gcrashck"), dec_dir
    )
    try:
        q.awaitTermination(180)
    except Exception:
        pass
    # crash window reached: MinHash updated, text index NOT, marker absent
    sigs_mid = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    }
    assert batch_ids <= sigs_mid

    monkeypatch.setattr(invindex, "update_text_index", real_update)
    q2 = sp.stream_gated_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "gcrashck"), dec_dir
    )
    q2.awaitTermination(180)

    # converged: every batch doc serves from BOTH indexes
    ver = invindex.build_text_index(spark, base_dir)
    text_ids = {
        r["doc_id"]
        for r in spark.read.schema(invindex.DOCS_SCHEMA)
        .parquet(os.path.join(ver, "docs"))
        .collect()
    }
    assert batch_ids <= text_ids
    # and the audit trail holds no self- or intra-batch-dup rows
    decisions = spark.read.schema(
        "new_doc_id bigint, dup_of bigint, matches bigint"
    ).parquet(dec_dir).collect()
    for r in decisions:
        assert r["new_doc_id"] != r["dup_of"]
        assert not (
            r["new_doc_id"] in batch_ids and r["dup_of"] in batch_ids
        )


def test_stream_gated_ingest_intra_batch_gate(spark, sf_dir, tmp_path):
    """VERDICT r9 next #8: with intra_batch_gate=True, two identical new
    docs in ONE batch admit only the md5-min canonical copy; the other
    lands in the audit trail naming its twin."""
    import hashlib
    import os

    from adk_noui_vectordb_spark.operators import dedup, invindex
    from adk_noui_vectordb_spark.streaming.pipeline import stream_gated_ingest

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "gintra")
    stream_dir = str(tmp_path / "gintrain")
    dec_dir = str(tmp_path / "gintradec")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)
    invindex.build_text_index(spark, base_dir)

    twin_text = "same crawl page fetched twice quebec romeo sierra tango"
    a, b = 7_100_001, 7_100_002
    keep, drop = sorted(
        (a, b), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    spark.createDataFrame(
        [(a, twin_text), (b, twin_text), (7_100_003, "unique uniform victor")],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_gated_ingest(
        spark,
        base_dir,
        stream_dir + "/*",
        str(tmp_path / "gintrack"),
        dec_dir,
        intra_batch_gate=True,
    )
    q.awaitTermination(180)

    decisions = {
        (r["new_doc_id"], r["dup_of"])
        for r in spark.read.schema(
            "new_doc_id bigint, dup_of bigint, matches bigint"
        ).parquet(dec_dir).collect()
    }
    assert (drop, keep) in decisions
    sigs = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    }
    assert keep in sigs and 7_100_003 in sigs
    assert drop not in sigs


def test_stream_ingest_reapplies_after_delete(spark, sf_dir, tmp_path):
    """ADVICE r9 (medium): a content marker must not outlive the version
    that wrote it. Ingest a batch, DELETE its doc from the index, then
    redeliver the same content through a fresh checkpoint — the pre-r10
    version-less digest markers silently skipped it, leaving the deleted
    doc unrecoverable; version-scoped markers re-apply it. gc_versions
    also sweeps markers keyed to non-current versions."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import invindex
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_text_index_ingest,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "resur")
    stream_dir = str(tmp_path / "resurin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    invindex.build_text_index(spark, base_dir)
    spark.createDataFrame(
        [(6_200_001, "resurrect this document whiskey xray yankee")],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "resurck1")
    )
    q.awaitTermination(180)

    def doc_ids():
        ver = invindex.build_text_index(spark, base_dir)
        return {
            r["doc_id"]
            for r in spark.read.schema(invindex.DOCS_SCHEMA)
            .parquet(os.path.join(ver, "docs"))
            .collect()
        }

    assert 6_200_001 in doc_ids()
    invindex.delete_from_text_index(
        spark, base_dir, spark.createDataFrame([(6_200_001,)], "doc_id bigint")
    )
    assert 6_200_001 not in doc_ids()

    # redelivery of the SAME content via a fresh checkpoint must apply
    q2 = stream_text_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "resurck2")
    )
    q2.awaitTermination(180)
    assert 6_200_001 in doc_ids()

    # marker hygiene: everything under applied/ is keyed to the current
    # version (stale markers were swept by gc_versions)
    root = invindex.text_index_root(base_dir)
    from adk_noui_vectordb_spark.sources.versioning import current_name

    cur = current_name(root)
    applied = os.path.join(root, "applied")
    for f in os.listdir(applied):
        assert f.split(".")[1] == cur, f


def test_stream_ivfpq_index_ingest_serves_next_probe(spark, sf_dir, tmp_path):
    """Embedding batches streamed into the residual-IVFPQ index (r10):
    the plist must equal a frozen-centroid/frozen-codebook residual
    re-encode of base + streamed vectors, and a streamed exact clone of
    vec 0 must appear in the next probe's top-k (its residual is
    identical, so it ranks beside the original)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_ivfpq_index_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "pqsbase")
    stream_dir = str(tmp_path / "pqsin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    emb.filter(F.col("vec_id") % 4 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    v0 = ann.build_ivfpq_index(spark, base_dir)
    cent_rows, pqcent_rows = ann._ivfpq_trained_rows(spark, v0)
    cents_dicts = [{"cluster": cl, "c": c} for cl, c in cent_rows]

    emb.filter(F.col("vec_id") % 4 == 0).select("vec_id", "embedding").write.parquet(
        os.path.join(stream_dir, "b1")
    )
    clone_emb = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    spark.createDataFrame(
        [(987654325, clone_emb)], "vec_id bigint, embedding array<double>"
    ).write.parquet(os.path.join(stream_dir, "b2"))

    q = stream_ivfpq_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_ivfpqx")
    )
    q.awaitTermination(180)

    v1 = ann.build_ivfpq_index(spark, base_dir)
    got = {
        tuple(r)
        for r in spark.read.schema(ann.IVFPQ_PLIST_SCHEMA)
        .parquet(os.path.join(v1, "plist"))
        .collect()
    }
    combined = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).unionByName(
        emb.filter(F.col("vec_id") == 0).select(
            F.lit(987654325).cast("bigint").alias("vec_id"),
            F.col("embedding").cast("array<double>").alias("emb"),
        )
    )
    all_assign = ann.assign_to_centroids(combined, cents_dicts).select(
        "vec_id", "cluster"
    )
    cents_df = spark.createDataFrame(
        [(int(cl), [float(x) for x in c]) for cl, c in cent_rows],
        "cluster int, c array<double>",
    )
    want = {
        tuple(r)
        for r in ann.pq_encode_for(
            ann._residual_frame(combined, all_assign, cents_df),
            pqcent_rows,
            ann.PQ_M,
        )
        .join(all_assign, "vec_id")
        .select("vec_id", "subspace", "code", "cluster")
        .collect()
    }
    assert got == want

    # the streamed clone serves: identical residual -> adc ties with
    # vec 0, exact rerank puts it at distance 0 from a vec-0 query
    top = {
        r["vec_id"]
        for r in ann.ann_ivfpq_topk(
            spark, base_dir, query_vec_id=0, topk=10, nprobe=2, candidates=50
        ).collect()
    }
    assert 987654325 in top


def test_streamed_doc_becomes_phrase_searchable(spark, sf_dir, tmp_path):
    """End-to-end positions maintenance: a doc admitted through the
    gated ingest stream is immediately phrase-searchable and
    highlightable — the positions component rides the same streaming
    upsert as postings (nothing special-cases it)."""
    import os

    from adk_noui_vectordb_spark.operators import dedup, invindex
    from adk_noui_vectordb_spark.streaming.pipeline import stream_gated_ingest

    base_dir = str(tmp_path / "pstream")
    stream_dir = str(tmp_path / "pincoming")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    spark.createDataFrame(
        [(0, "plain seed document text", "en", "t", 24)],
        "doc_id bigint, text string, lang string, source string, n_chars int",
    ).write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)
    invindex.build_text_index(spark, base_dir)

    spark.createDataFrame(
        [(9_000_001, "zulu yankee zulu yankee xray")],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(stream_dir, "b1"))
    q = stream_gated_ingest(
        spark,
        base_dir,
        stream_dir + "/*",
        str(tmp_path / "pckpt"),
        str(tmp_path / "pdecisions"),
    )
    q.awaitTermination(180)

    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in invindex.phrase_topk_served(
            spark, base_dir, phrase=("zulu", "yankee")
        ).collect()
    }
    assert got == {9_000_001: 2}, got
    hl = invindex.search_highlight_served(
        spark, base_dir, terms=("zulu", "yankee"), width=4
    ).collect()
    assert [(r["doc_id"], r["win_start"], r["n_hits"]) for r in hl] == [
        (9_000_001, 1, 4)
    ]


def test_stream_collection_ingest_serves_next_query(spark, tmp_path):
    """Batches streamed into the Collection facade serve one micro-batch
    later; a resubmitted id is replaced; redelivery after a checkpoint
    reset is a content-digest no-op."""
    import os
    import shutil

    import numpy as np

    from adk_noui_vectordb_spark.api.collection import Collection
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_collection_ingest,
    )

    rng = np.random.default_rng(77)
    root = str(tmp_path / "ccoll")
    stream_dir = str(tmp_path / "cincoming")
    os.makedirs(stream_dir)

    def rows(ids, mat, lang="en"):
        return spark.createDataFrame(
            [
                (i, [float(x) for x in mat[j]], f"doc {i}", lang)
                for j, i in enumerate(ids)
            ],
            "id string, embedding array<double>, document string, lang string",
        )

    m1 = rng.normal(size=(3, 8)).round(3)
    rows(["s1", "s2", "s3"], m1).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_collection_ingest(
        spark, root, stream_dir + "/*", str(tmp_path / "ckpt_c1"),
        schema="id string, embedding array<double>, document string, lang string",
    )
    q.awaitTermination(180)

    coll = Collection(spark, root)
    assert coll.count() == 3
    top = coll.query([float(x) for x in m1[1]], n_results=1).head()
    assert top["id"] == "s2" and top["distance"] == 0.0

    # second batch replaces s2 and adds s4
    m2 = rng.normal(size=(2, 8)).round(3)
    rows(["s2", "s4"], m2, lang="fr").write.parquet(
        os.path.join(stream_dir, "b2")
    )
    q = stream_collection_ingest(
        spark, root, stream_dir + "/*", str(tmp_path / "ckpt_c1"),
        schema="id string, embedding array<double>, document string, lang string",
    )
    q.awaitTermination(180)
    assert coll.count() == 4
    assert coll.get(ids=["s2"]).head()["lang"] == "fr"
    top = coll.query([float(x) for x in m2[0]], n_results=1).head()
    assert top["id"] == "s2" and top["distance"] == 0.0

    # checkpoint reset: full redelivery must be a no-op
    ver_before = coll.versions()
    shutil.rmtree(str(tmp_path / "ckpt_c1"))
    q = stream_collection_ingest(
        spark, root, stream_dir + "/*", str(tmp_path / "ckpt_c2"),
        schema="id string, embedding array<double>, document string, lang string",
    )
    q.awaitTermination(180)
    assert coll.count() == 4
    assert coll.get(ids=["s2"]).head()["lang"] == "fr"


def test_stream_gated_collection_ingest_curates_the_facade(
    spark, sf_dir, tmp_path
):
    """14th mode: a streamed batch carrying a near-clone of an indexed
    corpus doc plus a fresh doc admits ONLY the fresh row into the
    Collection facade (and the MinHash gate index), logs the rejection,
    and a fresh-checkpoint replay converges to the same state."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.api.collection import Collection, _sid_py
    from adk_noui_vectordb_spark.operators import dedup
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_gated_collection_ingest,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base_dir = str(tmp_path / "gcbase")
    stream_dir = str(tmp_path / "gcin")
    dec_dir = str(tmp_path / "gcdec")
    coll_root = str(tmp_path / "gccoll")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    docs.write.parquet(os.path.join(base_dir, "documents.parquet"))
    dedup.build_minhash_index(spark, base_dir)

    clone_text = docs.filter(F.col("doc_id") == 5).head()["text"]
    fresh = "wholly original facade sentence echo foxtrot golf hotel india"
    emb = [float(x) / 10.0 for x in range(8)]
    spark.createDataFrame(
        [("dup-a", emb, clone_text, "en"), ("new-b", emb, fresh, "en")],
        "id string, embedding array<double>, document string, lang string",
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_gated_collection_ingest(
        spark, base_dir, coll_root, stream_dir + "/*",
        str(tmp_path / "gcckpt1"), dec_dir,
    )
    q.awaitTermination(180)

    coll = Collection(spark, coll_root)
    got = {r["id"] for r in coll.get().collect()}
    assert got == {"new-b"}, got  # the clone never entered the facade
    decisions = {
        (r["new_doc_id"], r["dup_of"])
        for r in spark.read.parquet(dec_dir).collect()
    }
    assert (_sid_py("dup-a"), 5) in decisions
    assert not any(nd == _sid_py("new-b") for nd, _ in decisions)
    # the admission entered the gate index under the surrogate identity
    sigs = {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    }
    assert _sid_py("new-b") in sigs and _sid_py("dup-a") not in sigs

    # a second wave cloning the ADMITTED doc is rejected against it
    spark.createDataFrame(
        [("dup-of-b", emb, fresh, "en")],
        "id string, embedding array<double>, document string, lang string",
    ).write.parquet(os.path.join(stream_dir, "b2"))
    q2 = stream_gated_collection_ingest(
        spark, base_dir, coll_root, stream_dir + "/*",
        str(tmp_path / "gcckpt1"), dec_dir,
    )
    q2.awaitTermination(180)
    assert {r["id"] for r in coll.get().collect()} == {"new-b"}
    decisions2 = {
        (r["new_doc_id"], r["dup_of"])
        for r in spark.read.parquet(dec_dir).collect()
    }
    assert (_sid_py("dup-of-b"), _sid_py("new-b")) in decisions2

    # fresh-checkpoint replay of EVERYTHING converges (the gate decides
    # identically; replaces are idempotent). The applied markers are
    # DELETED first — the crash-window replay (ADVICE r11): every batch
    # re-gates and re-writes its decisions, which must OVERWRITE the
    # content-keyed partition, never append duplicates.
    root = dedup.minhash_index_root(base_dir)
    for f in os.listdir(os.path.join(root, "applied")):
        if f.startswith("gc."):
            os.unlink(os.path.join(root, "applied", f))
    q3 = stream_gated_collection_ingest(
        spark, base_dir, coll_root, stream_dir + "/*",
        str(tmp_path / "gcckpt2"), dec_dir,
    )
    q3.awaitTermination(180)
    assert {r["id"] for r in coll.get().collect()} == {"new-b"}
    dup_rows = (
        spark.read.parquet(dec_dir)
        .groupBy("new_doc_id", "dup_of")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_rows == 0, "crash-window replay duplicated audit rows"
    assert {
        r["doc_id"]
        for r in spark.read.schema(dedup.MINHASH_SIGS_SCHEMA)
        .parquet(
            os.path.join(dedup.build_minhash_index(spark, base_dir), "sigs")
        )
        .collect()
    } == sigs


def test_stream_graph_index_ingest_serves_next_beam(spark, sf_dir, tmp_path):
    """15th mode (r12): embedding batches streamed into the navigable
    graph become beam-reachable — a streamed clone of vec 0 appears in
    the next ann_graph_topk(query=0) — and a fresh-checkpoint replay of
    everything converges (the ADD-only guard's fully-present no-op +
    content markers make re-delivery idempotent)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import graph_ann as ga
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_graph_index_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "gsbase")
    stream_dir = str(tmp_path / "gsin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    ga.build_graph_index(spark, base_dir)

    v0 = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    spark.createDataFrame(
        [(987654331, v0)], "vec_id bigint, embedding array<double>"
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_graph_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_g1")
    )
    q.awaitTermination(180)

    got = {
        r["vec_id"]
        for r in ga.ann_graph_topk(spark, base_dir, query_vec_id=0, k=5).collect()
    }
    assert 987654331 in got, got  # the exact clone ranks first or near

    # fresh-checkpoint replay: the batch is fully present -> no-op path
    q2 = stream_graph_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_g2")
    )
    q2.awaitTermination(180)
    got2 = {
        r["vec_id"]
        for r in ga.ann_graph_topk(spark, base_dir, query_vec_id=0, k=5).collect()
    }
    assert got2 == got
    checks = {c[0]: c[1] for c in ga.fsck_graph_index(spark, base_dir)}
    assert all(checks.values()), checks


def test_stream_binq_ivf_index_ingest_serves_next_probe(spark, sf_dir, tmp_path):
    """17th mode: an embedding batch streamed into the binary-IVF index
    becomes probe-reachable (an exact clone of the query vector lands at
    Hamming 0 and wins the refine), a fresh-checkpoint replay converges
    (REPLACE rewrites identical rows), and fsck stays green."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import quantize as qz
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_binq_ivf_index_ingest,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "bqsbase")
    stream_dir = str(tmp_path / "bqsin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    qz.build_binq_ivf_index(spark, base_dir)

    v0 = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    spark.createDataFrame(
        [(987654341, v0)], "vec_id bigint, embedding array<double>"
    ).write.parquet(os.path.join(stream_dir, "b1"))

    q = stream_binq_ivf_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_bq1")
    )
    q.awaitTermination(180)
    got = [
        r["vec_id"]
        for r in qz.ann_binq_ivf_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    ]
    assert 987654341 in got, got

    q2 = stream_binq_ivf_index_ingest(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_bq2")
    )
    q2.awaitTermination(180)
    got2 = [
        r["vec_id"]
        for r in qz.ann_binq_ivf_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    ]
    assert got2 == got
    checks = {c[0]: c[1] for c in qz.fsck_binq_ivf_index(spark, base_dir)}
    assert all(checks.values()), checks


def test_stream_graph_index_deletes_stop_surfacing(spark, sf_dir, tmp_path):
    """16th mode: streamed id batches tombstone the graph — the deleted
    id stops surfacing in the tombstone-aware emission path while the
    blind beam still routes through it — and a fresh-checkpoint replay
    converges (fully-tombstoned batches no-op)."""
    import os

    from adk_noui_vectordb_spark.operators import graph_ann as ga
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_graph_index_deletes,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "gdbase")
    stream_dir = str(tmp_path / "gdin")
    os.makedirs(base_dir), os.makedirs(stream_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    cur0 = ga.build_graph_index(spark, base_dir)

    # delete the blind search's current best hit for query 0
    visited = ga._beam_visited(spark, cur0, 0, beam=8, rounds=3)
    best = sorted(visited.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    spark.createDataFrame([(best,)], "vec_id bigint").write.parquet(
        os.path.join(stream_dir, "b1")
    )
    q = stream_graph_index_deletes(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_d1")
    )
    q.awaitTermination(180)

    cur1 = ga.build_graph_index(spark, base_dir)
    assert ga._tombstoned_among(spark, cur1, [best]) == {best}
    # blind traversal unchanged; emission filters
    assert ga._beam_visited(spark, cur1, 0, beam=8, rounds=3) == visited

    # fresh-checkpoint replay: fully-tombstoned batch -> no-op path
    q2 = stream_graph_index_deletes(
        spark, base_dir, stream_dir + "/*", str(tmp_path / "ckpt_d2")
    )
    q2.awaitTermination(180)
    assert ga.build_graph_index(spark, base_dir) == cur1
    checks = {c[0]: c[1] for c in ga.fsck_graph_index(spark, base_dir)}
    assert all(checks.values()), checks


def test_stream_containment_index_ingest_gates_next_probe(spark, tmp_path):
    """18th mode: a document batch streamed into the containment index
    becomes gate-visible (a clone probe surfaces the streamed doc), a
    fresh-checkpoint replay converges without growing the index (the
    content-digest marker skips the identical batch), and fsck stays
    green including the drift advisory."""
    import os

    from adk_noui_vectordb_spark.operators.dedup import (
        build_containment_index,
        containment_index_root,
        dedup_containment_gate_for,
        fsck_containment_index,
    )
    from adk_noui_vectordb_spark.sources import versioning as vn
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_containment_index_ingest,
    )

    t1 = "alpha beta gamma delta epsilon zeta"
    base = str(tmp_path / "csbase")
    stream_dir = str(tmp_path / "csin")
    os.makedirs(base), os.makedirs(stream_dir)
    spark.createDataFrame(
        [(1, t1), (2, " ".join(f"x{i}" for i in range(10)))],
        "doc_id bigint, text string",
    ).write.parquet(os.path.join(base, "documents.parquet"))
    build_containment_index(spark, base)

    def gate(text):
        b = spark.createDataFrame([(999, text)], "doc_id bigint, text string")
        return {
            r["dup_of"]
            for r in dedup_containment_gate_for(spark, base, b).collect()
        }

    assert gate(t1) == {1}
    spark.createDataFrame(
        [(100, t1)], "doc_id bigint, text string"
    ).write.parquet(os.path.join(stream_dir, "b1"))
    q = stream_containment_index_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_c1")
    )
    q.awaitTermination(180)
    assert gate(t1) == {1, 100}
    ver1 = os.path.basename(vn.current_dir(containment_index_root(base)))
    # fresh checkpoint, same files: the digest marker must no-op — the
    # gate answer holds and no new version commits
    q2 = stream_containment_index_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_c2")
    )
    q2.awaitTermination(180)
    assert gate(t1) == {1, 100}
    ver2 = os.path.basename(vn.current_dir(containment_index_root(base)))
    assert ver2 == ver1, (ver1, ver2)
    got = fsck_containment_index(spark, base)
    assert all(ok for _, ok, _ in got), got


def test_stream_li_index_ingest_serves_next_query(spark, tmp_path):
    """19th mode: a document batch streamed into the li_index becomes
    serve-visible (the streamed doc carrying the query words wins the
    next query), a fresh-checkpoint replay converges without a new
    version (content-digest no-op), and fsck stays green."""
    import os

    from adk_noui_vectordb_spark.operators.embed import (
        build_li_index,
        fsck_li_index,
        late_interaction_topk_served,
        li_index_root,
    )
    from adk_noui_vectordb_spark.sources import versioning as vn
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_li_index_ingest,
    )

    base = str(tmp_path / "lisbase")
    stream_dir = str(tmp_path / "lisin")
    os.makedirs(base), os.makedirs(stream_dir)
    spark.createDataFrame(
        [(1, " ".join(f"z{i}" for i in range(8)), "en")],
        "doc_id bigint, text string, lang string",
    ).write.parquet(os.path.join(base, "documents.parquet"))
    build_li_index(spark, base)

    def winner():
        r = late_interaction_topk_served(spark, base, k=1).head()
        return r["doc_id"] if r is not None else None

    assert winner() == 1
    spark.createDataFrame(
        [(100, "spark query filter join pad pad pad pad", "en")],
        "doc_id bigint, text string, lang string",
    ).write.parquet(os.path.join(stream_dir, "b1"))
    q = stream_li_index_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_li1")
    )
    q.awaitTermination(180)
    assert winner() == 100
    ver1 = os.path.basename(vn.current_dir(li_index_root(base)))
    q2 = stream_li_index_ingest(
        spark, base, stream_dir + "/*", str(tmp_path / "ckpt_li2")
    )
    q2.awaitTermination(180)
    assert winner() == 100
    ver2 = os.path.basename(vn.current_dir(li_index_root(base)))
    assert ver2 == ver1, (ver1, ver2)
    got = fsck_li_index(spark, base)
    assert all(ok for _, ok, _ in got), got


def test_stream_funnel_matches_batch(spark, sf_dir, tmp_path):
    """20th mode: the stateful per-user funnel over the whole events
    file converges to the batch events_funnel_conversion result —
    same per-stage user counts and exact integer gap totals."""
    from pyspark.sql import functions as F  # noqa: F401

    from adk_noui_vectordb_spark.operators.relational import (
        events_funnel_conversion,
    )
    from adk_noui_vectordb_spark.streaming.pipeline import (
        stream_funnel_progress,
    )

    q = stream_funnel_progress(
        spark, sf_dir, str(tmp_path / "ckpt_funnel"), "funnel_prog"
    )
    q.awaitTermination(120)
    # latest emission per user (update mode re-emits as state advances)
    per_user = {
        r.user_id: (r.stage, r.gap2_s, r.gap3_s)
        for r in spark.sql("SELECT * FROM funnel_prog").collect()
    }
    got = {
        "1_view": (len(per_user), 0),
        "2_click": (
            sum(1 for s, _, _ in per_user.values() if s >= 2),
            sum(g2 for s, g2, _ in per_user.values() if s >= 2),
        ),
        "3_purchase": (
            sum(1 for s, _, _ in per_user.values() if s == 3),
            sum(g3 for s, _, g3 in per_user.values() if s == 3),
        ),
    }
    batch = {
        r["stage"]: (r["users"], r["total_gap_s"])
        for r in events_funnel_conversion(spark, sf_dir).collect()
    }
    assert got == batch, (got, batch)
