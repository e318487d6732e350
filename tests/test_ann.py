"""Approximate-ANN quality gates (BASELINE.md: recall@10 >= 0.9 vs brute
force). The driver can only rows-check LSH, so recall is enforced here."""

import os

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators.ann import ann_ivf_topk, ann_lsh_topk
from adk_noui_vectordb_spark.operators.knn import knn_topk, make_query_from_vec
from adk_noui_vectordb_spark.sources.tables import load_table


def _exact_topk_ids(spark, sf_dir, query_vec_id, k):
    emb = load_table(spark, sf_dir, "embeddings")
    df = knn_topk(emb, make_query_from_vec(emb, query_vec_id), k=k)
    return [r["vec_id"] for r in df.collect()]


def test_lsh_recall_at_10(spark, sf_dir):
    recalls = []
    for qid in (0, 1, 2):
        exact = set(_exact_topk_ids(spark, sf_dir, qid, 10))
        approx = {
            r["vec_id"]
            for r in ann_lsh_topk(spark, sf_dir, query_vec_id=qid, k=10).collect()
        }
        recalls.append(len(exact & approx) / 10)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, f"LSH recall@10 {avg} < 0.9 (per-query {recalls})"


def test_rp_lsh_band_table_shape(spark, sf_dir):
    """Every vector gets exactly RP_BANDS band rows with keys in
    [0, 2^RP_BAND_BITS)."""
    from adk_noui_vectordb_spark.operators.ann import (
        RP_BAND_BITS,
        RP_BANDS,
        rp_lsh_band_rows,
    )

    bands = rp_lsh_band_rows(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert bands.count() == n * RP_BANDS
    assert bands.select("vec_id", "band").distinct().count() == n * RP_BANDS
    bad = bands.filter(
        (F.col("band_key") < 0) | (F.col("band_key") >= (1 << RP_BAND_BITS))
    ).count()
    assert bad == 0


def test_rp_lsh_results_are_candidate_restricted_exact(spark, sf_dir):
    """RP-LSH top-k must equal the exact cosine ranking RESTRICTED to the
    band-probe candidate set — the rerank stage adds no approximation."""
    from adk_noui_vectordb_spark.operators.ann import (
        ann_rp_lsh_topk,
        rp_lsh_band_rows,
    )

    qid = 0
    bands = rp_lsh_band_rows(spark, sf_dir)
    qb = bands.filter(F.col("vec_id") == qid).select("band", "band_key")
    cand = {
        r["vec_id"]
        for r in bands.join(qb, ["band", "band_key"])
        .filter(F.col("vec_id") != qid)
        .select("vec_id")
        .distinct()
        .collect()
    }
    exact_order = _exact_topk_ids(spark, sf_dir, qid, 10_000_000)
    expected = [v for v in exact_order if v in cand][:10]
    got = [
        r["vec_id"]
        for r in ann_rp_lsh_topk(spark, sf_dir, query_vec_id=qid, k=10).collect()
    ]
    assert got == expected


def test_rp_lsh_probe_plan_is_broadcast_topk(spark, sf_dir):
    """The bucket probe must broadcast the RP_BANDS-row probe table (never
    shuffle the band table for it) and the rerank must cap at k via
    TakeOrderedAndProject — the serving-path plan contract."""
    from adk_noui_vectordb_spark.operators.ann import ann_rp_lsh_topk
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(ann_rp_lsh_topk(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_rp_lsh_recall_matches_band_theory(spark, sf_dir):
    """Honest recall floor on the ISOTROPIC testdata (BASELINE.md caveat,
    same as IVF): top-10 neighbors sit at cosine ~0.3 (theta ~72 deg), so
    per-plane agreement p = 1 - theta/pi ~ 0.6 and band-match probability
    1 - (1 - p^4)^6 ~ 0.55 — measured avg recall@10 is 0.5 at sf0.001.
    Genuinely clustered neighbors (higher cosine) match with much higher
    probability; the MLlib harness above stays the high-recall path."""
    from adk_noui_vectordb_spark.operators.ann import ann_rp_lsh_topk

    recalls = []
    for qid in (0, 1, 2):
        exact = set(_exact_topk_ids(spark, sf_dir, qid, 10))
        approx = {
            r["vec_id"]
            for r in ann_rp_lsh_topk(spark, sf_dir, query_vec_id=qid, k=10).collect()
        }
        recalls.append(len(exact & approx) / 10)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.3, f"RP-LSH recall@10 {avg} < 0.3 (per-query {recalls})"


def test_ivf_returns_k_and_respects_probe(spark, sf_dir):
    df = ann_ivf_topk(spark, sf_dir, query_vec_id=0, k=5, nprobe=2)
    rows = df.collect()
    assert len(rows) == 5
    # all results come from <= nprobe partitions
    assert len({r["label"] for r in rows}) <= 2


def test_ivf_recall_vs_exact(spark, sf_dir):
    # nprobe = all partitions -> IVF must equal exact brute force
    emb = load_table(spark, sf_dir, "embeddings")
    n_labels = emb.select("label").distinct().count()
    exact = _exact_topk_ids(spark, sf_dir, 0, 5)
    full = [
        r["vec_id"]
        for r in ann_ivf_topk(
            spark, sf_dir, query_vec_id=0, k=5, nprobe=n_labels
        ).collect()
    ]
    assert full == exact


def test_ivf_trained_respects_probe_and_recovers_exact(spark, sf_dir):
    """The trained-IVF key: results come from <= nprobe trained cells, and
    with nprobe = n_centroids the pruning is a no-op so the top-k must
    equal exact brute force (the same contract as label-IVF)."""
    from adk_noui_vectordb_spark.operators.ann import ann_ivf_trained_topk

    rows = ann_ivf_trained_topk(
        spark, sf_dir, query_vec_id=0, k=5, nprobe=2
    ).collect()
    assert len(rows) == 5
    assert len({r["cluster"] for r in rows}) <= 2

    exact = _exact_topk_ids(spark, sf_dir, 0, 5)
    full = [
        r["vec_id"]
        for r in ann_ivf_trained_topk(
            spark, sf_dir, query_vec_id=0, k=5, nprobe=8, n_centroids=8
        ).collect()
    ]
    assert full == exact


def test_kmeans_assigns_every_vector_once(spark, sf_dir):
    from adk_noui_vectordb_spark.operators.ann import cluster_kmeans
    from adk_noui_vectordb_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    k = 8
    got = cluster_kmeans(spark, sf_dir, k=k)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert got.count() == n
    assert got.select("vec_id").distinct().count() == n
    bad = got.filter((F.col("cluster") < 0) | (F.col("cluster") >= k)).count()
    assert bad == 0


def test_kmeans_k1_is_single_cluster(spark, sf_dir):
    from adk_noui_vectordb_spark.operators.ann import cluster_kmeans
    from pyspark.sql import functions as F

    got = cluster_kmeans(spark, sf_dir, k=1, iters=1)
    assert got.filter(F.col("cluster") != 0).count() == 0


def test_pq_encode_structure(spark, sf_dir):
    """Every vector gets exactly one code per subspace, codes in [0, k)."""
    from adk_noui_vectordb_spark.operators.ann import PQ_K, PQ_M, pq_encode_rows
    from adk_noui_vectordb_spark.sources.tables import load_table

    codes = pq_encode_rows(spark, sf_dir)
    n = load_table(spark, sf_dir, "embeddings").count()
    assert codes.count() == n * PQ_M
    assert codes.select("vec_id", "subspace").distinct().count() == n * PQ_M
    bad = codes.filter((F.col("code") < 0) | (F.col("code") >= PQ_K)).count()
    assert bad == 0


def test_pq_rerank_recall(spark, sf_dir):
    """Two-stage PQ (ADC top-100 -> exact rerank) recall@10 vs exact L2.
    Measured 0.9 avg on the isotropic sf0.001 testdata (BASELINE.md: the
    4x3-bit code budget is data-limited here, same caveat as IVF); the
    rerank stage makes the top-10 ORDER exact within the candidate set."""
    import numpy as np

    from adk_noui_vectordb_spark.operators.ann import knn_pq_rerank
    from adk_noui_vectordb_spark.sources.tables import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["emb"]) for r in rows])
    recalls = []
    for qi in (0, 1, 2):
        q = M[ids == qi][0]
        d2 = ((M - q) ** 2).sum(1)
        d2[ids == qi] = np.inf
        exact = set(ids[np.argsort(d2, kind="stable")[:10]].tolist())
        got = {
            r["vec_id"]
            for r in knn_pq_rerank(spark, sf_dir, query_vec_id=int(qi), k=10).collect()
        }
        recalls.append(len(exact & got) / 10)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.7, f"PQ rerank recall@10 {avg} < 0.7 (per-query {recalls})"


def test_pq_adc_scan_is_broadcast(spark, sf_dir):
    """The ADC stage must broadcast the m*k distance table — the encoded
    corpus side never shuffles for the lookup."""
    from adk_noui_vectordb_spark.operators.ann import knn_pq_topk
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(knn_pq_topk(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_semdedup_keep_rule(spark, sf_dir):
    """Brute-force re-check of the SemDeDup keep rule: a vector is pruned
    iff a lower-vec_id vector in the SAME cluster has round(cos,4) >= thr."""
    import numpy as np

    from adk_noui_vectordb_spark.operators.dedup import semdedup_prune
    from adk_noui_vectordb_spark.sources.tables import load_table

    thr = 0.35
    got = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in semdedup_prune(spark, sf_dir, threshold=thr).collect()
    }
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    assert set(got) == set(emb)
    for vid, (cluster, keep) in got.items():
        mates = [
            o
            for o, (c, _) in got.items()
            if c == cluster and o < vid
        ]
        v = emb[vid]
        has_dup = any(
            round(
                float(np.dot(emb[o], v))
                / (np.linalg.norm(emb[o]) * np.linalg.norm(v)),
                4,
            )
            >= thr
            for o in mates
        )
        assert keep == (0 if has_dup else 1), f"vec {vid}: keep={keep}"


def test_semdedup_prunes_planted_dups(spark, sf_dir):
    """The testdata plants near-dup embedding pairs (cosine >= 0.35);
    SemDeDup must prune a non-trivial set while keeping every cluster's
    canonical (minimum vec_id) member."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators.dedup import semdedup_prune

    df = semdedup_prune(spark, sf_dir)
    pruned = df.filter(F.col("keep") == 0).count()
    assert pruned > 0
    # the lowest vec_id of every cluster is by construction never pruned
    firsts = df.groupBy("cluster").agg(F.min("vec_id").alias("vec_id"))
    bad = df.join(firsts, ["cluster", "vec_id"]).filter(F.col("keep") == 0)
    assert bad.count() == 0


def test_kmeans_broadcast_assignment_equals_literal(spark, sf_dir, monkeypatch):
    """Above CENTROID_LITERAL_MAX_KDIM the assignment switches to
    sparkContext.broadcast + Arrow argmin (VERDICT r5 item 3); the two
    strategies implement the identical (round(d2,6), cluster) ranking
    contract and must agree assignment-for-assignment. Forcing the
    threshold to 0 runs the broadcast path on the same small-k data the
    literal path runs."""
    from adk_noui_vectordb_spark.operators import ann

    lit = {
        (r["vec_id"], r["cluster"])
        for r in ann.cluster_kmeans(spark, sf_dir, k=8, iters=2).collect()
    }
    monkeypatch.setattr(ann, "CENTROID_LITERAL_MAX_KDIM", 0)
    bcast = {
        (r["vec_id"], r["cluster"])
        for r in ann.cluster_kmeans(spark, sf_dir, k=8, iters=2).collect()
    }
    assert lit == bcast
    # the broadcast path must stay a narrow, shuffle-free projection too
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(ann.cluster_kmeans(spark, sf_dir, k=8), mode="simple")
    for bad in ("Exchange", "Sort", "Window", "Join"):
        assert bad not in plan, f"{bad} in broadcast assignment plan:\n{plan}"


def test_assign_topn_matches_argmin_and_broadcast(spark, sf_dir, monkeypatch):
    """r14 multi-probe assignment (the graph build's boundary fix):
    (1) nprobe=1 reduces exactly to assign_to_centroids; (2) the row's
    rank-1 cluster under nprobe=2 IS the argmin assignment (the second
    probe only ADDS a row); (3) the Arrow broadcast top-n kernel agrees
    pair-for-pair with the literal array_sort path under the identical
    (round(d2,6), cluster) contract."""
    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.sources.tables import load_table

    e = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
    )
    assign_p, _ = ann.build_ivf_index_sampled(spark, sf_dir, 8, 2, 32)
    cents_p = os.path.join(os.path.dirname(assign_p), "cents")
    cent_rows = sorted(
        (
            {"cluster": r["cluster"], "c": list(r["c"])}
            for r in spark.read.parquet(cents_p).collect()
        ),
        key=lambda r: r["cluster"],
    )
    argmin = {
        (r["vec_id"], r["cluster"])
        for r in ann.assign_to_centroids(e, cent_rows).collect()
    }
    top1 = {
        (r["vec_id"], r["cluster"])
        for r in ann.assign_topn_to_centroids(e, cent_rows, 1).collect()
    }
    assert top1 == argmin
    top2 = sorted(
        (r["vec_id"], r["cluster"])
        for r in ann.assign_topn_to_centroids(e, cent_rows, 2).collect()
    )
    n = e.count()
    assert len(top2) == 2 * n
    assert argmin <= set(top2)  # every argmin pair is among the 2 probes
    per_vec: dict = {}
    for vid, cl in top2:
        per_vec.setdefault(vid, set()).add(cl)
    assert all(len(cls) == 2 for cls in per_vec.values())
    monkeypatch.setattr(ann, "CENTROID_LITERAL_MAX_KDIM", 0)
    bcast = sorted(
        (r["vec_id"], r["cluster"])
        for r in ann.assign_topn_to_centroids(e, cent_rows, 2).collect()
    )
    assert bcast == top2


def test_kmeans_large_k_smoke(spark, sf_dir):
    """k large enough that k*dim would cross the default threshold at IVF
    scale — here forced over the line by a low threshold bound check:
    k=32 x dim=64 = 2048 stays literal by default, so instead assert the
    broadcast path handles a real multi-iteration run end-to-end."""
    from adk_noui_vectordb_spark.operators import ann

    old = ann.CENTROID_LITERAL_MAX_KDIM
    ann.CENTROID_LITERAL_MAX_KDIM = 1
    try:
        got = ann.cluster_kmeans(spark, sf_dir, k=32, iters=2)
        n = load_table(spark, sf_dir, "embeddings").count()
        assert got.count() == n
        bad = got.filter(
            (F.col("cluster") < 0) | (F.col("cluster") >= 32)
        ).count()
        assert bad == 0
    finally:
        ann.CENTROID_LITERAL_MAX_KDIM = old


def test_double_sql_rejects_non_finite():
    """ADVICE r5: NaN/Inf must fail with a diagnosable ValueError, not an
    opaque Spark ParseException from an 'infD' literal."""
    import math

    import pytest

    from adk_noui_vectordb_spark.operators.ann import _centroid_literal, _double_sql

    assert _double_sql(1.5) == "1.5D"
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(ValueError, match="non-finite"):
            _double_sql(bad)
    with pytest.raises(ValueError, match="cluster 3"):
        _centroid_literal(
            [{"cluster": 3, "c": [1.0, float("nan")]}]
        )


def test_kmeans_assignment_is_pure_projection(spark, sf_dir):
    """The k-means assignment is an array_min argmin over a LITERAL
    centroid array — a pure projection over the scan. No join, no window,
    no sort, no exchange anywhere in the assignment plan (the previous
    Window.partitionBy(vec_id) argmin planned Sort + Exchange even after
    a broadcast join)."""
    from adk_noui_vectordb_spark.operators.ann import cluster_kmeans
    from adk_noui_vectordb_spark.plans import explain_str

    plan = explain_str(cluster_kmeans(spark, sf_dir), mode="simple")
    for bad in ("Exchange", "Sort", "Window", "Join"):
        assert bad not in plan, f"{bad} in assignment plan:\n{plan}"


def test_knn_join_ranks_are_contiguous_and_sorted(spark, sf_dir):
    from adk_noui_vectordb_spark.operators.ann import knn_join_topk

    rows = knn_join_topk(spark, sf_dir, k=3).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append((r["rank"], r["sim"], r["nbr"]))
    assert by_src
    for src, lst in by_src.items():
        lst.sort()
        assert [x[0] for x in lst] == list(range(1, len(lst) + 1))
        sims = [x[1] for x in lst]
        assert sims == sorted(sims, reverse=True)
        assert all(x[2] != src for x in lst)


def test_cap_bucket_members_bounds_skewed_self_join(spark):
    """Skew guard (VERDICT r7 next #4): a hot (band, band_key) bucket of
    m members must contribute at most m x cap candidate pairs to the
    self-join, not m² — the difference between a slow bucket and a dead
    executor at 100 TB."""
    from adk_noui_vectordb_spark.operators.ann import cap_bucket_members

    hot = [(0, 7, i) for i in range(1000)]  # one hot bucket, m=1000
    cold = [(1, 3, i) for i in range(10)]
    bands = spark.createDataFrame(
        hot + cold, "band int, band_key int, vec_id int"
    )
    capped = cap_bucket_members(bands, cap=50)
    sizes = {
        (r["band"], r["band_key"]): r["n"]
        for r in capped.groupBy("band", "band_key")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sizes == {(0, 7): 50, (1, 3): 10}

    a = bands.select("band", "band_key", F.col("vec_id").alias("src"))
    b = capped.select("band", "band_key", F.col("vec_id").alias("nbr"))
    pairs = a.join(b, ["band", "band_key"]).filter(
        F.col("src") != F.col("nbr")
    )
    n_pairs = pairs.count()
    # hot: 1000 x 50 minus the 50 self-pairs; cold: 10 x 10 minus 10.
    assert n_pairs == 1000 * 50 - 50 + 90
    # vs the uncapped blow-up (would be 999_000 + 90)


def test_cap_bucket_members_deterministic_and_order_free(spark):
    """The md5-top-cap selection must not depend on input row order or
    partitioning (corpus-order determinism, the house discipline)."""
    from adk_noui_vectordb_spark.operators.ann import cap_bucket_members

    rows = [(0, 1, i) for i in range(200)]
    bands = spark.createDataFrame(rows, "band int, band_key int, vec_id int")
    sel1 = {r["vec_id"] for r in cap_bucket_members(bands, cap=40).collect()}
    shuffled = bands.orderBy(F.desc("vec_id")).repartition(7)
    sel2 = {
        r["vec_id"] for r in cap_bucket_members(shuffled, cap=40).collect()
    }
    assert sel1 == sel2 and len(sel1) == 40
    # cap >= bucket size is the identity
    assert cap_bucket_members(bands, cap=200).count() == 200


def test_knn_join_default_cap_exceeds_benchmark_buckets(spark, sf_dir):
    """Pin the 'cap=256 never binds on the benchmark corpus' claim: the
    largest band bucket must stay within the default bucket_cap, so the
    capped top-k is provably identical to uncapped at this SF (the
    identity holds at biggest <= cap — the cap keeps exactly the first
    `cap` members, so a bucket of exactly `cap` loses nothing;
    ADVICE r8)."""
    import inspect

    from adk_noui_vectordb_spark.operators.ann import (
        knn_join_topk,
        rp_lsh_band_rows,
    )

    default_cap = inspect.signature(knn_join_topk).parameters[
        "bucket_cap"
    ].default
    biggest = (
        rp_lsh_band_rows(spark, sf_dir)
        .groupBy("band", "band_key")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert biggest <= default_cap


# --- incremental index maintenance (VERDICT r8 next #3/#4) --------------


def _split_embedding_dirs(spark, sf_dir, tmp_path, tag):
    """base/ holds vec_id % 5 != 0, all/ holds everything — the invindex
    incremental-test harness applied to the embeddings table."""
    import os

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir, all_dir = str(tmp_path / f"{tag}_base"), str(tmp_path / f"{tag}_all")
    os.makedirs(base_dir), os.makedirs(all_dir)
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    emb.write.parquet(os.path.join(all_dir, "embeddings.parquet"))
    batch = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    return base_dir, all_dir, batch


def _band_map(spark, bands_p):
    return {
        (r["band"], r["band_key"], r["vec_id"])
        for r in spark.read.parquet(bands_p).collect()
    }


def test_update_rp_index_equals_fresh_rebuild(spark, sf_dir, tmp_path):
    """Building on base and incrementally ingesting the rest must yield
    the same band table AND vector store as a from-scratch build over
    everything — the signatures come from the shared rp_band_rows_for
    kernel, so equality is exact, not approximate."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    base_dir, all_dir, batch = _split_embedding_dirs(spark, sf_dir, tmp_path, "rp")
    bands_inc = ann.update_rp_index(spark, base_dir, batch)
    bands_all = ann.build_rp_index(spark, all_dir)
    assert _band_map(spark, bands_inc) == _band_map(spark, bands_all)

    def vec_map(p):
        return {
            r["vec_id"]: (r["vbucket"], tuple(r["emb"]))
            for r in spark.read.parquet(
                os.path.join(os.path.dirname(p), "vecs")
            ).collect()
        }

    assert vec_map(bands_inc) == vec_map(bands_all)


def test_update_rp_index_replaces_resubmitted_vector(spark, sf_dir, tmp_path):
    """Vec-level replace: re-submitting vec 1 with a NEW embedding must
    retract its old band rows (found via the vecs/ reverse map, not a
    scan) and serve the new signature; re-submitting the same batch
    again changes nothing (idempotent upsert)."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "rp_rebase")
    os.makedirs(base_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    bands0 = ann.build_rp_index(spark, base_dir)
    before = _band_map(spark, bands0)
    old_rows = {t for t in before if t[2] == 1}
    assert len(old_rows) == ann.RP_BANDS

    flipped = emb.filter(F.col("vec_id") == 1).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: -x
        ).alias("emb"),
    )
    bands1 = ann.update_rp_index(spark, base_dir, flipped)
    after = _band_map(spark, bands1)
    new_rows = {t for t in after if t[2] == 1}
    assert len(new_rows) == ann.RP_BANDS
    # sign-flip flips every plane vote -> every band key changes
    assert new_rows.isdisjoint(old_rows)
    assert after - new_rows == before - old_rows  # everyone else untouched

    bands2 = ann.update_rp_index(spark, base_dir, flipped)
    assert _band_map(spark, bands2) == after


def test_rp_served_probe_converges_one_batch_after_ingest(
    spark, sf_dir, tmp_path
):
    """The stream_text_index_ingest contract for the vector side: a
    vector ingested via update_rp_index is served by the very next
    ann_rp_lsh_topk probe (the rerank reads the index's vecs/ store,
    never the source table)."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "rp_serve")
    os.makedirs(base_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    ann.build_rp_index(spark, base_dir)

    clone = emb.filter(F.col("vec_id") == 0).select(
        F.lit(987654321).cast("bigint").alias("vec_id"), F.col("embedding")
    )
    ann.update_rp_index(spark, base_dir, clone)
    top = ann.ann_rp_lsh_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 987654321
    assert top[0]["sim"] == 1.0


def test_update_ivf_index_equals_frozen_reassignment(
    spark, sf_dir, tmp_path
):
    """Under frozen centroids the updated assignment must equal a
    re-assignment of the combined corpus through the SAME
    assign_to_centroids kernel — and the ingested clone of vec 0 must
    be served by the next probe (its cell is probed first)."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "ivf_base")
    os.makedirs(base_dir)
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(
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
    batch = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    assign_p2, cents_p2 = ann.update_ivf_index(spark, base_dir, batch)

    got = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(assign_p2).collect()
    }
    combined = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    want = {
        r["vec_id"]: r["cluster"]
        for r in ann.assign_to_centroids(combined, cent_rows).collect()
    }
    assert got == want
    # centroids byte-identical (frozen)
    c2 = sorted(
        (r["cluster"], tuple(r["c"]))
        for r in spark.read.parquet(cents_p2).collect()
    )
    assert c2 == sorted((r["cluster"], tuple(r["c"])) for r in
                        (spark.read.parquet(cents_p).collect()))

    clone = emb.filter(F.col("vec_id") == 0).select(
        F.lit(987654322).cast("bigint").alias("vec_id"), F.col("embedding")
    )
    ann.update_ivf_index(spark, base_dir, clone)
    top = ann.ann_ivf_trained_topk(spark, base_dir, query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 987654322
    assert top[0]["sim"] == 1.0


def test_rp_update_crash_before_commit_preserves_served_results(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The versioning discipline holds for the vector indexes too: a
    crash injected before the _CURRENT swing leaves the probe serving
    the old consistent version; re-running the update succeeds."""
    import os

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.sources import versioning

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "rp_crash")
    os.makedirs(base_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    ann.build_rp_index(spark, base_dir)
    served_before = [
        tuple(r) for r in ann.ann_rp_lsh_topk(spark, base_dir).collect()
    ]
    clone = emb.filter(F.col("vec_id") == 0).select(
        F.lit(987654323).cast("bigint").alias("vec_id"), F.col("embedding")
    )

    real = versioning.point_current

    def boom(root, name):
        raise RuntimeError("injected crash before commit point")

    monkeypatch.setattr(versioning, "point_current", boom)
    try:
        ann.update_rp_index(spark, base_dir, clone)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    monkeypatch.setattr(versioning, "point_current", real)

    assert [
        tuple(r) for r in ann.ann_rp_lsh_topk(spark, base_dir).collect()
    ] == served_before
    bands = ann.update_rp_index(spark, base_dir, clone)  # recovery = re-run
    got = {t[2] for t in _band_map(spark, bands)}
    assert 987654323 in got


def test_compact_rp_index_preserves_bands_and_serving(spark, sf_dir, tmp_path):
    """RP compaction: content-identical bands/vecs, <=1 part file per
    partition dir afterward, probe results unchanged."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "rp_comp")
    os.makedirs(base_dir)
    emb.filter(F.col("vec_id") % 3 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    ann.build_rp_index(spark, base_dir)
    ann.update_rp_index(
        spark, base_dir, emb.filter(F.col("vec_id") % 3 == 0).select("vec_id", "embedding")
    )
    bands_p = ann.build_rp_index(spark, base_dir)
    before = _band_map(spark, bands_p)
    served_before = [
        tuple(r) for r in ann.ann_rp_lsh_topk(spark, base_dir).collect()
    ]
    ver = ann.compact_rp_index(spark, base_dir, threshold=0)
    assert _band_map(spark, os.path.join(ver, "bands")) == before
    assert [
        tuple(r) for r in ann.ann_rp_lsh_topk(spark, base_dir).collect()
    ] == served_before
    for band in os.listdir(os.path.join(ver, "bands")):
        bp = os.path.join(ver, "bands", band)
        if not os.path.isdir(bp):
            continue
        for bk in os.listdir(bp):
            kp = os.path.join(bp, bk)
            n = sum(1 for f in os.listdir(kp) if f.startswith("part-"))
            assert n <= 1, (band, bk, n)


def test_knn_join_zero_norm_excluded_before_cap(spark, sf_dir, tmp_path):
    """A zero-norm vector must neither appear in the batch k-NN output
    nor occupy cap slots: results over corpus+zero-vec equal results
    over the clean corpus exactly (the exclusion-path gate fires only
    when a zero vector exists — the clean corpus skips the semi-join)."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    clean_dir = str(tmp_path / "knnz_clean")
    dirty_dir = str(tmp_path / "knnz_dirty")
    os.makedirs(clean_dir), os.makedirs(dirty_dir)
    emb.write.parquet(os.path.join(clean_dir, "embeddings.parquet"))
    zero = emb.limit(1).select(
        F.lit(876543210).cast("bigint").alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 0.0).alias("embedding"),
        *[c for c in emb.columns if c not in ("vec_id", "embedding")],
    )
    emb.unionByName(zero).write.parquet(
        os.path.join(dirty_dir, "embeddings.parquet")
    )
    a = [tuple(r) for r in ann.knn_join_topk(spark, clean_dir).collect()]
    b = [tuple(r) for r in ann.knn_join_topk(spark, dirty_dir).collect()]
    assert sorted(a) == sorted(b)
    assert all(r[0] != 876543210 and r[1] != 876543210 for r in b)


def test_update_pq_index_equals_frozen_encoding(spark, sf_dir, tmp_path):
    """Under frozen codebooks the updated codes must equal a
    re-encoding of the combined corpus through pq_encode_for; the
    ingested clone of vec 0 must top the exact rerank (d2 = 0) one
    batch after ingest; re-submitting the same batch is a no-op."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "pq_base")
    os.makedirs(base_dir)
    emb.filter(F.col("vec_id") % 5 != 0).write.parquet(
        os.path.join(base_dir, "embeddings.parquet")
    )
    codes_p, cents_p = ann.build_pq_index(spark, base_dir)
    cent_rows = [
        {"subspace": r["subspace"], "code": r["code"], "c": list(r["c"])}
        for r in spark.read.parquet(cents_p).collect()
    ]
    batch = emb.filter(F.col("vec_id") % 5 == 0).select("vec_id", "embedding")
    codes_p2, cents_p2 = ann.update_pq_index(spark, base_dir, batch)

    got = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in spark.read.parquet(codes_p2).collect()
    }
    combined = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    want = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in ann.pq_encode_for(combined, cent_rows, ann.PQ_M).collect()
    }
    assert got == want
    # codebooks frozen byte-for-byte
    assert sorted(
        (r["subspace"], r["code"], tuple(r["c"]))
        for r in spark.read.parquet(cents_p2).collect()
    ) == sorted(
        (r["subspace"], r["code"], tuple(r["c"]))
        for r in spark.read.parquet(cents_p).collect()
    )

    clone = emb.filter(F.col("vec_id") == 0).select(
        F.lit(987654324).cast("bigint").alias("vec_id"), F.col("embedding")
    )
    ann.update_pq_index(spark, base_dir, clone)
    top = ann.knn_pq_rerank(spark, base_dir, query_vec_id=0, k=3).collect()
    assert top[0]["vec_id"] == 987654324
    assert top[0]["d2_micro"] == 0

    before = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in spark.read.parquet(
            os.path.join(
                ann.build_pq_index(spark, base_dir)[0]
            )
        ).collect()
    }
    ann.update_pq_index(spark, base_dir, clone)  # same batch again
    after = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in spark.read.parquet(
            ann.build_pq_index(spark, base_dir)[0]
        ).collect()
    }
    assert after == before


def test_delete_from_rp_index_retracts_bands_and_vecs(spark, sf_dir, tmp_path):
    """Deleting vectors must equal a fresh build over the corpus
    WITHOUT them (bands and vecs), and the probe must stop serving
    them; deleting an absent id is a no-op."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    full_dir = str(tmp_path / "rpdfull")
    rest_dir = str(tmp_path / "rpdrest")
    os.makedirs(full_dir), os.makedirs(rest_dir)
    emb.write.parquet(os.path.join(full_dir, "embeddings.parquet"))
    emb.filter(F.col("vec_id") % 7 != 0).write.parquet(
        os.path.join(rest_dir, "embeddings.parquet")
    )
    ann.build_rp_index(spark, full_dir)
    victims = emb.filter(F.col("vec_id") % 7 == 0).select("vec_id")
    bands_del = ann.delete_from_rp_index(spark, full_dir, victims)
    bands_ref = ann.build_rp_index(spark, rest_dir)
    assert _band_map(spark, bands_del) == _band_map(spark, bands_ref)
    vecs_left = {
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(os.path.dirname(bands_del), "vecs")
        ).collect()
    }
    assert not (vecs_left & {r["vec_id"] for r in victims.collect()})
    top = ann.ann_rp_lsh_topk(spark, full_dir, query_vec_id=1, k=50).collect()
    assert all(r["vec_id"] % 7 != 0 for r in top)

    absent = spark.createDataFrame([(99_999_998,)], "vec_id bigint")
    assert ann.delete_from_rp_index(spark, full_dir, absent) == bands_del


def test_delete_from_ivf_and_pq_indexes(spark, sf_dir, tmp_path):
    """Deletion symmetry across the vector-index family: IVF and PQ
    deletions must equal frozen-quantizer state over the corpus minus
    the victims, and absent ids are no-ops."""
    import os

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base_dir = str(tmp_path / "vdel")
    os.makedirs(base_dir)
    emb.write.parquet(os.path.join(base_dir, "embeddings.parquet"))
    victims = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    victim_set = {r["vec_id"] for r in victims.collect()}

    # IVF
    assign_p0, cents_p = ann.build_ivf_index(spark, base_dir)
    before = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(assign_p0).collect()
    }
    assign_p1, _ = ann.delete_from_ivf_index(spark, base_dir, victims)
    after = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.parquet(assign_p1).collect()
    }
    assert after == {k: v for k, v in before.items() if k not in victim_set}
    vecs_left = {
        r["vec_id"]
        for r in spark.read.parquet(
            os.path.join(os.path.dirname(assign_p1), "vecs")
        ).collect()
    }
    assert not (vecs_left & victim_set)
    absent = spark.createDataFrame([(77_777_777,)], "vec_id bigint")
    assert ann.delete_from_ivf_index(spark, base_dir, absent)[0] == assign_p1

    # PQ
    codes_p0, _ = ann.build_pq_index(spark, base_dir)
    cbefore = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in spark.read.parquet(codes_p0).collect()
    }
    codes_p1, _ = ann.delete_from_pq_index(spark, base_dir, victims)
    cafter = {
        (r["vec_id"], r["subspace"]): r["code"]
        for r in spark.read.parquet(codes_p1).collect()
    }
    assert cafter == {
        k: v for k, v in cbefore.items() if k[0] not in victim_set
    }
    assert ann.delete_from_pq_index(spark, base_dir, absent)[0] == codes_p1


def test_rp_empty_index_state_serves_and_recovers(spark, tmp_path):
    """The RP twin of the text-index empty-state pin (VERDICT r9 next
    #1): deleting every vector leaves a legal, servable index — vec/band
    stores answer 0 rows, compaction no-ops, a probe for a deleted id
    raises the documented error, and an update re-populates serving."""
    import os

    import pytest

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.sources import versioning as vn

    base = str(tmp_path / "rpempty")
    os.makedirs(base)
    v0 = [1.0] * 64
    v1 = [2.0] * 64  # same direction as v0 -> identical band keys
    spark.createDataFrame(
        [(0, v0, 0), (1, v1, 0)],
        "vec_id bigint, embedding array<double>, label int",
    ).write.parquet(os.path.join(base, "embeddings.parquet"))
    ann.build_rp_index(spark, base)
    ann.delete_from_rp_index(
        spark, base, spark.createDataFrame([(0,), (1,)], "vec_id bigint")
    )

    assert ann.rp_index_vec_rows(spark, base).count() == 0
    bands_p = ann.build_rp_index(spark, base)
    assert (
        spark.read.schema(ann.RP_BANDS_SCHEMA).parquet(bands_p).count() == 0
    )

    cur = vn.current_dir(ann.rp_index_root(base))
    assert ann.compact_rp_index(spark, base, threshold=0) == cur

    with pytest.raises(ValueError, match="not found"):
        ann.ann_rp_lsh_topk(spark, base, query_vec_id=0, k=3)

    ann.update_rp_index(
        spark,
        base,
        spark.createDataFrame(
            [(0, v0), (1, v1)], "vec_id bigint, embedding array<double>"
        ),
    )
    got = ann.ann_rp_lsh_topk(spark, base, query_vec_id=0, k=3).collect()
    assert [(r["vec_id"], r["sim"]) for r in got] == [(1, 1.0)]


def test_clustered_embeddings_bow_the_ivf_recall_curve(spark, tmp_path):
    """The ANN design's central scale claim, measured (VERDICT r9 next
    #4): on CLUSTERED embeddings (the real-data regime — a seeded
    mixture of Gaussians) IVF recall at small nprobe is far ABOVE the
    candidate rate, where isotropic testdata pins recall ~ candidate
    rate (the documented worst case, BASELINE.md). Deterministic: the
    fixture is seed-42 and every pipeline stage is md5/6-dp exact."""
    import os

    from adk_noui_vectordb_spark.operators import ann
    from tools.make_clustered_embeddings import make

    base = str(tmp_path / "clustered")
    make(base, n=400, k_centers=8, sigma=0.06)
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))

    k = 10
    recalls, rates = [], []
    for qid in (0, 1, 2):
        exact = {
            r["vec_id"] for r in knn_topk(emb, make_query_from_vec(emb, qid), k=k).collect()
        }
        approx = {
            r["vec_id"]
            for r in ann.ann_ivf_trained_topk(
                spark, base, query_vec_id=qid, k=k, nprobe=1, n_centroids=8
            ).collect()
        }
        recalls.append(len(exact & approx) / k)
        # candidate rate: fraction of the corpus in the probed cell(s) —
        # read from the same trained index the query served from
        assign_p, _ = ann.build_ivf_index(spark, base, 8, 2)
        sizes = {
            r["cluster"]: r["n"]
            for r in spark.read.schema(ann.IVF_ASSIGN_SCHEMA)
            .parquet(assign_p)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        rates.append(max(sizes.values()) / sum(sizes.values()))

    avg_recall = sum(recalls) / len(recalls)
    worst_rate = max(rates)
    # isotropic data: recall ~ rate; clustered data must clear it by 2x
    assert avg_recall >= 0.5, (recalls, rates)
    assert avg_recall >= 2.0 * worst_rate, (recalls, rates)


def test_ivfpq_lifecycle_update_delete_and_serving(spark, sf_dir, tmp_path):
    """The composed IVF+PQ index (r10): incremental upsert equals a
    frozen-centroid/frozen-codebook re-encode of the combined corpus,
    an ingested vector serves one batch later, and deletion retracts
    its plist and vecs rows."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    base = str(tmp_path / "ivfpqbase")
    os.makedirs(base)
    emb.filter(F.col("vec_id") % 7 != 0).write.parquet(
        os.path.join(base, "embeddings.parquet")
    )
    v0 = ann.build_ivfpq_index(spark, base)
    cent_rows, pqcent_rows = ann._ivfpq_trained_rows(spark, v0)
    cents_dicts = [{"cluster": cl, "c": c} for cl, c in cent_rows]

    batch = emb.filter(F.col("vec_id") % 7 == 0).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    v1 = ann.update_ivfpq_index(spark, base, batch)

    def plist_rows(v):
        return {
            tuple(r)
            for r in spark.read.schema(ann.IVFPQ_PLIST_SCHEMA)
            .parquet(os.path.join(v, "plist"))
            .collect()
        }

    # expected: EVERY corpus vector residual-encoded/assigned under the
    # FROZEN subset-trained centroids and codebooks (FAISS
    # add-after-train with residual coding)
    all_vecs = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    all_assign = ann.assign_to_centroids(all_vecs, cents_dicts).select(
        "vec_id", "cluster"
    )
    cents_df = spark.createDataFrame(
        [(int(cl), [float(x) for x in c]) for cl, c in cent_rows],
        "cluster int, c array<double>",
    )
    all_resid = ann._residual_frame(all_vecs, all_assign, cents_df)
    expected = {
        tuple(r)
        for r in ann.pq_encode_for(all_resid, pqcent_rows, ann.PQ_M)
        .join(all_assign, "vec_id")
        .select("vec_id", "subspace", "code", "cluster")
        .collect()
    }
    assert plist_rows(v1) == expected

    # an ingested vector serves immediately (query id 7 is batch-only)
    got = {
        r["vec_id"]
        for r in ann.ann_ivfpq_topk(spark, base, query_vec_id=7).collect()
    }
    assert got and 7 not in got

    # delete retracts plist and vecs rows; absent-id delete is a no-op
    v2 = ann.delete_from_ivfpq_index(
        spark, base, spark.createDataFrame([(7,)], "vec_id bigint")
    )
    assert not any(t[0] == 7 for t in plist_rows(v2))
    vecs2 = {
        r["vec_id"]
        for r in spark.read.schema(ann.VECS_SCHEMA)
        .parquet(os.path.join(v2, "vecs"))
        .collect()
    }
    assert 7 not in vecs2
    assert plist_rows(v2) == {t for t in expected if t[0] != 7}
    v3 = ann.delete_from_ivfpq_index(
        spark, base, spark.createDataFrame([(987654321,)], "vec_id bigint")
    )
    assert v3 == v2


def test_ivfpq_probe_prunes_cell_partitions(spark, sf_dir):
    """The composed index's probe must reach the plist scan as a literal
    cluster PartitionFilter — the trained-IVF serving contract."""
    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.plans.explain import explain_str

    df = ann.ann_ivfpq_topk(spark, sf_dir)
    plan = explain_str(df)
    seg = plan.split("PartitionFilters")
    assert len(seg) > 1, plan
    assert any("cluster" in s.split("\n")[0] for s in seg[1:]), plan


def test_residual_ivfpq_recall_on_clustered_fixture(spark, tmp_path):
    """Residual-encoded IVFPQ recall pin on the seeded clustered
    fixture, against the matching EXACT-L2 baseline (the index's
    metric — a cosine baseline would mis-measure by the norm spread):
    probing 2 of 8 cells at m=4 ints/vector with a 60-vector exact
    rerank must recover >= 0.7 of the true top-10. Deterministic:
    seed-42 fixture, md5/6-dp-exact pipeline."""
    import os

    from adk_noui_vectordb_spark.functions.vector import dot_product
    from adk_noui_vectordb_spark.operators import ann
    from tools.make_clustered_embeddings import make

    base = str(tmp_path / "rivfpq")
    make(base, n=400, k_centers=8, sigma=0.06)
    emb = spark.read.parquet(os.path.join(base, "embeddings.parquet"))
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )

    def exact_l2(qid):
        q = e.filter(F.col("vec_id") == qid).select(F.col("emb").alias("qe"))
        d2 = (
            dot_product(F.col("emb"), F.col("emb"))
            - 2 * dot_product(F.col("emb"), F.col("qe"))
            + dot_product(F.col("qe"), F.col("qe"))
        )
        return {
            r["vec_id"]
            for r in e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != qid)
            .select("vec_id", d2.alias("d2"))
            .orderBy("d2", "vec_id")
            .limit(10)
            .collect()
        }

    recalls = []
    for qid in (0, 1, 2):
        exact = exact_l2(qid)
        got = {
            r["vec_id"]
            for r in ann.ann_ivfpq_topk(
                spark, base, query_vec_id=qid, topk=10, nprobe=2,
                candidates=60, n_centroids=8,
            ).collect()
        }
        recalls.append(len(exact & got) / 10)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.7, recalls


def test_filtered_ann_respects_predicate_and_probe(spark, sf_dir):
    """ann_rp_lsh_filtered_topk: every hit carries the filtered label,
    and the result equals the unfiltered multiprobe candidate set
    intersected with the label set then exactly reranked (post-filter
    semantics, the reference's where= contract)."""
    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.operators import ann
    from adk_noui_vectordb_spark.sources.tables import load_table

    got = ann.ann_rp_lsh_filtered_topk(spark, sf_dir, label=1, k=10).collect()
    assert len(got) > 0
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    assert all(labels[r["vec_id"]] == 1 for r in got)

    # post-filter semantics: unfiltered multiprobe top-BIG, keep label=1,
    # take 10 — must equal the operator's output exactly
    big = ann.ann_rp_lsh_topk(
        spark, sf_dir, k=10**6, multiprobe_hamming=1
    ).collect()
    want = [
        (r["vec_id"], r["sim"]) for r in big if labels[r["vec_id"]] == 1
    ][:10]
    assert [(r["vec_id"], r["sim"]) for r in got] == want


def test_batch_ann_matches_single_query_serving(spark, sf_dir):
    """Each query's slice of the batched probe equals the single-query
    index serving — the batching is a plan change, not a contract
    change (the bm25_batch_topk_served discipline on the vector arm)."""
    from adk_noui_vectordb_spark.operators import ann

    batch = ann.ann_rp_lsh_batch_topk(
        spark, sf_dir, query_vec_ids=(0, 3, 9), k=5
    ).collect()
    for qid in (0, 3, 9):
        single = ann.ann_rp_lsh_topk(spark, sf_dir, query_vec_id=qid, k=5).collect()
        got = [
            (r["vec_id"], r["sim"])
            for r in sorted(
                (r for r in batch if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        want = [(r["vec_id"], r["sim"]) for r in single]
        assert got == want, (qid, got, want)


def test_knn_join_ivf_cell_cap_bounds_hot_cells(spark, sf_dir):
    """VERDICT r10 next #1: the cell join's per-cell neighbor cap,
    pinned against a full Python model with a BINDING cap (cap=5 <<
    every cell's population) — every source still gets a top-k, and
    each candidate list is exactly the md5-top-5 of the source's cell."""
    import hashlib
    import os

    import numpy as np

    from adk_noui_vectordb_spark.operators import ann

    cap = 5
    got = {
        (r["src"], r["rank"]): (r["nbr"], r["sim"])
        for r in ann.knn_join_ivf_topk(spark, sf_dir, k=3, cell_cap=cap).collect()
    }
    # model: read the SAME derived-c sample-trained index the operator
    # served from (r11: the join's coarse quantizer trains on a sample)
    n = load_table(spark, sf_dir, "embeddings").count()
    c = ann.derived_cell_count(n)
    assign_p, _ = ann.build_ivf_index_sampled(
        spark, sf_dir, c, 2, ann.IVF_JOIN_TRAIN_PER_CELL
    )
    ver = os.path.dirname(assign_p)
    asg = {
        r["vec_id"]: r["cluster"]
        for r in spark.read.schema(ann.IVF_ASSIGN_SCHEMA).parquet(assign_p).collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["emb"], dtype=np.float64)
        for r in spark.read.schema(ann.VECS_SCHEMA)
        .parquet(os.path.join(ver, "vecs"))
        .collect()
    }
    nz = {v for v, e in vecs.items() if float(e @ e) > 0}
    by_cell: dict = {}
    for v, cl in asg.items():
        if v in nz:
            by_cell.setdefault(cl, []).append(v)
    capped = {
        cl: set(
            sorted(ms, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[:cap]
        )
        for cl, ms in by_cell.items()
    }
    assert any(len(ms) > cap for ms in by_cell.values()), "cap not binding"
    want = {}
    for src in sorted(nz):
        cands = [m for m in capped[asg[src]] if m != src]
        se = vecs[src]
        scored = sorted(
            (
                (-round(float(se @ vecs[m]) / (np.linalg.norm(se) * np.linalg.norm(vecs[m])), 4), m)
                for m in cands
            ),
        )[:3]
        for rank, (negsim, m) in enumerate(scored, 1):
            want[(src, rank)] = (m, -negsim)
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0], key
        assert abs(got[key][1] - want[key][1]) < 1e-9, key


def test_sampled_ivf_training_matches_full_on_tight_clusters(spark, tmp_path):
    """r11: the 100 TB training path — Lloyd's on the md5-top-s sample +
    one frozen-centroid full-corpus pass — must not cost recall in the
    regime the index is FOR (tight clusters): recall@10 at nprobe=1
    equals the full-corpus-trained index's 1.00 (BASELINE.md r11)."""
    import numpy as np

    from adk_noui_vectordb_spark.operators import ann
    from tools.make_clustered_embeddings import make

    base = str(tmp_path / "sampled_tight")
    make(base, 1000, 10, 0.06)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    n = len(emb)
    assign_p, cents_p = ann.build_ivf_index_sampled(spark, base, 10, 2, 32)
    cent_rows = sorted(
        (r["cluster"], list(r["c"]))
        for r in spark.read.parquet(cents_p).collect()
    )
    hits = tot = 0
    for qid in range(5):
        got = {
            r["vec_id"]
            for r in ann._ivf_serve_topk(
                spark, assign_p, cent_rows, qid, 10, 1
            ).collect()
        }
        q = emb[qid]
        cos = (emb @ q) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(q))
        order = sorted(
            (i for i in range(n) if i != qid), key=lambda i: (-round(cos[i], 4), i)
        )
        hits += len(got & set(order[:10]))
        tot += 10
    assert hits / tot >= 0.95, f"sampled-trained recall {hits / tot}"


def test_sampled_ivfpq_recall_on_tight_clusters(spark, tmp_path):
    """r11: the fully sample-trained IVFADC (sampled coarse + sampled
    residual codebooks) must match the full-trained index's recall in
    its design regime — measured 1.00 on the tight 2000-vec fixture at
    nprobe=2/cand=100 (BASELINE.md r11; this pins a 0.9 floor on that
    EXACT configuration — smaller corpora can land the 2-iteration
    sampled Lloyd's in a worse seed basin, the documented mild-fixture
    class, so the pin stays on the measured config)."""
    import numpy as np

    from adk_noui_vectordb_spark.operators import ann
    from tools.make_clustered_embeddings import make

    base = str(tmp_path / "sivfpq")
    make(base, 2000, 20, 0.06)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    n = len(emb)
    hits = tot = 0
    for qid in range(5):
        got = {
            r["vec_id"]
            for r in ann.ann_ivfpq_sampled_topk(
                spark, base, query_vec_id=qid, topk=10, nprobe=2,
                candidates=100, n_centroids=10,
            ).collect()
        }
        q = emb[qid]
        d2 = ((emb - q) ** 2).sum(axis=1)
        order = sorted(
            (i for i in range(n) if i != qid),
            key=lambda i: (round(float(d2[i] * 1e6)), i),
        )
        hits += len(got & set(order[:10]))
        tot += 10
    assert hits / tot >= 0.9, f"sampled IVFPQ recall {hits / tot}"


def test_ivfpq_drift_detection_and_rebalance(spark, tmp_path):
    """The composed-index half of VERDICT r11 next #4: frozen-codebook
    streamed ingest of a drifted region must FIRE the quantization-
    error metric (codebooks never saw the new region, so ADC error
    explodes); rebalance_ivfpq_index retrains coarse + codebooks on the
    index's own vecs and re-encodes, the metric resets to baseline, and
    the rebalanced index EQUALS a fresh sampled build over the combined
    corpus (plist, cents, pqcents — same trainer code paths)."""
    import os

    import numpy as np

    from adk_noui_vectordb_spark.operators import ann

    rng = np.random.default_rng(13)
    dim = 64  # the PQ kernel's asserted dimensionality
    centers = rng.normal(size=(4, dim))
    rows_a = [
        (i, [float(x) for x in (centers[i % 4] + rng.normal(scale=0.05, size=dim))])
        for i in range(200)
    ]
    far = rng.normal(size=dim) * 10.0
    rows_b = [
        (1000 + i, [float(x) for x in (far + rng.normal(scale=0.05, size=dim))])
        for i in range(100)
    ]
    base = str(tmp_path / "pqdrift")
    os.makedirs(base)
    schema = "vec_id bigint, embedding array<double>"
    spark.createDataFrame(rows_a, schema).write.parquet(
        os.path.join(base, "embeddings.parquet")
    )
    P = dict(n_centroids=4, ivf_iters=2, m=4, k=8, pq_iters=2)
    ann.build_ivfpq_index(spark, base, *P.values())
    m0 = ann.ivfpq_drift_metrics(spark, base, *P.values())
    assert m0["drifted"] is False, m0

    ann.update_ivfpq_index(
        spark, base, spark.createDataFrame(rows_b, schema), *P.values()
    )
    m1 = ann.ivfpq_drift_metrics(spark, base, *P.values())
    assert m1["drifted"] is True, m1
    assert m1["qerr_growth"] > ann.DRIFT_RESIDUAL_THRESHOLD, m1
    checks = {
        c[0]: (c[1], c[2])
        for c in ann.fsck_ivfpq_index(spark, base, *P.values())
    }
    assert checks["codebook_drift"][0] is False
    assert "rebalance_ivfpq_index" in checks["codebook_drift"][1]
    assert checks["plist_vecs_same_ids"][0] is True
    assert checks["m_codes_per_vector"][0] is True

    cur = ann.rebalance_ivfpq_index(
        spark, base, *P.values(), train_per_cell=32
    )
    m2 = ann.ivfpq_drift_metrics(spark, base, *P.values())
    assert m2["drifted"] is False, m2
    assert abs(m2["qerr_growth"] - 1.0) < 1e-9  # baseline reset to retrain
    checks2 = {c[0]: c[1] for c in ann.fsck_ivfpq_index(spark, base, *P.values())}
    assert all(checks2.values()), checks2

    # equality-with-rebuild: fresh sampled build over the combined corpus
    base2 = str(tmp_path / "pqdrift_rebuild")
    os.makedirs(base2)
    spark.createDataFrame(rows_a + rows_b, schema).write.parquet(
        os.path.join(base2, "embeddings.parquet")
    )
    cur2 = ann.build_ivfpq_index_sampled(
        spark, base2, *P.values(), train_per_cell=32
    )

    def rows_of(ver, comp, schema_):
        df = (
            spark.read.schema(schema_).parquet(os.path.join(ver, comp))
            if schema_
            else spark.read.parquet(os.path.join(ver, comp))
        )
        return sorted(tuple(r) for r in df.collect())

    assert rows_of(cur, "plist", ann.IVFPQ_PLIST_SCHEMA) == rows_of(
        cur2, "plist", ann.IVFPQ_PLIST_SCHEMA
    )
    c_got = sorted(
        (r["cluster"], tuple(r["c"]))
        for r in spark.read.parquet(os.path.join(cur, "cents")).collect()
    )
    c_want = sorted(
        (r["cluster"], tuple(r["c"]))
        for r in spark.read.parquet(os.path.join(cur2, "cents")).collect()
    )
    assert c_got == c_want
    pq_got = sorted(
        (r["subspace"], r["code"], tuple(r["c"]))
        for r in spark.read.parquet(os.path.join(cur, "pqcents")).collect()
    )
    pq_want = sorted(
        (r["subspace"], r["code"], tuple(r["c"]))
        for r in spark.read.parquet(os.path.join(cur2, "pqcents")).collect()
    )
    assert pq_got == pq_want


def test_ivf_drift_detection_and_rebalance(spark, tmp_path):
    """VERDICT r11 next #4: frozen-centroid streamed ingest of a
    drifted region must FIRE the drift metric; rebalance_ivf_index
    retrains (sampled) + reassigns, the metric recovers, and the
    rebalanced index EQUALS a fresh sampled build over the combined
    corpus (same trainer code path, same md5 sample discipline)."""
    import os

    import numpy as np

    from adk_noui_vectordb_spark.operators import ann

    rng = np.random.default_rng(7)
    dim = 8
    centers = rng.normal(size=(4, dim))
    rows_a = [
        (i, [float(x) for x in (centers[i % 4] + rng.normal(scale=0.05, size=dim))])
        for i in range(200)
    ]
    far = rng.normal(size=dim) * 10.0
    rows_b = [
        (1000 + i, [float(x) for x in (far + rng.normal(scale=0.05, size=dim))])
        for i in range(100)
    ]
    base = str(tmp_path / "drift")
    os.makedirs(base)
    schema = "vec_id bigint, embedding array<double>"
    spark.createDataFrame(rows_a, schema).write.parquet(
        os.path.join(base, "embeddings.parquet")
    )
    ann.build_ivf_index(spark, base, n_centroids=4, iters=2)
    m0 = ann.ivf_drift_metrics(spark, base, 4, 2)
    assert m0["drifted"] is False, m0

    ann.update_ivf_index(
        spark, base, spark.createDataFrame(rows_b, schema), 4, 2
    )
    m1 = ann.ivf_drift_metrics(spark, base, 4, 2)
    assert m1["drifted"] is True, m1
    assert m1["residual_growth"] > ann.DRIFT_RESIDUAL_THRESHOLD, m1
    checks = {c[0]: (c[1], c[2]) for c in ann.fsck_ivf_index(spark, base, 4, 2)}
    assert checks["centroid_drift"][0] is False
    assert "rebalance_ivf_index" in checks["centroid_drift"][1]
    assert checks["assign_vecs_same_ids"][0] is True

    assign_p, cents_p = ann.rebalance_ivf_index(
        spark, base, 4, 2, train_per_cell=32
    )
    m2 = ann.ivf_drift_metrics(spark, base, 4, 2)
    assert m2["drifted"] is False, m2
    assert abs(m2["residual_growth"] - 1.0) < 1e-9  # baseline reset to retrain
    checks2 = {c[0]: c[1] for c in ann.fsck_ivf_index(spark, base, 4, 2)}
    assert all(checks2.values()), checks2

    # equality-with-rebuild: fresh sampled build over the combined corpus
    base2 = str(tmp_path / "drift_rebuild")
    os.makedirs(base2)
    spark.createDataFrame(rows_a + rows_b, schema).write.parquet(
        os.path.join(base2, "embeddings.parquet")
    )
    assign_p2, cents_p2 = ann.build_ivf_index_sampled(
        spark, base2, 4, 2, train_per_cell=32
    )
    got = sorted(
        (r["vec_id"], r["cluster"])
        for r in spark.read.schema(ann.IVF_ASSIGN_SCHEMA).parquet(assign_p).collect()
    )
    want = sorted(
        (r["vec_id"], r["cluster"])
        for r in spark.read.schema(ann.IVF_ASSIGN_SCHEMA).parquet(assign_p2).collect()
    )
    assert got == want
    c_got = sorted(
        (r["cluster"], tuple(r["c"]))
        for r in spark.read.parquet(cents_p).collect()
    )
    c_want = sorted(
        (r["cluster"], tuple(r["c"]))
        for r in spark.read.parquet(cents_p2).collect()
    )
    assert c_got == c_want
