"""Navigable-graph ANN (operators/graph_ann.py): build invariants,
deterministic serving, and the recall gate vs IVF nprobe=1 on the tight
clustered fixture (VERDICT r11 next #1's done-criterion)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators import ann
from adk_noui_vectordb_spark.operators import graph_ann as ga


@pytest.fixture(scope="module")
def tight(spark, tmp_path_factory):
    from tools.make_clustered_embeddings import make

    base = str(tmp_path_factory.mktemp("gann") / "tight")
    make(base, 1000, 10, 0.06)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    return base, emb


def _exact10(emb, qid):
    q = emb[qid]
    cos = (emb @ q) / (np.linalg.norm(emb, axis=1) * np.linalg.norm(q))
    n = len(emb)
    return set(
        sorted(
            (i for i in range(n) if i != qid),
            key=lambda i: (-round(cos[i], 4), i),
        )[:10]
    )


def test_graph_recall_beats_ivf_nprobe1_on_tight_clusters(spark, tight):
    """The r12 gate: recall@10 vs exact 4-dp cosine on the tight
    clustered fixture must be >= the IVF nprobe=1 index's — the
    hub-seeded beam reaches the query's whole cell (IVF@1's candidate
    set) AND cross-cell neighbors via the hub mesh. Measured 1.00 vs
    0.97 over 8 queries; pinned at >= with a 0.95 floor. The fixture
    interleaves 10 true clusters into 8 derived cells, which is
    exactly the regime that exposed the two structural traps the
    design closes (isolated sub-cluster components -> star bridges;
    low-scoring regional doors -> hubmap seeding)."""
    base, emb = tight
    g_hits = i_hits = tot = 0
    n = len(emb)
    assign_p, cents_p = ann.build_ivf_index_sampled(
        spark, base, ann.derived_cell_count(n), 2, ann.IVF_JOIN_TRAIN_PER_CELL
    )
    cent_rows = sorted(
        (r["cluster"], list(r["c"]))
        for r in spark.read.parquet(cents_p).collect()
    )
    for qid in range(8):
        truth = _exact10(emb, qid)
        g = {
            r["vec_id"]
            for r in ga.ann_graph_topk(spark, base, query_vec_id=qid, k=10).collect()
        }
        ivf = {
            r["vec_id"]
            for r in ann._ivf_serve_topk(
                spark, assign_p, cent_rows, qid, 10, 1
            ).collect()
        }
        g_hits += len(g & truth)
        i_hits += len(ivf & truth)
        tot += 10
    assert g_hits / tot >= i_hits / tot, (g_hits / tot, i_hits / tot)
    assert g_hits / tot >= 0.95, g_hits / tot


def test_graph_recursive_mesh_has_no_large_allpairs_level(spark, tight):
    """VERDICT r12 next #1 done-criteria: forcing ``hub_allpairs_max``
    below the hub count makes the mesh RECURSE through the cell-blocked
    join (HNSW log-layering) instead of the all-pairs hub join. The
    frozen ``hub_mesh_levels`` witness the invariant: every level that
    exceeds the gate was cell-blocked (candidates ≤ c × CELL_CAP,
    linear), only the final level — ≤ the gate by construction — is
    all-pairs, and levels shrink strictly (termination). Recall on the
    tight fixture is unchanged vs the all-pairs build (measured 1.00
    over 8 queries; pinned at the same 0.95 floor as the r12 gate)."""
    import json

    base, emb = tight
    apm = 4
    cur = ga.build_graph_index(spark, base, hub_allpairs_max=apm)
    stats = json.load(open(os.path.join(cur, "build_stats.json")))
    levels = stats["hub_mesh_levels"]
    assert stats["hub_allpairs_max"] == apm
    assert len(levels) >= 2, levels  # the recursion actually fired
    assert all(c > apm for c in levels[:-1]), levels
    assert levels[-1] <= apm, levels
    assert all(a > b for a, b in zip(levels, levels[1:])), levels
    hits = tot = 0
    for qid in range(8):
        got = {
            r["vec_id"]
            for r in ga.ann_graph_recursive_topk(
                spark, base, query_vec_id=qid, k=10, hub_allpairs_max=apm
            ).collect()
        }
        hits += len(got & _exact10(emb, qid))
        tot += 10
    assert hits / tot >= 0.95, hits / tot


def test_graph_default_build_stays_single_allpairs_level(spark, sf_dir):
    """Default gate (4096) at test scale: ONE mesh level, all-pairs —
    the historical behavior, byte-identical edge set (the r12 pins and
    the oracle sweep depend on the default path not moving)."""
    import json

    cur = ga.build_graph_index(spark, sf_dir)
    stats = json.load(open(os.path.join(cur, "build_stats.json")))
    assert len(stats["hub_mesh_levels"]) == 1, stats["hub_mesh_levels"]
    assert stats["hub_allpairs_max"] == ga.GRAPH_HUB_ALLPAIRS_MAX


def test_graph_acorn_filtered_beats_blind_emission_filter(spark, tight):
    """ACORN predicate-aware traversal (VERDICT r12 next #4): on the
    clustered fixture with the same-label predicate (selectivity 0.1),
    the pass-first frontier + failing-neighbor second hop returns a
    FULL k of matches with recall >= the emission-filtered blind pool's
    on every query, and emits only matching rows."""
    base, emb = tight
    lab = spark.read.parquet(base + "/embeddings.parquet").select(
        "vec_id", "label"
    )
    label_of = {r["vec_id"]: r["label"] for r in lab.collect()}
    for qid in (0, 3):
        want = label_of[qid]
        truth = set(
            sorted(
                (
                    i
                    for i in range(len(emb))
                    if i != qid and label_of[i] == want
                ),
                key=lambda i: (
                    -round(
                        float(
                            np.dot(emb[i], emb[qid])
                            / (
                                np.linalg.norm(emb[i])
                                * np.linalg.norm(emb[qid])
                            )
                        ),
                        4,
                    ),
                    i,
                ),
            )[:10]
        )
        acorn = [
            tuple(r)
            for r in ga.ann_graph_acorn_topk(
                spark, base, query_vec_id=qid, k=10
            ).collect()
        ]
        blind = {
            r["vec_id"]
            for r in ga.ann_graph_filtered_topk(
                spark, base, query_vec_id=qid, k=10
            ).collect()
        }
        got = {vid for _rk, vid, _s in acorn}
        assert len(acorn) == 10
        assert all(label_of[vid] == want for vid in got)
        assert len(got & truth) >= len(blind & truth), (qid, got, blind)
        assert len(got & truth) / 10 >= 0.9, (qid, len(got & truth))


def test_graph_index_fsck_invariants(spark, sf_dir):
    checks = ga.fsck_graph_index(spark, sf_dir)
    bad = [c for c in checks if not c[1]]
    assert not bad, bad


def test_graph_serve_is_deterministic_and_excludes_query(spark, sf_dir):
    a = [tuple(r) for r in ga.ann_graph_topk(spark, sf_dir, query_vec_id=0, k=10).collect()]
    b = [tuple(r) for r in ga.ann_graph_topk(spark, sf_dir, query_vec_id=0, k=10).collect()]
    assert a == b
    assert len(a) == 10
    assert all(r[1] != 0 for r in a)
    assert [r[0] for r in a] == list(range(1, 11))
    sims = [r[2] for r in a]
    assert sims == sorted(sims, reverse=True)


def test_graph_edges_are_bidirectional_with_star_coverage(spark, sf_dir):
    """Every nonzero vector must be REACHABLE: it has an outgoing star
    bridge to its cell hub, and the reversal cap keeps the hub's way
    back (structural connectivity per cell — the measured failure mode
    was whole sub-clusters with inbound-only edges)."""
    cur = ga.build_graph_index(spark, sf_dir)
    edges = spark.read.schema(ga.GRAPH_EDGES_SCHEMA).parquet(
        os.path.join(cur, "edges")
    )
    vecs = spark.read.schema(ann.VECS_SCHEMA).parquet(os.path.join(cur, "vecs"))
    nz = vecs.filter(ann._nonzero_pred()).select("vec_id")
    no_out = nz.join(
        edges.select(F.col("src").alias("vec_id")).distinct(), "vec_id", "left_anti"
    ).count()
    # a singleton-cell hub has no same-cell partner and no star target,
    # but with derived c over the testdata corpora every cell has >= 2
    # nonzero members, so every vector is a source
    assert no_out == 0, f"{no_out} nonzero vectors have no outgoing edge"
    hubmap = spark.read.schema(ga.GRAPH_HUBMAP_SCHEMA).parquet(
        os.path.join(cur, "hubmap")
    )
    stars = edges.join(
        hubmap.select(
            F.col("vec_id").alias("src"), F.col("hub").alias("nbr")
        ).filter(F.col("src") != F.col("nbr")),
        ["src", "nbr"],
        "inner",
    ).count()
    expected = (
        hubmap.filter(F.col("vec_id") != F.col("hub"))
        .join(nz, "vec_id")
        .count()
    )
    assert stars == expected, f"star bridges {stars} != nonzero non-hub rows {expected}"


def test_graph_incremental_insert_serves_new_vectors(spark, tight, tmp_path):
    """update_graph_index (the HNSW add_items analog, frozen coarse
    structure): inserted vectors become REACHABLE — a query near the
    batch finds its batch neighbors — fsck stays green, the op is
    ADD-only, and existing adjacency rows are never rewritten (their
    partitions gain append files; reversals give old nodes doors to
    the new vectors)."""
    import os

    import numpy as np
    from pyspark.sql import functions as F

    base, emb = tight
    # private copy: an update makes the root represent corpus ∪ batch
    priv = str(tmp_path / "gupd")
    os.makedirs(priv)
    spark.read.parquet(base + "/embeddings.parquet").write.parquet(
        os.path.join(priv, "embeddings.parquet")
    )
    cur0 = ga.build_graph_index(spark, priv)
    # batch: 20 clones-with-noise of vector 3's neighborhood
    rng = np.random.default_rng(11)
    v3 = emb[3]
    rows = [
        (50_000 + i, [float(x) for x in (v3 + rng.normal(scale=0.01, size=len(v3)))])
        for i in range(20)
    ]
    batch = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cur1 = ga.update_graph_index(spark, priv, batch)
    assert cur1 != cur0

    # the query at vec 3 now ranks batch members in its top-10
    got = {
        r["vec_id"]
        for r in ga.ann_graph_topk(spark, priv, query_vec_id=3, k=10).collect()
    }
    assert any(v >= 50_000 for v in got), got

    checks = {c[0]: (c[1], c[2]) for c in ga.fsck_graph_index(spark, priv)}
    bad = {k: v for k, v in checks.items() if not v[0]}
    assert not bad, bad

    # replay idempotence: resubmitting the IDENTICAL batch is a no-op
    # (the streaming crash-window contract) — same version, no commit
    assert ga.update_graph_index(spark, priv, batch) == cur1
    # but PARTIAL overlap is a real conflict: ADD-only raises
    import pytest as _pt

    mixed = spark.createDataFrame(
        [(50_000, rows[0][1]), (60_000, rows[1][1])],
        "vec_id bigint, embedding array<double>",
    )
    with _pt.raises(ValueError, match="ADD-only"):
        ga.update_graph_index(spark, priv, mixed)


def test_graph_tombstone_serving_equals_solo_minus_deleted(spark, sf_dir):
    """Mark-delete semantics end-to-end: traversal is tombstone-blind,
    so the tombstone-aware top-10 after deleting the blind search's
    top-2 is EXACTLY the blind top-12 minus its first two, re-ranked
    1..10 — the k-th..k+2-th neighbors surface, nothing else moves."""
    solo = [
        (r["vec_id"], r["sim"])
        for r in ga.ann_graph_topk(spark, sf_dir, query_vec_id=0, k=12).collect()
    ]
    got = [
        (r["rank"], r["vec_id"], r["sim"])
        for r in ga.ann_graph_tombstone_topk(
            spark, sf_dir, query_vec_id=0, n_delete=2, k=10
        ).collect()
    ]
    want = [(i + 1, vid, s) for i, (vid, s) in enumerate(solo[2:])]
    assert got == want
    # and the delete is replay-idempotent: the same call again no-ops
    assert got == [
        (r["rank"], r["vec_id"], r["sim"])
        for r in ga.ann_graph_tombstone_topk(
            spark, sf_dir, query_vec_id=0, n_delete=2, k=10
        ).collect()
    ]


def test_graph_delete_lifecycle(spark, tight, tmp_path):
    """delete_from_graph_index on a private root: unknown ids raise,
    identical-batch replay no-ops, partial overlap raises, deleting a
    ROUTING-CRITICAL node (the query's own cell hub) leaves traversal
    untouched (visited set identical — the reason mark-delete never
    rips nodes out), an insert after a delete carries tombstones
    through (no resurrection), and fsck's tombstone checks hold."""
    base, _emb = tight
    priv = str(tmp_path / "gdel")
    os.makedirs(priv)
    spark.read.parquet(base + "/embeddings.parquet").write.parquet(
        os.path.join(priv, "embeddings.parquet")
    )
    cur0 = ga.build_graph_index(spark, priv)
    with pytest.raises(ValueError, match="not in the index"):
        ga.delete_from_graph_index(spark, priv, [999_999])

    # the query's regional door — the worst node to lose
    hub = (
        spark.read.schema(ga.GRAPH_HUBMAP_SCHEMA)
        .parquet(os.path.join(cur0, "hubmap"))
        .filter(F.col("vec_id") == 7)
        .head()["hub"]
    )
    before = ga._beam_visited(spark, cur0, 7, beam=8, rounds=3)
    cur1 = ga.delete_from_graph_index(spark, priv, [hub, 11])
    assert cur1 != cur0
    after = ga._beam_visited(spark, cur1, 7, beam=8, rounds=3)
    assert after == before  # tombstoned nodes still route
    assert ga._tombstoned_among(spark, cur1, [hub, 11, 7]) == {hub, 11}

    # replay no-op / partial overlap raises
    assert ga.delete_from_graph_index(spark, priv, [hub, 11]) == cur1
    with pytest.raises(ValueError, match="already tombstoned"):
        ga.delete_from_graph_index(spark, priv, [11, 13])

    # an insert commit must CARRY the tombstones (no resurrection)
    batch = spark.createDataFrame(
        [(70_000, [float(x) for x in _emb[3]])],
        "vec_id bigint, embedding array<double>",
    )
    cur2 = ga.update_graph_index(spark, priv, batch)
    assert ga._tombstoned_among(spark, cur2, [hub, 11]) == {hub, 11}

    checks = {c[0]: (c[1], c[2]) for c in ga.fsck_graph_index(spark, priv)}
    assert checks["tombstones_name_indexed_vectors"][0], checks
    assert checks["tombstone_fraction_bounded"][0], checks
    bad = {k: v for k, v in checks.items() if not v[0]}
    assert not bad, bad


def test_graph_vacuum_lifecycle(spark, tight, tmp_path):
    """vacuum_graph_index physically reclaims tombstones: the new
    version has no tomb/, the deleted ids vanish from vecs AND edges
    (both endpoints), counts drop accordingly, fsck is green, a
    no-tombstone vacuum no-ops, and the lifecycle continues (a fresh
    delete commits onto the vacuumed version)."""
    base, _emb = tight
    priv = str(tmp_path / "gvac")
    os.makedirs(priv)
    spark.read.parquet(base + "/embeddings.parquet").write.parquet(
        os.path.join(priv, "embeddings.parquet")
    )
    cur0 = ga.build_graph_index(spark, priv)
    assert ga.vacuum_graph_index(spark, priv) == cur0  # nothing to do
    n0 = (
        spark.read.schema(ann.VECS_SCHEMA)
        .parquet(os.path.join(cur0, "vecs"))
        .count()
    )
    ga.delete_from_graph_index(spark, priv, [5, 17, 23])
    cur1 = ga.vacuum_graph_index(spark, priv)
    assert cur1 != cur0
    assert not os.path.isdir(os.path.join(cur1, "tomb"))
    vecs1 = spark.read.schema(ann.VECS_SCHEMA).parquet(
        os.path.join(cur1, "vecs")
    )
    assert vecs1.count() == n0 - 3
    assert vecs1.filter(F.col("vec_id").isin([5, 17, 23])).count() == 0
    edges1 = spark.read.schema(ga.GRAPH_EDGES_SCHEMA).parquet(
        os.path.join(cur1, "edges")
    )
    touching = edges1.filter(
        F.col("src").isin([5, 17, 23]) | F.col("nbr").isin([5, 17, 23])
    ).count()
    assert touching == 0
    bad = [c for c in ga.fsck_graph_index(spark, priv) if not c[1]]
    assert not bad, bad
    # the rebuilt graph still serves its region: a neighbor query works
    got = ga.ann_graph_topk(spark, priv, query_vec_id=7, k=10).collect()
    assert len(got) == 10
    assert all(r["vec_id"] not in (5, 17, 23) for r in got)
    # lifecycle continues: a fresh delete lands on the vacuumed version
    cur2 = ga.delete_from_graph_index(spark, priv, [7])
    assert ga._tombstoned_among(spark, cur2, [7, 5]) == {7}


def test_graph_filtered_serving_is_blind_traversal_plus_predicate(
    spark, sf_dir
):
    """ann_graph_filtered_topk == the blind solo search's visited pool
    post-filtered to the query's label, re-ranked — traversal must not
    change under the predicate (the hnswlib filter-functor shape)."""
    cur = ga.build_graph_index(spark, sf_dir)
    visited = ga._beam_visited(spark, cur, 0, beam=8, rounds=3)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    label_of = {
        r["vec_id"]: r["label"]
        for r in emb.filter(
            F.col("vec_id").isin(sorted({0, *visited}))
        ).select("vec_id", "label").collect()
    }
    want_label = label_of[0]
    expect = [
        (i + 1, vid, s)
        for i, (vid, s) in enumerate(
            [
                (v, s)
                for v, s in sorted(
                    visited.items(), key=lambda kv: (-kv[1], kv[0])
                )
                if label_of.get(v) == want_label
            ][:10]
        )
    ]
    got = [
        (r["rank"], r["vec_id"], r["sim"])
        for r in ga.ann_graph_filtered_topk(spark, sf_dir, 0, k=10).collect()
    ]
    assert got == expect
    assert all(label_of[vid] == want_label for _r, vid, _s in got)


def test_graph_vacuum_scratch_is_version_addressed(spark, tight, tmp_path):
    """The stale-staging regression: delete {x} → vacuum → insert new
    vectors → re-insert id x → delete {x} AGAIN → vacuum reaches the
    SAME tombstone digest over DIFFERENT vecs content. A digest-only
    scratch key would reuse the first vacuum's staged corpus and the
    second vacuum would silently DROP everything inserted in between;
    the key must include the current version name."""
    base, _emb = tight
    priv = str(tmp_path / "gvac2")
    os.makedirs(priv)
    spark.read.parquet(base + "/embeddings.parquet").write.parquet(
        os.path.join(priv, "embeddings.parquet")
    )
    cur0 = ga.build_graph_index(spark, priv)
    n0 = (
        spark.read.schema(ann.VECS_SCHEMA)
        .parquet(os.path.join(cur0, "vecs"))
        .count()
    )
    ga.delete_from_graph_index(spark, priv, [5])
    ga.vacuum_graph_index(spark, priv)
    # the in-between state a stale scratch would lose
    ga.update_graph_index(
        spark,
        priv,
        spark.createDataFrame(
            [(90_001, [float(x) for x in _emb[3]])],
            "vec_id bigint, embedding array<double>",
        ),
    )
    # ADD-only permits re-inserting id 5 now that it is physically gone
    ga.update_graph_index(
        spark,
        priv,
        spark.createDataFrame(
            [(5, [float(x) for x in _emb[8]])],
            "vec_id bigint, embedding array<double>",
        ),
    )
    ga.delete_from_graph_index(spark, priv, [5])  # same digest as before
    cur2 = ga.vacuum_graph_index(spark, priv)
    vecs2 = spark.read.schema(ann.VECS_SCHEMA).parquet(
        os.path.join(cur2, "vecs")
    )
    assert vecs2.filter(F.col("vec_id") == 90_001).count() == 1  # KEPT
    assert vecs2.filter(F.col("vec_id") == 5).count() == 0
    assert vecs2.count() == n0  # n0 - original 5 + 90001
    bad = [c for c in ga.fsck_graph_index(spark, priv) if not c[1]]
    assert not bad, bad


def test_graph_drift_detection_and_rebuild(spark, tmp_path):
    """The graph family's drift story (the IVF/IVFADC symmetry):
    streamed inserts of a far region under the FROZEN coarse structure
    fire fsck's coarse-drift advisory; rebuild_graph_index retrains the
    whole structure over the index's own vecs (reclaiming tombstones on
    the way), the baseline resets, the rebuilt graph serves the new
    region, and fsck returns green."""
    import numpy as np

    rng = np.random.default_rng(21)
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
    base = str(tmp_path / "gdrift")
    os.makedirs(base)
    schema = "vec_id bigint, embedding array<double>"
    spark.createDataFrame(rows_a, schema).write.parquet(
        os.path.join(base, "embeddings.parquet")
    )
    ga.build_graph_index(spark, base)
    checks0 = {c[0]: (c[1], c[2]) for c in ga.fsck_graph_index(spark, base)}
    assert checks0["coarse_drift"][0] is True, checks0["coarse_drift"]

    ga.update_graph_index(spark, base, spark.createDataFrame(rows_b, schema))
    # and a tombstone, so the rebuild proves it subsumes a vacuum
    ga.delete_from_graph_index(spark, base, [7])
    checks1 = {c[0]: (c[1], c[2]) for c in ga.fsck_graph_index(spark, base)}
    assert checks1["coarse_drift"][0] is False, checks1["coarse_drift"]
    assert "rebuild_graph_index" in checks1["coarse_drift"][1]

    cur2 = ga.rebuild_graph_index(spark, base)
    assert not os.path.isdir(os.path.join(cur2, "tomb"))
    vecs2 = spark.read.schema(ann.VECS_SCHEMA).parquet(
        os.path.join(cur2, "vecs")
    )
    assert vecs2.filter(F.col("vec_id") == 7).count() == 0  # vacuumed
    assert vecs2.filter(F.col("vec_id") >= 1000).count() == 100  # kept
    checks2 = {c[0]: (c[1], c[2]) for c in ga.fsck_graph_index(spark, base)}
    bad = {k: v for k, v in checks2.items() if not v[0]}
    assert not bad, bad
    # the rebuilt structure serves the new region: a far-batch query
    # finds its far-batch neighbors
    got = {
        r["vec_id"]
        for r in ga.ann_graph_topk(spark, base, query_vec_id=1000, k=10).collect()
    }
    assert got and all(v >= 1000 for v in got), got


def test_graph_batch_equals_per_query_serving(spark, sf_dir):
    """ann_graph_batch_topk fuses IO, not state: per-query results
    equal the solo ann_graph_topk runs row-for-row."""
    solo = []
    for qid in (0, 3, 9):
        for r in ga.ann_graph_topk(spark, sf_dir, query_vec_id=qid, k=10).collect():
            solo.append((qid, r["vec_id"], r["sim"], r["rank"]))
    bat = sorted(
        tuple(r) for r in ga.ann_graph_batch_topk(spark, sf_dir).collect()
    )
    assert sorted(solo) == bat
    assert len(bat) == 30


def test_graph_acorn_batch_equals_per_query_serving(spark, sf_dir):
    """Batched ACORN == per-query solo serving row-for-row (the
    ann_graph_batch_topk discipline carried to the predicate-aware
    beam: fused IO, per-query visited/passing state untouched)."""
    solo = []
    for qid in (0, 3, 9):
        for r in ga.ann_graph_acorn_topk(
            spark, sf_dir, query_vec_id=qid, k=10
        ).collect():
            solo.append((qid, r["vec_id"], r["sim"], r["rank"]))
    batch = [
        tuple(r) for r in ga.ann_graph_acorn_batch_topk(spark, sf_dir).collect()
    ]
    assert sorted(batch) == sorted(solo)
