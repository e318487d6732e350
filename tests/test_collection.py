"""Collection facade: the ChromaDB-compatible surface (add/upsert/query/
get/delete/count/peek) over the versioned component kernel — lifecycle,
filter semantics, and a python-model parity check for query()."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from adk_noui_vectordb_spark.api.collection import (
    Collection,
    DuplicateIDError,
    _sid_py,
)
from adk_noui_vectordb_spark.operators.ann import (
    RP_BAND_BITS,
    RP_BANDS,
    RP_PLANES,
    _rp_band_keys,
    _rp_plane_signs,
)

DIM = 8


def _vecs(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, DIM)).round(3)


def _batch(spark, ids, mat, langs=None, stars=None, docs=None):
    langs = langs or ["en"] * len(ids)
    stars = stars or list(range(len(ids)))
    docs = docs or [f"text of {i}" for i in ids]
    rows = [
        (i, [float(x) for x in mat[j]], docs[j], langs[j], int(stars[j]))
        for j, i in enumerate(ids)
    ]
    return spark.createDataFrame(
        rows, "id string, embedding array<double>, document string, lang string, stars int"
    )


@pytest.fixture()
def coll(spark, tmp_path):
    return Collection(spark, str(tmp_path / "coll"))


def test_add_count_get_roundtrip(spark, coll):
    mat = _vecs(1, 6)
    coll.add(_batch(spark, [f"d{i}" for i in range(6)], mat, langs=["en", "de"] * 3))
    assert coll.count() == 6
    got = coll.get(ids=["d2", "d4"]).collect()
    assert [r["id"] for r in got] == ["d2", "d4"]
    assert got[0]["document"] == "text of d2"
    assert got[0]["lang"] == "en" and got[0]["stars"] == 2
    assert coll.peek(3).count() == 3


def test_add_rejects_existing_and_batch_dups(spark, coll):
    mat = _vecs(2, 3)
    coll.add(_batch(spark, ["a", "b", "c"], mat))
    with pytest.raises(DuplicateIDError):
        coll.add(_batch(spark, ["b", "x"], _vecs(3, 2)))
    with pytest.raises(ValueError, match="duplicate ids"):
        coll.add(_batch(spark, ["y", "y"], _vecs(4, 2)))
    assert coll.count() == 3


def test_upsert_replaces_everything(spark, coll):
    mat = _vecs(5, 4)
    coll.add(_batch(spark, ["a", "b", "c", "d"], mat))
    new = _vecs(6, 1)
    coll.upsert(
        _batch(spark, ["b"], new, langs=["fr"], stars=[99], docs=["rewritten"])
    )
    assert coll.count() == 4
    row = coll.get(ids=["b"]).head()
    assert (row["lang"], row["stars"], row["document"]) == ("fr", 99, "rewritten")
    # the new vector serves: querying exactly it returns b at distance 0
    top = coll.query([float(x) for x in new[0]], n_results=1).head()
    assert top["id"] == "b" and top["distance"] == 0.0
    # resubmitting the identical batch is a no-op (doc-level replace)
    before = coll.count()
    coll.upsert(_batch(spark, ["b"], new, langs=["fr"], stars=[99], docs=["rewritten"]))
    assert coll.count() == before


def _model_query(coll_rows, q, where_lang=None, k=3):
    """Python twin of query(): same banding kernel, exact cosine rerank,
    post-filter, (distance, id) order."""
    signs_t = np.array(_rp_plane_signs(RP_PLANES, DIM), dtype=np.int64).T
    mat = np.stack([r[1] for r in coll_rows])
    keys = _rp_band_keys(mat, signs_t)
    qk = _rp_band_keys(np.asarray(q, dtype=np.float64)[None, :], signs_t)[0]
    probed = set()
    for b in range(RP_BANDS):
        ks = {int(qk[b])} | {int(qk[b]) ^ (1 << bit) for bit in range(RP_BAND_BITS)}
        probed |= {(b, key) for key in ks}
    out = []
    for j, (i, v, lang) in enumerate(coll_rows):
        if not any((b, int(keys[j][b])) in probed for b in range(RP_BANDS)):
            continue
        if where_lang is not None and lang != where_lang:
            continue
        cos = round(
            float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), 4
        )
        out.append((1.0 - cos, i))
    return sorted(out)[:k]


def test_query_matches_python_model(spark, coll):
    mat = _vecs(7, 30)
    ids = [f"v{i}" for i in range(30)]
    langs = ["en" if i % 3 else "de" for i in range(30)]
    coll.add(_batch(spark, ids, mat, langs=langs))
    q = _vecs(8, 1)[0]
    rows = coll.query([float(x) for x in q], n_results=5).collect()
    model = _model_query(
        [(ids[j], mat[j], langs[j]) for j in range(30)], q, k=5
    )
    assert [(r["distance"], r["id"]) for r in rows] == [
        (pytest.approx(d), i) for d, i in model
    ]
    # filtered: the where DSL thins the SAME candidate set
    rows_f = coll.query(
        [float(x) for x in q], n_results=5, where={"lang": "de"}
    ).collect()
    model_f = _model_query(
        [(ids[j], mat[j], langs[j]) for j in range(30)], q, where_lang="de", k=5
    )
    assert [(r["distance"], r["id"]) for r in rows_f] == [
        (pytest.approx(d), i) for d, i in model_f
    ]
    assert all(r["lang"] == "de" for r in rows_f)


def test_query_batch_is_per_query_topk(spark, coll):
    mat = _vecs(9, 20)
    coll.add(_batch(spark, [f"v{i}" for i in range(20)], mat))
    qs = [[float(x) for x in mat[3]], [float(x) for x in mat[11]]]
    rows = coll.query(qs, n_results=2).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_idx"], []).append(r)
    assert set(by_q) == {0, 1}
    assert by_q[0][0]["id"] == "v3" and by_q[0][0]["distance"] == 0.0
    assert by_q[1][0]["id"] == "v11" and by_q[1][0]["distance"] == 0.0


def test_get_where_document_and_limit(spark, coll):
    mat = _vecs(10, 5)
    coll.add(
        _batch(
            spark,
            ["a", "b", "c", "d", "e"],
            mat,
            docs=["alpha beta", "beta gamma", "alpha", "delta", "beta"],
        )
    )
    got = coll.get(where_document={"$contains": "beta"}).collect()
    assert [r["id"] for r in got] == ["a", "b", "e"]
    got2 = coll.get(
        where={"stars": {"$gte": 1}},
        where_document={"$not_contains": "beta"},
        limit=1,
    ).collect()
    assert [r["id"] for r in got2] == ["c"]


def test_delete_by_ids_where_and_all(spark, coll):
    mat = _vecs(11, 8)
    ids = [f"d{i}" for i in range(8)]
    coll.add(_batch(spark, ids, mat, langs=["en", "de"] * 4))
    coll.delete(ids=["d0", "d5"])
    assert coll.count() == 6
    assert coll.get(ids=["d0", "d5"]).count() == 0
    coll.delete(where={"lang": "de"})
    assert sorted(r["id"] for r in coll.get().collect()) == ["d2", "d4", "d6"]
    # deleted vectors stop serving
    got = coll.query([float(x) for x in mat[5]], n_results=8).collect()
    assert "d5" not in {r["id"] for r in got}
    # delete everything -> legal empty state that still serves
    coll.delete(where={"stars": {"$gte": 0}})
    assert coll.count() == 0
    assert coll.query([float(x) for x in mat[0]], n_results=3).count() == 0
    assert coll.get().count() == 0
    # and repopulates
    coll.add(_batch(spark, ["z1"], _vecs(12, 1)))
    assert coll.count() == 1


def test_delete_requires_a_selector(spark, coll):
    coll.add(_batch(spark, ["a"], _vecs(13, 1)))
    with pytest.raises(ValueError):
        coll.delete()


def test_schema_and_dim_are_enforced(spark, coll):
    coll.add(_batch(spark, ["a"], _vecs(14, 1)))
    # different metadata schema
    bad = spark.createDataFrame(
        [("b", [0.0] * DIM, "x", 1.5)],
        "id string, embedding array<double>, document string, score double",
    )
    with pytest.raises(ValueError, match="mismatch"):
        coll.add(bad)
    # different dim
    bad_dim = _batch(spark, ["c"], np.zeros((1, DIM + 2)))
    with pytest.raises(ValueError, match="dim"):
        coll.add(bad_dim)
    # non-scalar metadata
    arr = spark.createDataFrame(
        [("d", [0.0] * DIM, "x", [1, 2])],
        "id string, embedding array<double>, document string, tags array<int>",
    )
    with pytest.raises(ValueError, match="scalar"):
        coll.add(arr)


def test_components_stay_consistent_across_lifecycle(spark, coll):
    """Invariant fsck: meta count == vecs count; bands == nonzero * RP_BANDS;
    surrogates in every component agree."""
    mat = _vecs(15, 10)
    mat[4] = 0.0  # zero-norm: stored, never banded
    ids = [f"k{i}" for i in range(10)]
    coll.add(_batch(spark, ids, mat))
    coll.upsert(_batch(spark, ["k1", "k7"], _vecs(16, 2)))
    coll.delete(ids=["k2"])
    cur, info = coll._require()
    meta = coll._meta(cur, info)
    vecs = coll._vecs(cur)
    bands = coll._bands(cur)
    assert meta.count() == 9 and vecs.count() == 9
    assert bands.count() == 8 * RP_BANDS  # k4 is zero-norm
    assert (
        vecs.join(meta, "vec_id", "left_anti").count() == 0
        and meta.join(vecs, "vec_id", "left_anti").count() == 0
        and bands.join(vecs, "vec_id", "left_anti").count() == 0
    )
    # surrogate mapping is the documented md5 contract
    sids = {r["vec_id"] for r in meta.select("vec_id").collect()}
    assert sids == {_sid_py(i) for i in ids if i != "k2"}


def test_empty_batch_is_noop(spark, coll):
    coll.add(_batch(spark, ["a"], _vecs(17, 1)))
    empty = _batch(spark, ["a"], _vecs(17, 1)).limit(0)
    coll.add(empty)
    assert coll.count() == 1


def test_query_probe_prunes_band_partitions(spark, coll):
    """The band scan must carry partition filters (static pruning) —
    the plan reads probed bucket directories, not the table."""
    mat = _vecs(18, 12)
    coll.add(_batch(spark, [f"p{i}" for i in range(12)], mat))
    df = coll.query([float(x) for x in mat[0]], n_results=3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "band" in plan  # sanity
    # the probe predicate appears as a data/partition filter on the scan
    assert "band_key" in plan

def test_rollback_undoes_a_bad_batch(spark, coll):
    mat = _vecs(20, 4)
    coll.add(_batch(spark, ["a", "b", "c", "d"], mat))
    assert [v["current"] for v in coll.versions()] == [True]
    coll.upsert(_batch(spark, ["b"], _vecs(21, 1), langs=["XX"], docs=["corrupted"]))
    assert coll.get(ids=["b"]).head()["lang"] == "XX"
    coll.rollback()
    # the pre-upsert state serves again, end to end
    assert coll.count() == 4
    row = coll.get(ids=["b"]).head()
    assert row["lang"] == "en" and row["document"] == "text of b"
    top = coll.query([float(x) for x in mat[1]], n_results=1).head()
    assert top["id"] == "b" and top["distance"] == 0.0
    # and the collection stays writable after the rollback
    coll.upsert(_batch(spark, ["e"], _vecs(22, 1)))
    assert coll.count() == 5


def test_merge_disjoint_shards(spark, tmp_path):
    """The distributed-build pattern: two shards built independently,
    folded into one serving collection with zero recompute."""
    a = Collection(spark, str(tmp_path / "shard_a"))
    b = Collection(spark, str(tmp_path / "shard_b"))
    dst = Collection(spark, str(tmp_path / "merged"))
    ma, mb = _vecs(30, 5), _vecs(31, 5)
    a.add(_batch(spark, [f"a{i}" for i in range(5)], ma))
    b.add(_batch(spark, [f"b{i}" for i in range(5)], mb))
    dst.merge_from(a)  # into empty: adopts config
    dst.merge_from(b)
    assert dst.count() == 10
    # vectors from BOTH shards serve from the merged root
    for mat, pre in ((ma, "a"), (mb, "b")):
        top = dst.query([float(x) for x in mat[2]], n_results=1).head()
        assert top["id"] == f"{pre}2" and top["distance"] == 0.0
    # component invariants survive the merge
    cur, info = dst._require()
    assert dst._vecs(cur).count() == 10
    assert dst._bands(cur).count() == 10 * RP_BANDS


def test_merge_conflict_modes(spark, tmp_path):
    a = Collection(spark, str(tmp_path / "ca"))
    b = Collection(spark, str(tmp_path / "cb"))
    ma, mb = _vecs(32, 3), _vecs(33, 3)
    a.add(_batch(spark, ["x", "y", "z"], ma, stars=[1, 1, 1]))
    b.add(_batch(spark, ["y", "w", "v"], mb, stars=[2, 2, 2]))
    with pytest.raises(DuplicateIDError):
        a.merge_from(b)
    # keep_self: destination's y wins
    a2 = Collection(spark, str(tmp_path / "ca2"))
    a2.merge_from(a)
    a2.merge_from(b, on_conflict="keep_self")
    assert a2.count() == 5
    assert a2.get(ids=["y"]).head()["stars"] == 1
    # replace: source's y wins, and its NEW vector serves
    a3 = Collection(spark, str(tmp_path / "ca3"))
    a3.merge_from(a)
    a3.merge_from(b, on_conflict="replace")
    assert a3.count() == 5
    assert a3.get(ids=["y"]).head()["stars"] == 2
    top = a3.query([float(x) for x in mb[0]], n_results=1).head()
    assert top["id"] == "y" and top["distance"] == 0.0
    cur, info = a3._require()
    assert a3._vecs(cur).count() == 5 and a3._meta(cur, info).count() == 5


def test_merge_config_mismatch_raises(spark, tmp_path):
    a = Collection(spark, str(tmp_path / "ma"))
    a.add(_batch(spark, ["a"], _vecs(34, 1)))
    b = Collection(spark, str(tmp_path / "mb"))
    rows = [("b", [0.0] * (DIM + 4), "doc", "en", 1)]
    b.add(
        spark.createDataFrame(
            rows,
            "id string, embedding array<double>, document string, lang string, stars int",
        )
    )
    with pytest.raises(ValueError, match="config mismatch"):
        a.merge_from(b)


def test_query_texts_end_to_end(spark, tmp_path):
    """The reference's semantic_search(query: str) on the facade: docs
    embedded by the engine's embedder, a text query embeds driver-side
    and retrieves its own document at distance 0."""
    from adk_noui_vectordb_spark.operators.embed import _get_model

    model = _get_model()
    texts = [
        "spark query filter join",
        "window sort merge batch",
        "vector table scan row",
        "hash group agg key",
    ]
    vecs = model.encode(texts)
    c = Collection(spark, str(tmp_path / "textcoll"))
    c.add(
        spark.createDataFrame(
            [
                (f"t{i}", vecs[i], texts[i], "en")
                for i in range(len(texts))
            ],
            "id string, embedding array<double>, document string, lang string",
        )
    )
    top = c.query(query_texts=texts[2], n_results=2).collect()
    assert top[0]["id"] == "t2" and top[0]["distance"] == 0.0
    # exactly one of embeddings/texts
    with pytest.raises(ValueError, match="exactly one"):
        c.query()
    with pytest.raises(ValueError, match="exactly one"):
        c.query(query_embeddings=[vecs[0]], query_texts="x")
    # dim guard: an 8-dim collection rejects the 64-dim embedder
    c8 = Collection(spark, str(tmp_path / "dim8"))
    c8.add(_batch(spark, ["a"], _vecs(40, 1)))
    with pytest.raises(ValueError, match="embedder dim"):
        c8.query(query_texts="hello")


def test_fsck_and_include_embeddings(spark, coll):
    mat = _vecs(50, 6)
    coll.add(_batch(spark, [f"f{i}" for i in range(6)], mat))
    coll.upsert(_batch(spark, ["f1"], _vecs(51, 1)))
    coll.delete(ids=["f4"])
    checks = coll.fsck()
    assert all(ok for _c, ok, _d in checks), checks
    got = coll.get(ids=["f2"], include_embeddings=True).head()
    assert got["embedding"] == pytest.approx([float(x) for x in mat[2]])
    # default path carries no vector payload
    assert "embedding" not in coll.get(ids=["f2"]).columns


def test_client_named_collections(spark, tmp_path):
    """PersistentClient parity: the reference's two-collection layout
    (code_elements + file_summaries) under one base dir."""
    from adk_noui_vectordb_spark.api.collection import Client

    cl = Client(spark, str(tmp_path / "chroma"))
    code = cl.create_collection("code_elements")
    files = cl.get_or_create_collection("file_summaries")
    assert cl.list_collections() == ["code_elements", "file_summaries"]
    with pytest.raises(ValueError, match="already exists"):
        cl.create_collection("code_elements")
    with pytest.raises(ValueError, match="does not exist"):
        cl.get_collection("nope")
    with pytest.raises(ValueError, match="invalid"):
        cl.get_collection("../escape")

    code.add(_batch(spark, ["e1", "e2"], _vecs(60, 2)))
    files.add(_batch(spark, ["f1"], _vecs(61, 1)))
    # reopen by name — same on-disk state (the vector_search_tool side)
    assert cl.get_collection("code_elements").count() == 2
    assert cl.get_collection("file_summaries").count() == 1

    cl.delete_collection("file_summaries")
    assert cl.list_collections() == ["code_elements"]
    with pytest.raises(ValueError):
        cl.delete_collection("file_summaries")


def test_disjoint_merge_is_metadata_only(spark, tmp_path):
    """The fast path never reads or writes row data: every data file of
    the merged version is a HARDLINK (same inode) of a source file."""
    import os

    a = Collection(spark, str(tmp_path / "ha"))
    b = Collection(spark, str(tmp_path / "hb"))
    a.add(_batch(spark, ["a1", "a2"], _vecs(70, 2)))
    b.add(_batch(spark, ["b1", "b2"], _vecs(71, 2)))
    dst = Collection(spark, str(tmp_path / "hm"))
    dst.merge_from(a)
    dst.merge_from(b)

    def inodes(root_dir):
        out = set()
        for dp, _dn, fs in os.walk(root_dir):
            for f in fs:
                if f.endswith(".parquet"):
                    out.add(os.stat(os.path.join(dp, f)).st_ino)
        return out

    cur, info = dst._require()
    src_inodes = inodes(str(tmp_path / "ha")) | inodes(str(tmp_path / "hb"))
    for comp in ("bands", "vecs", "meta"):
        got = inodes(os.path.join(cur, comp))
        assert got and got <= src_inodes, comp  # every file linked, none rewritten
    # and it still SERVES correctly
    assert dst.count() == 4
    assert all(ok for _c, ok, _d in dst.fsck()), dst.fsck()


def test_distance_spaces(spark, tmp_path):
    """l2 and ip spaces rerank in their OWN metric; a reopen with the
    wrong space fails loudly (the metric-mismatch guard)."""
    import numpy as np

    mat = _vecs(80, 10)
    q = _vecs(81, 1)[0]
    l2 = Collection(spark, str(tmp_path / "l2c"), space="l2")
    l2.add(_batch(spark, [f"v{i}" for i in range(10)], mat))
    got = [(r["id"], r["distance"]) for r in l2.query([float(x) for x in q], n_results=3).collect()]
    want = sorted(
        (round(float(np.linalg.norm(mat[i] - q)), 4), f"v{i}") for i in range(10)
    )[:3]
    assert got == [(i, pytest.approx(d)) for d, i in want]

    ip = Collection(spark, str(tmp_path / "ipc"), space="ip")
    ip.add(_batch(spark, [f"v{i}" for i in range(10)], mat))
    got_ip = [r["id"] for r in ip.query([float(x) for x in q], n_results=3).collect()]
    want_ip = [f"v{i}" for i, _ in sorted(enumerate(-(mat @ q)), key=lambda t: (round(float(t[1]), 4), f"v{t[0]}"))[:3]]
    assert got_ip == want_ip

    with pytest.raises(ValueError, match="space"):
        Collection(spark, str(tmp_path / "l2c")).count()
    with pytest.raises(ValueError, match="unknown space"):
        Collection(spark, str(tmp_path / "x"), space="hamming")


# ------------------------------------------------------- r11 facade verbs


def test_update_is_update_only(spark, coll):
    """ChromaDB update(): replaces existing rows, raises on absent ids,
    and raises on an empty collection — distinct from upsert."""
    mat = _vecs(90, 4)
    with pytest.raises(KeyError, match="empty"):
        coll.update(_batch(spark, ["u0"], mat[:1]))
    coll.add(_batch(spark, ["u0", "u1", "u2"], mat[:3]))
    coll.update(_batch(spark, ["u1"], mat[3:4], docs=["rewritten"], stars=[99]))
    got = {r["id"]: (r["document"], r["stars"]) for r in coll.get().collect()}
    assert got["u1"] == ("rewritten", 99)
    assert got["u0"] == ("text of u0", 0)
    # one absent id poisons the whole batch; nothing commits
    before = coll.count()
    with pytest.raises(KeyError, match="not present"):
        coll.update(_batch(spark, ["u2", "nope"], mat[2:4]))
    assert coll.count() == before
    assert coll.get(ids=["u2"]).collect()[0]["document"] == "text of u2"


def test_get_offset_and_after_id_paginate(spark, coll):
    mat = _vecs(91, 8)
    ids = [f"p{i}" for i in range(8)]
    coll.add(_batch(spark, ids, mat))
    all_ids = [r["id"] for r in coll.get().collect()]
    assert all_ids == sorted(ids)
    page1 = [r["id"] for r in coll.get(limit=3).collect()]
    page2_off = [r["id"] for r in coll.get(limit=3, offset=3).collect()]
    page2_key = [r["id"] for r in coll.get(limit=3, after_id=page1[-1]).collect()]
    assert page1 + page2_off == all_ids[:6]
    assert page2_key == page2_off  # keyset page == positional page
    with pytest.raises(ValueError, match="offset OR after_id"):
        coll.get(offset=1, after_id="p0")


def test_get_include_switches(spark, coll):
    mat = _vecs(92, 3)
    coll.add(_batch(spark, ["i0", "i1", "i2"], mat))
    docs_only = coll.get(include=["documents"])
    assert set(docs_only.columns) == {"id", "document"}
    meta_only = coll.get(include=["metadatas"])
    assert set(meta_only.columns) == {"id", "lang", "stars"}
    with_emb = coll.get(include=["documents", "embeddings"])
    assert "embedding" in with_emb.columns and "lang" not in with_emb.columns
    row = with_emb.filter(F.col("id") == "i1").collect()[0]
    assert row["embedding"] == pytest.approx(list(mat[1]))
    with pytest.raises(ValueError, match="unknown items"):
        coll.get(include=["vectors"])


def test_client_threads_space_through(spark, tmp_path):
    """An l2 collection round-trips through the Client facade: the
    metric is persisted in the sidecar and read back on open, never
    guessed (VERDICT r10 next #3)."""
    from adk_noui_vectordb_spark.api.collection import Client

    cli = Client(spark, str(tmp_path / "cli"))
    c = cli.create_collection("l2coll", space="l2")
    mat = _vecs(93, 6)
    c.add(_batch(spark, [f"v{i}" for i in range(6)], mat))
    reopened = cli.get_collection("l2coll")
    assert reopened.space == "l2"
    q = _vecs(94, 1)[0]
    got = [r["id"] for r in reopened.query([float(x) for x in q], n_results=2).collect()]
    want = sorted(
        (round(float(np.linalg.norm(mat[i] - q)), 4), f"v{i}") for i in range(6)
    )[:2]
    assert got == [i for _d, i in want]
    # get_or_create on an existing collection keeps the stored space
    again = cli.get_or_create_collection("l2coll")
    assert again.space == "l2"
    # a never-written creation still honors the requested space
    fresh = cli.get_or_create_collection("ipcoll", space="ip")
    assert fresh.space == "ip"


def test_modify_rename_and_metadata(spark, tmp_path):
    from adk_noui_vectordb_spark.api.collection import Client

    cli = Client(spark, str(tmp_path / "cli2"))
    c = cli.create_collection("old_name")
    c.add(_batch(spark, ["m0", "m1"], _vecs(95, 2)))
    c.modify(metadata={"owner": "team-a"})
    assert c.metadata == {"owner": "team-a"}
    c.modify(name="new_name")
    assert c.name == "new_name"
    assert cli.list_collections() == ["new_name"]
    re2 = cli.get_collection("new_name")
    assert re2.count() == 2 and re2.metadata == {"owner": "team-a"}
    with pytest.raises(ValueError, match="does not exist"):
        cli.get_collection("old_name")
    with pytest.raises(ValueError, match="invalid"):
        c.modify(name="../evil")


def test_intra_batch_surrogate_collision_rejected(spark, tmp_path, monkeypatch):
    """Two DISTINCT ids colliding on one surrogate within a single batch
    must be rejected at write time (ADVICE r11) — pinned by weakening
    the surrogate to make a collision constructible."""
    from adk_noui_vectordb_spark.api import collection as cmod

    monkeypatch.setattr(
        cmod, "_sid_expr", lambda c: F.length(c).cast("bigint")
    )
    coll = Collection(spark, str(tmp_path / "collide"))
    with pytest.raises(cmod.SurrogateCollisionError, match="in one batch"):
        coll.add(_batch(spark, ["aa", "bb"], _vecs(96, 2)))
    assert coll._cur() is None  # nothing committed


def test_losing_add_keeps_insert_only_contract(spark, tmp_path, monkeypatch):
    """VERDICT r10 next #4: when a racing creator wins the initial
    commit, a losing add() replays with ADD semantics — overlapping ids
    raise DuplicateIDError instead of silently replacing the winner's
    rows; disjoint losers land."""
    from adk_noui_vectordb_spark.api import collection as cmod

    mat = _vecs(97, 6)
    real = cmod.vn.commit_version

    def make_racer(coll_root, winner_batch, state):
        def racing(spark_, root, plan, **kw):
            if not state["fired"]:
                state["fired"] = True
                # the racing creator's initial commit lands FIRST
                Collection(spark, coll_root).add(winner_batch)
                raise cmod.vn.ConcurrentWriterError("simulated race")
            return real(spark_, root, plan, **kw)

        return racing

    # overlapping ids: the loser must raise, winner's rows intact
    root1 = str(tmp_path / "race1")
    state = {"fired": False}
    monkeypatch.setattr(
        cmod.vn, "commit_version",
        make_racer(root1, _batch(spark, ["a", "b"], mat[:2]), state),
    )
    loser = Collection(spark, root1)
    with pytest.raises(DuplicateIDError):
        loser.add(_batch(spark, ["b", "c"], mat[2:4]))
    assert state["fired"]
    assert {r["id"] for r in loser.get().collect()} == {"a", "b"}
    assert loser.get(ids=["b"]).collect()[0]["document"] == "text of b"

    # disjoint ids: both creators' rows land
    root2 = str(tmp_path / "race2")
    state2 = {"fired": False}
    monkeypatch.setattr(
        cmod.vn, "commit_version",
        make_racer(root2, _batch(spark, ["a", "b"], mat[:2]), state2),
    )
    loser2 = Collection(spark, root2)
    loser2.add(_batch(spark, ["x", "y"], mat[4:6]))
    assert {r["id"] for r in loser2.get().collect()} == {"a", "b", "x", "y"}


def test_facade_filtered_recall_on_clustered_fixture(spark, tmp_path):
    """VERDICT r10 next #7: the facade's multiprobe-then-post-filter
    path measured end-to-end on clusterable data — a selective `where`
    thins LSH candidates by construction, and the default
    multiprobe_hamming=1 is what keeps recall high anyway (the full
    curve lives in BASELINE.md r11; this pins its floor)."""
    import numpy as np

    from tools.make_clustered_embeddings import DIM, make

    n, k_centers, sigma, k = 800, 16, 0.25, 10
    base = str(tmp_path / "frc")
    make(base, n, k_centers, sigma)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    grp = np.arange(n) % 10
    coll = Collection(spark, str(tmp_path / "frc_coll"))
    coll.add(
        spark.createDataFrame(
            [
                (f"v{i:05d}", [float(x) for x in emb[i]], f"d{i}", int(grp[i]))
                for i in range(n)
            ],
            "id string, embedding array<double>, document string, grp int",
        )
    )
    rng = np.random.RandomState(7)
    centers = np.random.RandomState(42).randn(k_centers, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    queries = centers + sigma * rng.randn(k_centers, DIM)
    nrm = np.linalg.norm(emb, axis=1)
    where = {"grp": {"$in": [0, 1]}}  # selectivity 0.2
    mask = grp < 2

    def recall(probe):
        hits = 0
        for qi in range(k_centers):
            q = queries[qi]
            cos_r = np.round((emb @ q) / (nrm * np.linalg.norm(q)), 4)
            order = sorted(
                np.arange(n)[mask], key=lambda i: (-cos_r[i], f"v{i:05d}")
            )
            truth = {f"v{i:05d}" for i in order[:k]}
            got = {
                r["id"]
                for r in coll.query(
                    [float(x) for x in q],
                    n_results=k,
                    where=where,
                    multiprobe_hamming=probe,
                ).collect()
            }
            hits += len(got & truth)
        return hits / (k_centers * k)

    r1 = recall(1)
    r0 = recall(0)
    assert r1 >= 0.9, f"default-multiprobe filtered recall fell to {r1}"
    assert r0 <= r1, (r0, r1)  # single-probe is why 1 is the default


def test_query_include_switches(spark, coll):
    mat = _vecs(98, 5)
    coll.add(_batch(spark, [f"q{i}" for i in range(5)], mat))
    q = [float(x) for x in _vecs(99, 1)[0]]
    full = coll.query(q, n_results=3)
    assert {"query_idx", "id", "distance", "document", "lang", "stars"} <= set(
        full.columns
    )
    slim = coll.query(q, n_results=3, include=["distances"])
    assert set(slim.columns) == {"query_idx", "id", "distance"}
    docs = coll.query(q, n_results=3, include=["documents"])
    assert set(docs.columns) == {"query_idx", "id", "document"}
    with_emb = coll.query(q, n_results=3, include=["distances", "embeddings"])
    rows = with_emb.collect()
    assert len(rows) == 3 and "embedding" in with_emb.columns
    # same ranking regardless of projection
    assert [r["id"] for r in rows] == [r["id"] for r in full.collect()[:3]]
    with pytest.raises(ValueError, match="unknown items"):
        coll.query(q, n_results=3, include=["scores"])


def test_partial_update_keeps_omitted_fields(spark, coll):
    """Chroma's update(ids, metadatas=...) shape: a batch omitting
    embedding/document keeps those stored values, and a metadata-only
    batch still reranks identically (vectors untouched)."""
    mat = _vecs(100, 4)
    coll.add(_batch(spark, ["w0", "w1", "w2", "w3"], mat))
    before_q = [
        r["id"]
        for r in coll.query([float(x) for x in _vecs(101, 1)[0]], n_results=4).collect()
    ]
    # metadata-only update
    coll.update(
        spark.createDataFrame([("w1", 77)], "id string, stars int")
    )
    got = {r["id"]: (r["document"], r["lang"], r["stars"]) for r in coll.get().collect()}
    assert got["w1"] == ("text of w1", "en", 77)  # doc+lang kept, stars new
    assert got["w0"][2] == 0
    after_q = [
        r["id"]
        for r in coll.query([float(x) for x in _vecs(101, 1)[0]], n_results=4).collect()
    ]
    assert after_q == before_q  # embeddings untouched by the meta update
    # document-only update
    coll.update(
        spark.createDataFrame([("w2", "rewritten body")], "id string, document string")
    )
    got2 = coll.get(ids=["w2"]).collect()[0]
    assert got2["document"] == "rewritten body" and got2["stars"] == 2
    # embedding-only update actually moves the vector
    coll.update(
        spark.createDataFrame(
            [("w3", [float(x) for x in _vecs(102, 1)[0]])],
            "id string, embedding array<double>",
        )
    )
    emb = coll.get(ids=["w3"], include=["embeddings"]).collect()[0]["embedding"]
    assert emb == pytest.approx(list(_vecs(102, 1)[0]))
    # absent id in a partial batch: nothing commits
    with pytest.raises(KeyError, match="not present"):
        coll.update(spark.createDataFrame([("nope", 1)], "id string, stars int"))
    # unknown column: loud
    with pytest.raises(ValueError, match="unknown columns"):
        coll.update(spark.createDataFrame([("w0", 1)], "id string, bogus int"))


def test_snapshot_view_serves_old_version_read_only(spark, coll):
    """Collection.at(version): time-travel READS without moving
    _CURRENT — a pinned view keeps serving the old rows while the live
    collection moves on; every mutating verb on the view raises."""
    mat = _vecs(110, 4)
    coll.add(_batch(spark, ["s0", "s1"], mat[:2]))
    v1 = coll.versions()[-1]["name"]
    coll.upsert(_batch(spark, ["s2", "s3"], mat[2:]))
    snap = coll.at(v1)
    assert {r["id"] for r in snap.get().collect()} == {"s0", "s1"}
    assert {r["id"] for r in coll.get().collect()} == {"s0", "s1", "s2", "s3"}
    assert snap.count() == 2 and coll.count() == 4
    q = [float(x) for x in _vecs(111, 1)[0]]
    assert {r["id"] for r in snap.query(q, n_results=10).collect()} <= {"s0", "s1"}
    for verb in (
        lambda: snap.upsert(_batch(spark, ["x"], mat[:1])),
        lambda: snap.delete(ids=["s0"]),
        lambda: snap.rollback(),
        lambda: snap.compact(),
        lambda: snap.modify(metadata={}),
    ):
        with pytest.raises(ValueError, match="read-only"):
            verb()
    with pytest.raises(ValueError, match="unknown version"):
        coll.at("v_999999")


def test_fork_is_hardlinked_and_divergent(spark, tmp_path):
    """fork(): the clone shares every data-file inode with the source
    (zero row data copied), serves identically, and the two roots then
    diverge independently — a write on either side never shows on the
    other."""
    import os

    from adk_noui_vectordb_spark.api.collection import Client

    cli = Client(spark, str(tmp_path / "fcli"))
    src = cli.create_collection("src")
    mat = _vecs(120, 4)
    src.add(_batch(spark, ["f0", "f1"], mat[:2]))
    fork = cli.fork_collection("src", "fork")

    def inodes(root):
        out = {}
        for dp, _dn, fs in os.walk(root):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(dp, f)
                    out[os.path.relpath(p, root)] = os.stat(p).st_ino
        return out

    # identical content served from SHARED inodes
    assert {r["id"] for r in fork.get().collect()} == {"f0", "f1"}
    si = inodes(src._cur())
    fi = inodes(fork._cur())
    assert fi and set(fi.values()) <= set(si.values())
    # divergence: each side mutates without touching the other
    fork.upsert(_batch(spark, ["f2"], mat[2:3]))
    src.delete(ids=["f0"])
    assert {r["id"] for r in fork.get().collect()} == {"f0", "f1", "f2"}
    assert {r["id"] for r in src.get().collect()} == {"f1"}
    assert all(ok for _c, ok, _d in fork.fsck()), fork.fsck()
    assert all(ok for _c, ok, _d in src.fsck()), src.fsck()
    # a second fork over an existing target refuses
    with pytest.raises(FileExistsError):
        cli.fork_collection("src", "fork")


def test_client_reset_and_heartbeat(spark, tmp_path):
    from adk_noui_vectordb_spark.api.collection import Client

    cli = Client(spark, str(tmp_path / "rcli"))
    cli.create_collection("a")
    cli.create_collection("b")
    assert cli.count_collections() == 2
    assert cli.heartbeat() > 0
    assert cli.reset() is True
    assert cli.list_collections() == []


def test_partial_update_preserves_nonalphabetical_meta_order(spark, tmp_path):
    """The assembled partial-update batch must follow the COLLECTION's
    column order (the schema string is order-sensitive), not a sorted
    order — pinned with metadata columns in reverse-alphabetical order."""
    coll = Collection(spark, str(tmp_path / "ord"))
    mat = _vecs(130, 2)
    coll.add(
        spark.createDataFrame(
            [
                ("o0", [float(x) for x in mat[0]], "d0", 5, "x"),
                ("o1", [float(x) for x in mat[1]], "d1", 6, "y"),
            ],
            "id string, embedding array<double>, document string, zeta int, alpha string",
        )
    )
    coll.update(spark.createDataFrame([("o1", 99)], "id string, zeta int"))
    got = coll.get(ids=["o1"]).collect()[0]
    assert got["zeta"] == 99 and got["alpha"] == "y" and got["document"] == "d1"


def test_add_metadata_column_evolves_the_schema(spark, coll):
    """ALTER for the typed metadata store: existing rows get the
    default, the DSL filters on the new column, partial update writes
    it, bands/vecs hardlink through untouched, and new full batches
    must carry it (schema-on-write now includes it)."""
    import os

    mat = _vecs(140, 3)
    coll.add(_batch(spark, ["e0", "e1", "e2"], mat))
    cur_before = coll._cur()
    vec_inodes_before = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _dn, fs in os.walk(os.path.join(cur_before, "vecs"))
        for f in fs
        if f.endswith(".parquet")
    }
    coll.add_metadata_column("tier", "string", default="bronze")
    got = {r["id"]: r["tier"] for r in coll.get().collect()}
    assert got == {"e0": "bronze", "e1": "bronze", "e2": "bronze"}
    # vecs hardlinked through (no vector rewrite for a metadata ALTER)
    cur_after = coll._cur()
    vec_inodes_after = {
        os.stat(os.path.join(dp, f)).st_ino
        for dp, _dn, fs in os.walk(os.path.join(cur_after, "vecs"))
        for f in fs
        if f.endswith(".parquet")
    }
    assert vec_inodes_after == vec_inodes_before
    # DSL filter + partial update on the new column
    coll.update(spark.createDataFrame([("e1", "gold")], "id string, tier string"))
    assert {
        r["id"] for r in coll.get(where={"tier": "gold"}).collect()
    } == {"e1"}
    # a new full batch must carry the evolved schema
    with pytest.raises(ValueError, match="mismatch"):
        coll.upsert(_batch(spark, ["e9"], _vecs(141, 1)))
    wide = spark.createDataFrame(
        [("e9", [float(x) for x in _vecs(141, 1)[0]], "d", "en", 1, "silver")],
        "id string, embedding array<double>, document string, lang string, stars int, tier string",
    )
    coll.upsert(wide)
    assert coll.count() == 4
    assert all(ok for _c, ok, _d in coll.fsck()), coll.fsck()
    # duplicate / reserved names rejected
    with pytest.raises(ValueError, match="already exists"):
        coll.add_metadata_column("tier", "string")
    with pytest.raises(ValueError, match="unsupported"):
        coll.add_metadata_column("blob", "array<double>")


def test_adaptive_prefilter_strategy(spark, tmp_path):
    """r11 adaptive query planning: an ultra-selective where filter
    switches query() to exact-over-survivors (recall 1.0 where the
    probe path thins below k by construction); the explicit strategies
    agree with each other on non-selective filters; 'exact' without a
    filter is rejected."""
    import numpy as np

    n = 300
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(n, DIM)).round(3)
    grp = [i % 100 for i in range(n)]  # grp==0 keeps 3 of 300 rows (1%)
    coll = Collection(spark, str(tmp_path / "adapt"))
    coll.add(
        spark.createDataFrame(
            [
                (f"a{i:04d}", [float(x) for x in mat[i]], f"d{i}", grp[i])
                for i in range(n)
            ],
            "id string, embedding array<double>, document string, grp int",
        )
    )
    q = [float(x) for x in rng.normal(size=DIM).round(3)]
    where = {"grp": 0}
    # ground truth among survivors
    nrm = np.linalg.norm(mat, axis=1)
    qv = np.array(q)
    cos = np.round((mat @ qv) / (nrm * np.linalg.norm(qv)), 4)
    survivors = [i for i in range(n) if grp[i] == 0]
    truth = [
        f"a{i:04d}"
        for i in sorted(survivors, key=lambda i: (-cos[i], f"a{i:04d}"))
    ]
    auto = [
        r["id"]
        for r in coll.query(
            q, n_results=3, where=where, filter_strategy="auto"
        ).collect()
    ]
    exact = [
        r["id"]
        for r in coll.query(
            q, n_results=3, where=where, filter_strategy="exact"
        ).collect()
    ]
    assert auto == exact == truth  # auto picked the exact path: recall 1.0
    # probe path still works and returns a subset of survivors
    probed = [
        r["id"]
        for r in coll.query(
            q, n_results=3, where=where, filter_strategy="probe"
        ).collect()
    ]
    assert set(probed) <= {f"a{i:04d}" for i in survivors}
    # a broad filter on auto takes the probe path and stays correct
    broad = coll.query(
        q, n_results=3, where={"grp": {"$gte": 0}},
        filter_strategy="auto", prefilter_threshold=10,
    )
    assert len(broad.collect()) == 3
    with pytest.raises(ValueError, match="needs a where"):
        coll.query(q, n_results=3, filter_strategy="exact")
    with pytest.raises(ValueError, match="filter_strategy"):
        coll.query(q, n_results=3, filter_strategy="brute")


def test_partial_update_lost_update_fence(spark, tmp_path, monkeypatch):
    """ADVICE r11 (medium): a concurrent commit landing between a
    partial update's old-value assembly and its commit must NOT have
    its changes to omitted columns silently reverted — the commit CASes
    on the assembly snapshot's version, loses, and re-derives."""
    root = str(tmp_path / "lu")
    coll = Collection(spark, root)
    mat = _vecs(77, 3)
    coll.add(_batch(spark, ["a", "b", "c"], mat))
    other = Collection(spark, root)
    real_write = Collection._write
    fired = {"done": False}

    def interfering(self, batch, replace, require_present=False, expected_version=None):
        if expected_version is not None and not fired["done"]:
            fired["done"] = True
            # interleaved writer changes the OMITTED column mid-flight
            other.update(
                spark.createDataFrame([("a", 99)], "id string, stars int")
            )
        return real_write(self, batch, replace, require_present, expected_version)

    monkeypatch.setattr(Collection, "_write", interfering)
    # partial update provides lang only; stars is carried forward
    coll.update(spark.createDataFrame([("a", "fr")], "id string, lang string"))
    row = coll.get(ids=["a"]).head()
    assert fired["done"], "the interference never fired"
    assert row["lang"] == "fr"
    assert row["stars"] == 99, "interleaved writer's stars update was reverted"


def test_schema_evolution_is_atomic_with_the_data(spark, tmp_path):
    """ADVICE r11 (low): the evolved schema rides INSIDE the version dir,
    so a writer normalizing against a stale root sidecar cannot rewrite
    partitions without the new column, and readers of the committed
    version always see the schema its data was written with."""
    import os

    import pytest as _pt

    root = str(tmp_path / "se")
    coll = Collection(spark, root)
    coll.add(_batch(spark, ["a", "b", "c"], _vecs(5, 3)))
    with open(os.path.join(root, "collection.json")) as f:
        old_side = f.read()
    coll.add_metadata_column("score", "double", default=1.5)
    # simulate the old crash/race window: root sidecar still pre-ALTER
    with open(os.path.join(root, "collection.json"), "w") as f:
        f.write(old_side)
    # a batch shaped by the stale sidecar must fail loudly, never
    # silently rewrite victim partitions without the new column
    with _pt.raises(ValueError, match="schema mismatch"):
        coll.upsert(_batch(spark, ["a"], _vecs(6, 1)))
    # readers resolve the version-scoped schema: the column is intact
    assert coll.get(ids=["b"]).head()["score"] == 1.5


def test_fork_of_pinned_snapshot_clones_that_version(spark, tmp_path):
    """ADVICE r11 (low): forking an at()-pinned view clones the PINNED
    version, not the latest."""
    root = str(tmp_path / "fp")
    coll = Collection(spark, root)
    mat = _vecs(9, 4)
    coll.add(_batch(spark, ["a", "b"], mat[:2]))
    v0 = coll.versions()[-1]["name"]
    coll.upsert(_batch(spark, ["c", "d"], mat[2:]))
    snap = coll.at(v0)
    fork = snap.fork(str(tmp_path / "fp2"))
    assert {r["id"] for r in fork.get().collect()} == {"a", "b"}
    fork2 = coll.fork(str(tmp_path / "fp3"))
    assert fork2.count() == 4


def test_writer_lock_release_is_ownership_checked(tmp_path):
    """ADVICE r11 (medium): release unlinks _LOCK only when it is still
    OUR inode — a claimant that re-linked the path after a botched steal
    keeps its lock."""
    import os

    from adk_noui_vectordb_spark.sources import versioning as vn

    root = str(tmp_path / "lk")
    os.makedirs(root)
    lock = os.path.join(root, "_LOCK")
    with vn.writer_lock(root):
        assert os.path.exists(lock)
        # simulate: a stealer renamed our lock away, restore failed, and
        # a new live claimant re-linked the path
        os.rename(lock, os.path.join(root, "stolen"))
        claim2 = os.path.join(root, "claim2")
        with open(claim2, "w") as f:
            f.write(str(os.getpid()))
        os.link(claim2, lock)
    assert os.path.exists(lock), "release destroyed the new claimant's lock"


def test_per_collection_embedder_round_trips_independently(spark, tmp_path):
    """r12 (VERDICT r11 next #6, Chroma parity): two collections with
    DIFFERENT embedder specs coexist — documents-only add() embeds at
    each collection's own dim through its own encoder, query_texts
    routes through the same spec, and reopening with a conflicting
    spec raises (the `space` sidecar-guard discipline)."""
    from adk_noui_vectordb_spark.api.collection import Client
    from adk_noui_vectordb_spark.operators.embed import resolve_model

    client = Client(spark, str(tmp_path / "embcli"))
    c16 = client.create_collection(
        "dim16", embedder={"kind": "hash_projection", "dim": 16}
    )
    c32 = client.create_collection(
        "dim32", embedder={"kind": "hash_projection", "dim": 32}
    )
    docs = spark.createDataFrame(
        [("a", "alpha beta gamma"), ("b", "delta epsilon zeta"),
         ("c", "alpha beta delta")],
        "id string, document string",
    )
    c16.add(docs)  # documents-only: embeddings computed by the spec
    c32.add(docs)
    e16 = c16.get(ids=["a"], include=["embeddings"]).head()["embedding"]
    e32 = c32.get(ids=["a"], include=["embeddings"]).head()["embedding"]
    assert len(e16) == 16 and len(e32) == 32
    # the stored vector IS the spec model's encoding
    m16 = resolve_model({"kind": "hash_projection", "dim": 16})
    assert e16 == m16.encode(["alpha beta gamma"])[0]

    # query_texts routes through each collection's own embedder
    got16 = [r["id"] for r in c16.query(query_texts="alpha beta gamma", n_results=1).collect()]
    got32 = [r["id"] for r in c32.query(query_texts="alpha beta gamma", n_results=1).collect()]
    assert got16 == ["a"] and got32 == ["a"]

    # reopen: None adopts; a conflicting spec raises
    again = client.get_or_create_collection("dim16")
    assert again.count() == 3
    assert again._embedder_spec() == {"kind": "hash_projection", "dim": 16}
    import pytest as _pt

    with _pt.raises(ValueError, match="embedder"):
        client.get_or_create_collection(
            "dim16", embedder={"kind": "hash_projection", "dim": 64}
        ).count()

    # a batch with explicit embeddings at the wrong dim still fails loudly
    bad = spark.createDataFrame(
        [("z", [0.1] * 8, "text z")],
        "id string, embedding array<double>, document string",
    )
    with _pt.raises(ValueError, match="dim"):
        c16.upsert(bad)


def test_graph_strategy_serves_the_collection(spark, sf_dir):
    """filter_strategy='graph' (the hnswlib-shaped serving path): a
    query that IS a stored vector surfaces its own document at rank 1
    distance 0 (Chroma includes self-matches), runs are deterministic,
    and a where-filter applies at emission only (every returned row
    satisfies it; the unfiltered pool is a superset)."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.api.collection import demo_collection

    coll = demo_collection(spark, sf_dir)
    q = [
        float(x)
        for x in spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        .filter(F.col("vec_id") == 3)
        .head()["embedding"]
    ]
    a = [
        (r["id"], r["distance"])
        for r in coll.query(q, n_results=5, filter_strategy="graph").collect()
    ]
    assert a[0] == ("doc-3", 0.0), a
    b = [
        (r["id"], r["distance"])
        for r in coll.query(q, n_results=5, filter_strategy="graph").collect()
    ]
    assert a == b
    filt = coll.query(
        q, n_results=5, where={"n_chars": {"$gt": 100}}, filter_strategy="graph"
    ).collect()
    assert filt and all(r["n_chars"] > 100 for r in filt)
    pool_ids = {r["id"] for r in coll.query(q, n_results=50, filter_strategy="graph").collect()}
    assert {r["id"] for r in filt} <= pool_ids


def test_facade_graph_strategy_recall_on_clustered_fixture(spark, tmp_path):
    """The graph strategy's end-to-end recall on the tight clustered
    fixture (the corpus graph's own gate regime), with RAW held-out
    query vectors — the path that exercises the query-cell hub seeding
    (no indexed id to start from). Measured 1.00 over 8 near-center
    queries; pinned at >= 0.9."""
    import numpy as np

    from tools.make_clustered_embeddings import DIM, make

    n, k_centers, sigma, k = 1000, 10, 0.06, 10
    base = str(tmp_path / "grc")
    make(base, n, k_centers, sigma)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    coll = Collection(spark, str(tmp_path / "grc_coll"))
    coll.add(
        spark.createDataFrame(
            [
                (f"v{i:05d}", [float(x) for x in emb[i]], f"d{i}")
                for i in range(n)
            ],
            "id string, embedding array<double>, document string",
        )
    )
    rng = np.random.RandomState(7)
    centers = np.random.RandomState(42).randn(k_centers, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    queries = centers + sigma * rng.randn(k_centers, DIM)
    nrm = np.linalg.norm(emb, axis=1)
    hits = 0
    for qi in range(8):
        q = queries[qi]
        cos_r = np.round((emb @ q) / (nrm * np.linalg.norm(q)), 4)
        order = sorted(range(n), key=lambda i: (-cos_r[i], f"v{i:05d}"))
        truth = {f"v{i:05d}" for i in order[:k]}
        got = {
            r["id"]
            for r in coll.query(
                [float(x) for x in q], n_results=k, filter_strategy="graph"
            ).collect()
        }
        hits += len(got & truth)
    assert hits / (8 * k) >= 0.9, hits / (8 * k)


def test_graph_sidecar_is_incremental_across_commits(spark, tmp_path):
    """VERDICT r12 next #3: the facade graph sidecar advances by the
    version DELTA — an upsert-then-graph-query pays one
    ``update_graph_index`` commit on the SAME graph root (job count
    pinned: every job is batch-sized or point-pruned, never a corpus
    rebuild), a delete pays one tombstone commit, and only a changed
    embedding (ADD-only family contract) falls back to the full
    rebuild. Incremental serving quality is pinned against exact
    cosine (0.8 measured on this seeded fixture vs the fresh build's
    0.9 — the append-only edge-quality gap is the measured drift of
    BASELINE.md's update-cadence row, not a bug)."""
    import json
    import os
    import shutil

    import adk_noui_vectordb_spark.sources.versioning as vn

    coll = Collection(spark, str(tmp_path / "inc"))
    mat = _vecs(7, 40)
    coll.add(_batch(spark, [f"a{i}" for i in range(30)], mat[:30]))
    q = [float(x) for x in mat[0]]
    coll.query(q, n_results=5, filter_strategy="graph").collect()
    lin = coll._graph_lineage_dir()
    st1 = json.load(open(os.path.join(lin, "state.json")))
    g1 = coll._graph_sidecar(vn.current_dir(coll.root))

    # pure addition -> update_graph_index on the same root, one version
    coll.add(_batch(spark, [f"b{i}" for i in range(10)], mat[30:40]))
    sc = spark.sparkContext
    sc.setJobGroup("inc-sidecar", "delta apply")
    got = coll.query(
        [float(x) for x in mat[35]], n_results=3, filter_strategy="graph"
    ).collect()
    sc.setJobGroup("other", "")
    assert (got[0]["id"], got[0]["distance"]) == ("b5", 0.0)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("inc-sidecar"))
    assert n_jobs <= 70, f"upsert-then-graph-query ran {n_jobs} jobs"
    g2 = coll._graph_sidecar(vn.current_dir(coll.root))
    st2 = json.load(open(os.path.join(lin, "state.json")))
    assert os.path.dirname(g2) == os.path.dirname(g1)  # same graph root
    assert os.path.basename(g2) > os.path.basename(g1)  # exactly advanced
    assert st2["scratch"] == st1["scratch"]  # no re-staging

    # pure removal -> tombstone commit on the same root; gone at emission
    coll.delete(ids=["a3", "a4"])
    pool = {
        r["id"]
        for r in coll.query(q, n_results=30, filter_strategy="graph").collect()
    }
    assert "a3" not in pool and "a4" not in pool
    g3 = coll._graph_sidecar(vn.current_dir(coll.root))
    assert os.path.dirname(g3) == os.path.dirname(g1)

    # serving quality: incremental pool vs exact cosine (deterministic)
    live = [f"a{i}" for i in range(30) if i not in (3, 4)] + [
        f"b{i}" for i in range(10)
    ]
    emb = {f"a{i}": mat[i] for i in range(30)}
    emb.update({f"b{i}": mat[30 + i] for i in range(10)})
    qv = np.array(q)
    exact = set(
        sorted(
            live,
            key=lambda i: -float(
                np.dot(emb[i], qv) / (np.linalg.norm(emb[i]) * np.linalg.norm(qv))
            ),
        )[:10]
    )
    inc_top = {
        r["id"]
        for r in coll.query(q, n_results=10, filter_strategy="graph").collect()
    }
    assert len(inc_top & exact) / 10 >= 0.7, inc_top
    # a wiped lineage forces the full-rebuild path; fresh quality >= 0.8
    shutil.rmtree(lin)
    fresh_top = {
        r["id"]
        for r in coll.query(q, n_results=10, filter_strategy="graph").collect()
    }
    assert len(fresh_top & exact) / 10 >= 0.8, fresh_top

    # changed embedding -> INCREMENTAL replace (r14, VERDICT r13 next
    # #4): tombstone-old + add-under-fresh-surrogate on the SAME graph
    # root — no re-staging; the sid->rid alias lands in the lineage and
    # the replaced vector serves at its NEW position
    st_before = json.load(open(os.path.join(lin, "state.json")))
    coll.upsert(_batch(spark, ["a0"], mat[5:6]))
    got = coll.query(
        [float(x) for x in mat[5]], n_results=3, filter_strategy="graph"
    ).collect()
    assert ("a0", 0.0) in {(r["id"], r["distance"]) for r in got}
    st3 = json.load(open(os.path.join(lin, "state.json")))
    assert st3["scratch"] == st_before["scratch"], "replace re-staged"
    assert list(st3.get("alias", {})) == [str(_sid_py("a0"))]


def test_graph_sidecar_replace_pays_batch_and_matches_fresh_rebuild(
    spark, tmp_path
):
    """VERDICT r13 next #4 done-criteria: an update()-heavy commit on a
    graph-served collection pays O(batch) (job budget pinned — no
    corpus re-staging, no full rebuild), and the incrementally-replaced
    sidecar serves query results HASH-EQUAL to a from-scratch rebuild
    over the identical final vectors. Also pins the alias lifecycle: a
    twice-replaced sid chains rids; deleting a replaced sid drops its
    alias entry and the vector stops surfacing."""
    import json
    import os
    import shutil

    import adk_noui_vectordb_spark.sources.versioning as vn

    coll = Collection(spark, str(tmp_path / "rep"))
    mat = _vecs(11, 44)
    coll.add(_batch(spark, [f"d{i}" for i in range(40)], mat[:40]))
    q = [float(x) for x in mat[1]]
    coll.query(q, n_results=5, filter_strategy="graph").collect()
    lin = coll._graph_lineage_dir()
    st1 = json.load(open(os.path.join(lin, "state.json")))

    # replace two vectors in one commit; O(batch) pinned by job count
    coll.update(_batch(spark, ["d3", "d7"], mat[40:42]))
    sc = spark.sparkContext
    sc.setJobGroup("rep-sidecar", "replace delta")
    got = coll.query(
        [float(x) for x in mat[40]], n_results=3, filter_strategy="graph"
    ).collect()
    sc.setJobGroup("other", "")
    assert (got[0]["id"], got[0]["distance"]) == ("d3", 0.0)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("rep-sidecar"))
    assert n_jobs <= 80, f"replace-then-graph-query ran {n_jobs} jobs"
    st2 = json.load(open(os.path.join(lin, "state.json")))
    assert st2["scratch"] == st1["scratch"], "replace re-staged the corpus"
    assert set(st2["alias"]) == {str(_sid_py("d3")), str(_sid_py("d7"))}

    # chain: replace d3 AGAIN -> the rid advances, still incremental
    coll.update(_batch(spark, ["d3"], mat[42:43]))
    got2 = coll.query(
        [float(x) for x in mat[42]], n_results=3, filter_strategy="graph"
    ).collect()
    assert (got2[0]["id"], got2[0]["distance"]) == ("d3", 0.0)
    st3 = json.load(open(os.path.join(lin, "state.json")))
    assert st3["scratch"] == st1["scratch"]
    assert st3["alias"][str(_sid_py("d3"))] != st2["alias"][str(_sid_py("d3"))]

    # delete a replaced sid: alias entry drops, vector stops surfacing
    coll.delete(ids=["d7"])
    pool = {
        r["id"]
        for r in coll.query(
            [float(x) for x in mat[41]], n_results=40, filter_strategy="graph"
        ).collect()
    }
    assert "d7" not in pool
    st4 = json.load(open(os.path.join(lin, "state.json")))
    assert str(_sid_py("d7")) not in st4["alias"]

    # hash-equality with a FRESH rebuild over the identical final
    # vectors: capture incrementally-served results, wipe the lineage
    # (forces the full-rebuild path, which also resets the alias), and
    # compare row-for-row
    queries = [q, [float(x) for x in mat[42]], [float(x) for x in mat[20]]]
    inc = [
        sorted(
            (r["id"], r["distance"])
            for r in coll.query(
                qv, n_results=10, filter_strategy="graph"
            ).collect()
        )
        for qv in queries
    ]
    shutil.rmtree(lin)
    fresh = [
        sorted(
            (r["id"], r["distance"])
            for r in coll.query(
                qv, n_results=10, filter_strategy="graph"
            ).collect()
        )
        for qv in queries
    ]
    assert inc == fresh, "incremental replace diverged from fresh rebuild"


def test_graph_predicate_expansion_recall_under_selective_filter(
    spark, tmp_path
):
    """VERDICT r12 next #4 done-criterion: the ACORN-style opt-in
    (``graph_predicate_expansion=True``) holds facade graph recall ≥
    0.9 at 10% where-selectivity on the MILD fixture (measured 1.00 on
    this config at graph_beam=16, hnswlib's raise-ef-for-filters
    guidance). r14 additionally pins the UNFILTERED default ≥ 0.9
    (VERDICT r13 next #1 done-criterion — measured 0.96 here, 0.92 on
    the full n=2000 sweep fixture vs 0.64 pre-r14: nprobe-2 build edges
    + multi-cell seed doors). The blind emission-filtered path improved
    too (0.34 -> 0.79 measured) but remains ≤ the steered walk — that
    ordering is the pinned invariant now, not the old collapse."""
    import numpy as np

    from tools.make_clustered_embeddings import make

    n, k_centers, sigma = 1000, 10, 0.25
    base = str(tmp_path / "mild")
    make(base, n, k_centers, sigma)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    grp = np.arange(n) % 10
    coll = Collection(spark, str(tmp_path / "coll"))
    coll.add(
        spark.createDataFrame(
            [
                (f"v{i:05d}", [float(x) for x in emb[i]], f"doc {i}", int(grp[i]))
                for i in range(n)
            ],
            "id string, embedding array<double>, document string, grp int",
        )
    )
    rng = np.random.RandomState(7)
    centers = np.random.RandomState(42).randn(k_centers, emb.shape[1])
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    queries = centers + sigma * rng.randn(k_centers, emb.shape[1])
    nrm = np.linalg.norm(emb, axis=1)
    k, w = 10, {"grp": {"$in": [0]}}
    idxs = [i for i in range(n) if grp[i] == 0]
    u_hits = a_hits = b_hits = tot = 0
    for qi in range(8):
        q = queries[qi]
        cos = (emb @ q) / (nrm * np.linalg.norm(q))
        truth = set(sorted(idxs, key=lambda i: (-round(cos[i], 4), i))[:k])
        truth_u = set(
            sorted(range(n), key=lambda i: (-round(cos[i], 4), i))[:k]
        )
        qv = [float(x) for x in q]
        unfiltered = {
            int(r["id"][1:])
            for r in coll.query(
                qv, n_results=k, filter_strategy="graph"
            ).collect()
        }
        blind = {
            int(r["id"][1:])
            for r in coll.query(
                qv,
                n_results=k,
                where=w,
                filter_strategy="graph",
                graph_predicate_expansion=False,
            ).collect()
        }
        acorn = {
            int(r["id"][1:])
            for r in coll.query(
                qv,
                n_results=k,
                where=w,
                filter_strategy="graph",
                graph_predicate_expansion=True,
                graph_beam=16,
            ).collect()
        }
        # r15 AUTO (VERDICT r14 next #3 done-criterion): NO opt-in —
        # the 10%-selectivity filter alone must route to the ACORN
        # walk at its GRAPH_ACORN_BEAM budget, so the result set is
        # identical to the forced run above (same deterministic path)
        auto = {
            int(r["id"][1:])
            for r in coll.query(
                qv, n_results=k, where=w, filter_strategy="graph"
            ).collect()
        }
        assert auto == acorn, (qi, sorted(auto), sorted(acorn))
        u_hits += len(unfiltered & truth_u)
        a_hits += len(acorn & truth)
        b_hits += len(blind & truth)
        tot += k
    # r14 intrinsic-recall pin (measured 0.96 on this seeded config)
    assert u_hits / tot >= 0.9, u_hits / tot
    assert a_hits / tot >= 0.9, a_hits / tot
    # the steered walk never loses to the emission-filtered pool
    # (measured 1.00 vs 0.79 here)
    assert a_hits >= b_hits, (a_hits, b_hits)


def test_graph_strategy_refuses_non_cosine_spaces(spark, tmp_path):
    """The graph's edges and beam scoring are cosine-built; an l2/ip
    ranking routed through a cosine graph is the r10 metric-mismatch
    trap — the facade refuses loudly (the space sidecar guard's
    discipline) instead of serving blurred recall."""
    mat = _vecs(51, 4)
    coll = Collection(spark, str(tmp_path / "l2g"), space="l2")
    coll.add(_batch(spark, ["a", "b", "c", "d"], mat))
    with pytest.raises(ValueError, match="cosine collections only"):
        coll.query([float(x) for x in mat[0]], n_results=2, filter_strategy="graph")


def test_graph_strategy_batch_equals_per_query(spark, sf_dir):
    """The fused multi-query graph beam (one assignment job, one hub
    resolution, one edges read + one vecs fetch per round for the UNION
    of frontiers) keeps per-query state untouched: the batch result
    equals the per-query calls row-for-row — the ann_graph_batch_topk
    property at the facade."""
    import os

    from pyspark.sql import functions as F

    from adk_noui_vectordb_spark.api.collection import demo_collection

    coll = demo_collection(spark, sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qs = [
        [float(x) for x in emb.filter(F.col("vec_id") == i).head()["embedding"]]
        for i in (0, 9)
    ]
    batch = sorted(
        tuple(r)
        for r in coll.query(qs, n_results=5, filter_strategy="graph")
        .select("query_idx", "id", "distance")
        .collect()
    )
    solo = []
    for qi, q in enumerate(qs):
        for r in (
            coll.query(q, n_results=5, filter_strategy="graph")
            .select("id", "distance")
            .collect()
        ):
            solo.append((qi, r["id"], r["distance"]))
    assert batch == sorted(solo)


def test_graph_auto_expansion_reads_compound_where_tree(spark, tmp_path):
    """VERDICT r15 next #7: the auto-ACORN selectivity estimate counts
    survivors of the FULL compiled where tree — a nested $and that cuts
    to 10% routes to the ACORN walk (result identical to the forced
    run), and a nested $or whose union covers 90% routes BLIND (result
    identical to the forced-off run) even though each branch alone is
    selective. An estimate that read only one branch would flip the
    high-selectivity case to ACORN."""
    import numpy as np

    from tools.make_clustered_embeddings import make

    n = 400
    base = str(tmp_path / "cmpd")
    make(base, n, 10, 0.25)
    emb = np.array(
        spark.read.parquet(base + "/embeddings.parquet")
        .orderBy("vec_id")
        .select("embedding")
        .toPandas()["embedding"]
        .tolist(),
        dtype=np.float64,
    )
    coll = Collection(spark, str(tmp_path / "coll_cmpd"))
    coll.add(
        spark.createDataFrame(
            [
                (f"v{i:05d}", [float(x) for x in emb[i]], f"doc {i}", i % 10)
                for i in range(n)
            ],
            "id string, embedding array<double>, document string, grp int",
        )
    )
    qv = [float(x) for x in emb[3]]
    # nested $and intersecting to grp == 0 (10% selectivity)
    w_lo = {"$and": [{"grp": {"$in": [0, 1, 2]}}, {"grp": {"$in": [0, 9]}}]}
    # nested $or unioning to 90% selectivity from two branches that are
    # each individually at 50%
    w_hi = {
        "$or": [
            {"grp": {"$in": [0, 1, 2, 3, 4]}},
            {"grp": {"$in": [4, 5, 6, 7, 8]}},
        ]
    }

    def ids(**kw):
        return sorted(
            r["id"]
            for r in coll.query(
                qv, n_results=5, filter_strategy="graph", **kw
            ).collect()
        )

    auto_lo = ids(where=w_lo)
    forced_acorn = ids(where=w_lo, graph_predicate_expansion=True)
    assert auto_lo == forced_acorn, (auto_lo, forced_acorn)
    auto_hi = ids(where=w_hi)
    forced_blind = ids(where=w_hi, graph_predicate_expansion=False)
    assert auto_hi == forced_blind, (auto_hi, forced_blind)
