"""memo.session_memo / memo.index_root — the dataset-fingerprint contract.

ADVICE r6: session memos keyed only on (applicationId, sf_dir) silently
served stale frames when testdata under an unchanged path was
regenerated in-session. The consolidated helper folds a parquet
(size, mtime_ns) fingerprint into both the memo keys and the on-disk
index directory tags; these tests pin that invalidation actually fires.
"""

import os
import time

from adk_noui_vectordb_spark import memo


def _write_parquet(path: str, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": list(range(n))}), path)


def test_session_memo_hits_and_fingerprint_invalidation(tmp_path):
    d = str(tmp_path)
    _write_parquet(os.path.join(d, "t.parquet"), 10)

    class FakeCtx:
        applicationId = "app-1"

    class FakeSpark:
        sparkContext = FakeCtx()

    calls = []

    def build():
        calls.append(1)
        return len(calls)

    v1 = memo.session_memo(FakeSpark(), d, "k", build)
    v2 = memo.session_memo(FakeSpark(), d, "k", build)
    assert (v1, v2) == (1, 1) and len(calls) == 1  # second call is a hit

    # regenerate the dataset in place -> fingerprint changes -> rebuild
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    _write_parquet(os.path.join(d, "t.parquet"), 10)
    v3 = memo.session_memo(FakeSpark(), d, "k", build)
    assert v3 == 2 and len(calls) == 2

    # extra key components separate entries
    v4 = memo.session_memo(FakeSpark(), d, "k", build, 99)
    assert v4 == 3


def test_session_memo_caches_falsy_values(tmp_path):
    d = str(tmp_path)
    _write_parquet(os.path.join(d, "t.parquet"), 1)

    class FakeCtx:
        applicationId = "app-2"

    class FakeSpark:
        sparkContext = FakeCtx()

    calls = []

    def build_zero():
        calls.append(1)
        return 0  # falsy — must still be a cache hit the second time

    assert memo.session_memo(FakeSpark(), d, "z", build_zero) == 0
    assert memo.session_memo(FakeSpark(), d, "z", build_zero) == 0
    assert len(calls) == 1


def test_session_memo_is_bounded(tmp_path):
    d = str(tmp_path)
    _write_parquet(os.path.join(d, "t.parquet"), 1)

    class FakeCtx:
        applicationId = "app-3"

    class FakeSpark:
        sparkContext = FakeCtx()

    for i in range(memo.MEMO_MAX * 3):
        memo.session_memo(FakeSpark(), d, f"bound-{i}", lambda: i)
    assert len(memo._MEMO) <= memo.MEMO_MAX


def test_index_root_tag_tracks_dataset_and_params(tmp_path):
    d = str(tmp_path)
    _write_parquet(os.path.join(d, "t.parquet"), 10)
    r1 = memo.index_root("ix", d, 4, 8)
    assert memo.index_root("ix", d, 4, 8) == r1  # deterministic
    assert memo.index_root("ix", d, 4, 9) != r1  # params in the tag

    time.sleep(0.01)
    _write_parquet(os.path.join(d, "t.parquet"), 10)  # regenerate
    r2 = memo.index_root("ix", d, 4, 8)
    assert r2 != r1  # a stale on-disk index is never consulted again


def test_fingerprint_ignores_non_parquet_and_survives_missing(tmp_path):
    d = str(tmp_path)
    _write_parquet(os.path.join(d, "t.parquet"), 5)
    fp1 = memo.dataset_fingerprint(d)
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("x")
    assert memo.dataset_fingerprint(d) == fp1  # non-parquet files ignored
    assert memo.dataset_fingerprint(os.path.join(d, "missing")) == ()
