"""Int8 embedding quantization and quantized kNN (scan-side ANN).

The reference stores float32 embeddings in ChromaDB
(coding_agent/tools/indexing_agent.py:50,353). At 100 TB the embedding
column dominates storage and scan I/O; symmetric int8 quantization
(``q = round(x * 127 / max|x|)`` per vector, scale stored alongside) cuts
both 4x and makes the candidate scan SIMD/dictionary friendly — the
standard serving trick (e.g. FAISS ``ScalarQuantizer``). Search then runs
in two stages: a coarse top-C over DEQUANTIZED int8 vectors (cheap scan),
then an exact float rerank of the C survivors — recall loss comes only
from quantization error at the top-C boundary, measured in
``tests/test_retrieval.py``.

Everything is Catalyst HOFs (transform / aggregate) — no UDF, no shuffle
beyond the final TakeOrderedAndProject heap merge.

Determinism contract: quantization uses ``floor(x * 127.0 / max_abs + 0.5)``
— fixed-order IEEE ops on identical doubles on both engines (NOT ``round``,
whose half-even/half-up behavior differs across engines at ties). The
quantized values are exact small integers, so every downstream integer sum
is bit-stable; dequantized cosine follows the proven rounded-4dp kNN
contract (operators/knn.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity
from ..sources.tables import load_table
from .knn import make_query_from_vec

Q_MAX = 127.0


def with_quantized(emb: DataFrame) -> DataFrame:
    """Add ``max_abs`` (per-vector scale, double) and ``q``
    (array<tinyint>) columns. All-zero vectors quantize to all zeros."""
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = emb.withColumn("emb_d", as_double)
    df = df.withColumn(
        "max_abs",
        F.array_max(F.transform(F.col("emb_d"), lambda x: F.abs(x))),
    )
    quantized = F.when(
        F.col("max_abs") == 0.0,
        F.transform(F.col("emb_d"), lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            F.col("emb_d"),
            lambda x: F.floor(
                x * F.lit(Q_MAX) / F.col("max_abs") + F.lit(0.5)
            ).cast("tinyint"),
        )
    )
    return df.withColumn("q", quantized).drop("emb_d")


def dequantized(q_col: F.Column, max_abs_col: F.Column) -> F.Column:
    """Reconstruct doubles: ``q * max_abs / 127.0`` (fixed op order)."""
    return F.transform(
        q_col, lambda v: v.cast("double") * max_abs_col / F.lit(Q_MAX)
    )


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored representation: (vec_id, max_abs, q[int8])."""
    emb = load_table(spark, sf_dir, "embeddings")
    return with_quantized(emb).select("vec_id", "max_abs", "q")


def quantize_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-comparable exploded view of the quantized store:
    (vec_id, pos, q_val, max_abs) — one row per vector component, the same
    shape contract ``embed_projection_rows`` uses (operators/embed.py).
    ``quantize_embeddings`` stays the storage/serving representation; this
    is the verification surface (array cells are not sortable by the
    driver's pandas canonicalizer)."""
    qdf = quantize_embeddings(spark, sf_dir)
    return qdf.select(
        "vec_id", "max_abs", F.posexplode("q").alias("pos", "q_val")
    ).select(
        "vec_id",
        F.col("pos").cast("int").alias("pos"),
        F.col("q_val").cast("int").alias("q_val"),
        "max_abs",
    )


def _dequantized_vectors(emb: DataFrame) -> DataFrame:
    qdf = with_quantized(emb)
    return qdf.select(
        "vec_id", dequantized(F.col("q"), F.col("max_abs")).alias("deq")
    )


def knn_int8_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """Exact kNN over the int8-quantized (then dequantized) vectors —
    isolates pure quantization error vs operators/knn.py's float path."""
    emb = load_table(spark, sf_dir, "embeddings")
    deq = _dequantized_vectors(emb)
    q = deq.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("q_id"), F.col("deq").alias("q_deq")
    )
    sim8 = F.round(cosine_similarity(F.col("deq"), F.col("q_deq")), 4)
    return (
        deq.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("vec_id", sim8.alias("sim8"))
        .orderBy(F.desc("sim8"), F.asc("vec_id"))
        .limit(k)
    )


BINQ_WORD_BITS = 32


def with_binarized(emb: DataFrame, dim: int = 64) -> DataFrame:
    """Add sign-bit binary codes: ``w0..w{n-1}`` BIGINT words, 32 bits
    per word (bit i of word w set iff ``embedding[32w + i] > 0``).

    32 — not 64 — bits per word keeps every packed value in
    ``[0, 2^32)``: positive in BIGINT on both engines, so no
    sign-bit/overflow semantics to reconcile (``1 << 63`` is where
    Spark's long and DuckDB's BIGINT diverge). Bit values come from
    ``pow(2.0, i)`` — exact in double for i ≤ 52 — summed by an
    integer-valued fold; DuckDB's twin uses ``1::BIGINT << i``. Both
    are exact small integers, so codes are bit-identical cross-engine.
    All Catalyst HOFs; no UDF."""
    n_words = (dim + BINQ_WORD_BITS - 1) // BINQ_WORD_BITS
    df = emb
    for w in range(n_words):
        seg = F.slice(
            F.col("embedding"), w * BINQ_WORD_BITS + 1, BINQ_WORD_BITS
        )
        bits = F.transform(
            seg,
            lambda x, i: F.when(
                x > F.lit(0.0),
                F.pow(F.lit(2.0), i.cast("double")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        df = df.withColumn(
            f"w{w}",
            F.aggregate(bits, F.lit(0).cast("long"), lambda a, b: a + b),
        )
    return df


def _hamming(n_words: int) -> F.Column:
    """``sum_w bit_count(w_w XOR qw_w)`` — the 1-bit distance."""
    total = None
    for w in range(n_words):
        term = F.bit_count(F.col(f"w{w}").bitwiseXOR(F.col(f"qw{w}")))
        total = term if total is None else total + term
    return total.cast("int")


def binq_hamming_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Top-k by Hamming distance over 1-bit sign codes (the binary-
    quantization coarse stage: 64 dims -> 8 bytes, a 32x compression of
    the scan payload vs float32; the asymmetric-vs-symmetric trade FAISS
    calls ``IndexBinaryFlat``). Distance is XOR + popcount — integer
    ops inside whole-stage codegen, the cheapest candidate scan in the
    quantization family. Exact integers, so cross-engine hash-stable
    with no rounding contract at all. Returns (vec_id, hamming),
    ascending, vec_id tie-break, query excluded."""
    n_words = (dim + BINQ_WORD_BITS - 1) // BINQ_WORD_BITS
    emb = load_table(spark, sf_dir, "embeddings")
    codes = with_binarized(emb, dim).select(
        "vec_id", *[f"w{w}" for w in range(n_words)]
    )
    qc = codes.filter(F.col("vec_id") == query_vec_id).select(
        F.col("vec_id").alias("q_id"),
        *[F.col(f"w{w}").alias(f"qw{w}") for w in range(n_words)],
    )
    return (
        codes.crossJoin(F.broadcast(qc))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("vec_id", _hamming(n_words).alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(k)
    )


def ann_binq_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    n_coarse: int = 50,
    k: int = 10,
    dim: int = 64,
) -> DataFrame:
    """Two-stage binary-quantization retrieval (the knn_int8_rerank
    shape, one tier coarser): Hamming top-C over the 8-byte sign codes
    (TakeOrderedAndProject — per-partition C-heap over two BIGINT
    columns), exact 4-dp float cosine on the C survivors only. The
    100 TB serving shape at maximum compression: the float column is
    read for C rows, not the corpus, and the coarse scan is pure
    integer XOR+popcount."""
    emb = load_table(spark, sf_dir, "embeddings")
    coarse = binq_hamming_topk(
        spark, sf_dir, query_vec_id, k=n_coarse, dim=dim
    ).select("vec_id")
    q = make_query_from_vec(emb, query_vec_id)
    sim = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 4)
    return (
        emb.join(F.broadcast(coarse), "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def binq_ivf_root(sf_dir: str, n_centroids: int = 8, iters: int = 2) -> str:
    from ..memo import index_root

    from .ann import N_VEC_BUCKETS

    return index_root(
        "binq_ivf_index", sf_dir, n_centroids, iters, N_VEC_BUCKETS
    )


def build_binq_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = 8,
    iters: int = 2,
) -> str:
    """FAISS ``IndexBinaryIVF``: the trained coarse quantizer's cells
    hold 16-byte sign codes instead of float vectors — a probe reads
    ``nprobe`` cells at 16 bytes/row (vs 512 for the float cells), ranks
    by XOR+popcount, and refines the C survivors against the full
    vectors (``IndexRefineFlat``). Components: ``codes/cluster=*/``
    (vec_id, w0, w1 — the new narrow payload); assign/cents/vecs
    hardlink from the trained-IVF index's current version (immutable
    files, metadata-only — the build writes only the codes)."""
    from ..sources import versioning as vn
    from .ann import IVF_ASSIGN_SCHEMA, VECS_SCHEMA, build_ivf_index

    root = binq_ivf_root(sf_dir, n_centroids, iters)
    cur = vn.current_dir(root)
    if cur is not None:
        return cur
    assign_p, cents_p = build_ivf_index(spark, sf_dir, n_centroids, iters)
    ivf_dir = os.path.dirname(assign_p)
    assign = spark.read.schema(IVF_ASSIGN_SCHEMA).parquet(assign_p)
    vecs = spark.read.schema(VECS_SCHEMA).parquet(os.path.join(ivf_dir, "vecs"))
    codes = (
        with_binarized(vecs.select("vec_id", F.col("emb").alias("embedding")))
        .select("vec_id", "w0", "w1")
        .join(assign, "vec_id")
        .select("vec_id", "w0", "w1", "cluster")
    )
    try:
        return vn.commit_version(
            spark,
            root,
            [
                # codes IS the assignment (vec_id -> cluster with the
                # 16-byte payload) — no separate assign component to
                # keep consistent across updates
                vn.Component("codes", ("cluster",), frozenset(), (codes,)),
                vn.Component("cents", link_from=cents_p),
                vn.Component("vecs", link_from=os.path.join(ivf_dir, "vecs")),
            ],
            expected=None,
        )
    except vn.ConcurrentWriterError:
        return vn.current_dir(root)


BINQ_IVF_COMPONENTS = [
    ("codes", ["cluster"]),
    ("vecs", ["vbucket"]),
    ("cents", []),
]
BINQ_CODES_SCHEMA = "vec_id bigint, w0 bigint, w1 bigint, cluster int"


def update_binq_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    new_vecs: DataFrame,
    n_centroids: int = 8,
    iters: int = 2,
    auto_compact_threshold: int = 16,
) -> str:
    """Incremental maintenance under FROZEN coarse centroids with
    vec-level REPLACE — the update_ivfpq_index discipline for the
    binary tier: the batch assigns through ``assign_to_centroids`` and
    packs through ``with_binarized`` (identical arithmetic to the
    build); brand-new ids append 16-byte code rows + vectors into
    hardlinked partitions; re-submitted ids rewrite exactly their OLD
    cells (re-derived from the stored vectors under the frozen
    centroids — never a scan) and vbuckets. CAS commit; drift is the
    coarse quantizer's (the IVF family's rebalance story applies
    upstream). Returns the new current version dir."""
    from ..sources import versioning as vn
    from .ann import (
        VECS_SCHEMA,
        assign_to_centroids,
        vec_bucket_expr,
    )

    cur = build_binq_ivf_index(spark, sf_dir, n_centroids, iters)
    root = os.path.dirname(cur)
    cents_dicts = sorted(
        (
            {"cluster": r["cluster"], "c": list(r["c"])}
            for r in spark.read.parquet(os.path.join(cur, "cents")).collect()
        ),
        key=lambda r: r["cluster"],
    )
    emb_col = "embedding" if "embedding" in new_vecs.columns else "emb"
    batch = (
        new_vecs.select(
            "vec_id", F.col(emb_col).cast("array<double>").alias("emb")
        )
        .dropDuplicates(["vec_id"])
        .localCheckpoint(eager=True)
    )
    batch_ids = batch.select("vec_id")
    vbuckets = sorted(
        r["b"]
        for r in batch_ids.select(
            vec_bucket_expr(F.col("vec_id")).alias("b")
        ).distinct().collect()
    )
    if not vbuckets:
        return cur
    batch_assign = assign_to_centroids(batch, cents_dicts).select(
        "vec_id", "cluster"
    )
    batch_codes = (
        with_binarized(batch.select("vec_id", F.col("emb").alias("embedding")))
        .select("vec_id", "w0", "w1")
        .join(batch_assign, "vec_id")
        .select("vec_id", "w0", "w1", "cluster")
        .localCheckpoint(eager=True)
    )
    old_vecs_aff = spark.read.schema(VECS_SCHEMA).parquet(
        os.path.join(cur, "vecs")
    ).filter(F.col("vbucket").isin(vbuckets))
    resub = (
        old_vecs_aff.join(batch_ids, "vec_id", "leftsemi")
        .select("vbucket", "vec_id", "emb")
        .localCheckpoint(eager=True)
    )
    resub_ids = resub.select("vec_id")
    rw_cells = sorted(
        r["cluster"]
        for r in assign_to_centroids(
            resub.select("vec_id", "emb"), cents_dicts
        )
        .select("cluster")
        .distinct()
        .collect()
    )
    rw_vb = sorted(
        r["vbucket"] for r in resub.select("vbucket").distinct().collect()
    )
    code_writes = []
    if rw_cells:
        code_writes.append(
            spark.read.schema(BINQ_CODES_SCHEMA)
            .parquet(os.path.join(cur, "codes"))
            .filter(F.col("cluster").isin(rw_cells))
            .join(resub_ids, "vec_id", "left_anti")
            .select("vec_id", "w0", "w1", "cluster")
        )
    code_writes.append(batch_codes)
    vec_writes = []
    if rw_vb:
        vec_writes.append(
            spark.read.schema(VECS_SCHEMA)
            .parquet(os.path.join(cur, "vecs"))
            .filter(F.col("vbucket").isin(rw_vb))
            .join(resub_ids, "vec_id", "left_anti")
            .select("vbucket", "vec_id", "emb")
        )
    vec_writes.append(
        batch.select(
            vec_bucket_expr(F.col("vec_id")).alias("vbucket"), "vec_id", "emb"
        )
    )
    return vn.commit_version(
        spark,
        root,
        [
            vn.Component(
                "codes",
                ("cluster",),
                frozenset(f"cluster={c}" for c in rw_cells),
                tuple(code_writes),
            ),
            vn.Component(
                "vecs",
                ("vbucket",),
                frozenset(f"vbucket={b}" for b in rw_vb),
                tuple(vec_writes),
            ),
            vn.Component("cents", link_from=os.path.join(cur, "cents")),
        ],
        expected=os.path.basename(cur),
        compact=BINQ_IVF_COMPONENTS,
        compact_threshold=auto_compact_threshold,
    )


def fsck_binq_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = 8,
    iters: int = 2,
) -> list:
    """Binary-IVF integrity: generic versioned-root checks, codes<->vecs
    id agreement, packed words inside [0, 2^32) (the positive-BIGINT
    contract the cross-engine XOR rests on), every assigned cell backed
    by a centroid. Returns (check, ok, detail); never raises."""
    from ..sources import versioning as vn
    from .ann import VECS_SCHEMA

    cur = build_binq_ivf_index(spark, sf_dir, n_centroids, iters)
    root = os.path.dirname(cur)
    out = vn.fsck_index(
        spark,
        root,
        [
            ("codes", ["cluster"], BINQ_CODES_SCHEMA),
            ("vecs", ["vbucket"], VECS_SCHEMA),
            ("cents", [], "cluster int, c array<double>"),
        ],
    )
    codes = spark.read.schema(BINQ_CODES_SCHEMA).parquet(
        os.path.join(cur, "codes")
    )
    vecs = spark.read.schema(VECS_SCHEMA).parquet(os.path.join(cur, "vecs"))
    c_only = codes.select("vec_id").join(vecs, "vec_id", "left_anti").count()
    v_only = vecs.select("vec_id").join(codes, "vec_id", "left_anti").count()
    out.append(
        ("codes_vecs_same_ids", c_only == 0 and v_only == 0,
         f"codes_only={c_only} vecs_only={v_only}")
    )
    bad_w = codes.filter(
        (F.col("w0") < 0) | (F.col("w0") >= 2**32)
        | (F.col("w1") < 0) | (F.col("w1") >= 2**32)
    ).count()
    out.append(("words_are_positive_32bit", bad_w == 0, f"bad={bad_w}"))
    cents = {
        r["cluster"]
        for r in spark.read.parquet(os.path.join(cur, "cents")).collect()
    }
    orphan = (
        codes.select("cluster")
        .distinct()
        .filter(~F.col("cluster").isin(sorted(cents)))
        .count()
    )
    out.append(
        ("assigned_cells_have_centroids", orphan == 0, f"orphan_cells={orphan}")
    )
    return out


def _binq_words_py(vec, dim: int = 64) -> list:
    """Python twin of with_binarized (sign bits over 32-bit words) —
    the query-side packing for the serve probe's Hamming literals."""
    n_words = (dim + BINQ_WORD_BITS - 1) // BINQ_WORD_BITS
    out = []
    for w in range(n_words):
        word = 0
        for i, x in enumerate(vec[w * BINQ_WORD_BITS:(w + 1) * BINQ_WORD_BITS]):
            if x > 0.0:
                word += 1 << i
        out.append(word)
    return out


def ann_binq_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    nprobe: int = 2,
    n_coarse: int = 50,
    k: int = 10,
    n_centroids: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Serve FAISS-IndexBinaryIVF-style: driver-ranked centroids
    (Decimal HALF_UP, the _ivf_serve_topk discipline), LITERAL nprobe
    cell pruning on the stored 16-byte code rows, XOR+popcount Hamming
    top-C against the query's packed words (computed driver-side from
    the index's own vecs store), exact 4-dp cosine refine on the C
    survivors. The probed IO is nprobe cells x 16 bytes/row + C full
    vectors — the composed maximum-compression serving shape."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from .ann import (
        VECS_SCHEMA,
        _double_sql,
        _ivf_centroid_rows,
        vec_bucket_py,
    )

    cur = build_binq_ivf_index(spark, sf_dir, n_centroids, iters)
    _, cent_rows = _ivf_centroid_rows(spark, sf_dir, n_centroids, iters)
    vecs = spark.read.schema(VECS_SCHEMA).parquet(os.path.join(cur, "vecs"))
    qrow = vecs.filter(
        (F.col("vbucket") == vec_bucket_py(query_vec_id))
        & (F.col("vec_id") == query_vec_id)
    ).head()
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not in the index")
    q = [float(x) for x in qrow["emb"]]
    if not any(x != 0.0 for x in q):
        raise ValueError("zero-norm query vector: cosine undefined")

    def cos(c):
        num = dd = qq = 0.0
        for a, b in zip(c, q):
            num += a * b
            dd += a * a
            qq += b * b
        return num / (math.sqrt(dd) * math.sqrt(qq))

    four = Decimal("0.0001")
    ranked = sorted(
        (
            (Decimal(repr(cos(c))).quantize(four, rounding=ROUND_HALF_UP), cl)
            for cl, c in cent_rows
        ),
        key=lambda t: (-t[0], t[1]),
    )
    top = [int(cl) for _, cl in ranked[:nprobe]]
    qw = _binq_words_py(q, dim=len(q))
    codes = (
        spark.read.schema("vec_id bigint, w0 bigint, w1 bigint, cluster int")
        .parquet(os.path.join(cur, "codes"))
        .filter(F.col("cluster").isin(top) & (F.col("vec_id") != query_vec_id))
    )
    ham = (
        F.bit_count(F.col("w0").bitwiseXOR(F.lit(qw[0])))
        + F.bit_count(F.col("w1").bitwiseXOR(F.lit(qw[1])))
    ).cast("int")
    coarse = (
        codes.select("vec_id", ham.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(n_coarse)
        .select("vec_id")
    )
    qlit = F.expr("array(" + ",".join(_double_sql(x) for x in q) + ")")
    sim = F.round(cosine_similarity(F.col("emb"), qlit), 4)
    return (
        vecs.join(F.broadcast(coarse), "vec_id")
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def knn_int8_rerank(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    n_coarse: int = 50,
    k: int = 10,
) -> DataFrame:
    """Two-stage retrieval: coarse top-C on the quantized scan
    (TakeOrderedAndProject — per-partition C-heap over the cheap int8
    column), then exact float cosine on the C survivors only. This is the
    100 TB serving shape: the float column is read for C rows, not the
    corpus.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    coarse = knn_int8_topk(spark, sf_dir, query_vec_id, k=n_coarse).select(
        "vec_id"
    )
    q = make_query_from_vec(emb, query_vec_id)
    sim = F.round(cosine_similarity(F.col("embedding"), F.col("q_emb")), 4)
    return (
        emb.join(F.broadcast(coarse), "vec_id")
        .crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("sim"))
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )
