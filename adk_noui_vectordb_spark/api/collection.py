"""ChromaDB-compatible ``Collection`` over the versioned index family.

The reference's entire storage surface is a ChromaDB collection:
``collection.upsert(ids, documents, embeddings, metadatas)`` on the
write path (coding_agent/tools/indexing_agent.py:332-361),
``collection.query(query_embeddings, n_results, where={...})`` /
``collection.get(where={...})`` / ``collection.count()`` on the read
path (coding_agent/tools/vector_search_tool.py:33-46,149-232). This
module IS that surface, Spark-first: a ``Collection`` is one versioned
index root (sources/versioning.py — atomic ``_CURRENT`` commits, CAS
single-writer enforcement, hardlinked unchanged partitions,
auto-compaction) holding three components:

    vecs/  vbucket=*          (vec_id, emb)            — vector store
    bands/ band=*/band_key=*  (vec_id, band, band_key) — RP-LSH table
    meta/  mbucket=*          (vec_id, id, document, <metadata cols>)

ChromaDB ids are STRINGS; every distributed structure keys on a 60-bit
md5 surrogate (``sid``) so joins stay BIGINT and point lookups prune to
one md5 bucket directory. A surrogate collision (two distinct ids, one
sid) is detected at write time and rejected — at 2^60 the birthday
bound passes ~10^8 ids per collection comfortably; beyond that, shard
into multiple collections (documented contract, enforced, never
silent).

Metadata is SCHEMA-ON-FIRST-WRITE: the first batch's non-reserved
columns become typed parquet columns (not a string map), so a
``where`` DSL filter (functions/where_dsl.py) compiles to ordinary
Catalyst predicates with full pushdown into the meta scan. The schema
and embedding dim persist in a root-level ``collection.json`` sidecar
and later batches must match.

Scale shape (the same contracts as the sf_dir-bound index family):
- ``add``/``upsert`` are APPEND-MOSTLY: brand-new ids write O(batch)
  and read ZERO existing rows; replaced ids rewrite exactly the
  partitions holding their stale rows (reverse-mapped by re-banding
  the OLD vectors from the collection's own vecs store).
- ``query`` computes band keys CLIENT-side (24 integer dots — no job),
  probes the band table with literal partition predicates (static
  pruning), reranks candidates from vecs, and applies ``where`` /
  ``where_document`` on the meta sidecar — never a corpus scan.
- ``delete`` rewrites only victim partitions inside one atomic commit.
- Readers never see a partial write: every mutation is one ``_CURRENT``
  swing; concurrent writers serialize on the root's writer lock and a
  stale plan raises ``ConcurrentWriterError`` instead of clobbering.
"""

from __future__ import annotations

import hashlib
import json
import os
from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import cosine_similarity, dot_product, l2_distance
from ..functions.where_dsl import compile_where, compile_where_document
from ..operators.ann import (
    RP_BAND_BITS,
    RP_BANDS,
    RP_PLANES,
    _double_sql,
    _nonzero_pred,
    _rp_band_keys,
    _rp_plane_signs,
    vec_bucket_expr,
)
from ..sources import versioning as vn

N_META_BUCKETS = 32
BANDS_SCHEMA = "vec_id bigint, band int, band_key int"
VECS_SCHEMA = "vec_id bigint, emb array<double>, vbucket int"
_RESERVED = ("id", "document", "embedding", "emb", "vec_id", "mbucket", "vbucket")

_COMPONENTS = [
    ("bands", ["band", "band_key"]),
    ("vecs", ["vbucket"]),
    ("meta", ["mbucket"]),
]


# Demo filter trees for the driver-checked serving keys — shared with
# the DuckDB oracles via where_to_sql (one filter, two engines).
# r15 (VERDICT r14 next #3): below this estimated filter selectivity the
# graph strategy auto-enables ACORN predicate expansion — the measured
# crossover (BASELINE.md r14 recall table: blind emission-filtering reads
# 0.69/0.57/0.41 at selectivity 0.5/0.2/0.1 while ACORN reads
# 0.88/0.92/0.94; at ~0.5 the two curves meet). A Chroma-parity caller
# passing query(where=...) gets the recall-correct traversal without
# knowing the knob exists; passing graph_predicate_expansion=True/False
# still forces either path.
GRAPH_AUTO_EXPANSION_SELECTIVITY = 0.5
COLLECTION_WHERE_DEMO = {"lang": {"$in": ["en", "de", "fr"]}}
COLLECTION_GET_WHERE_DEMO = {
    "$or": [{"lang": "es"}, {"n_chars": {"$gt": 900}}],
}
COLLECTION_GET_WDOC_DEMO = {"$contains": "the"}


class DuplicateIDError(ValueError):
    """``add`` of an id that already exists (ChromaDB's add contract —
    use ``upsert`` for replace semantics)."""


class SurrogateCollisionError(RuntimeError):
    """Two distinct string ids hashed to one 60-bit surrogate."""


def _sid_expr(id_col) -> F.Column:
    """60-bit md5 surrogate — the string-id analog of vec_bucket_expr's
    md5 discipline; fits a BIGINT with headroom (no sign bit)."""
    return F.conv(F.substring(F.md5(id_col), 1, 15), 16, 10).cast("bigint")


def _sid_py(doc_id: str) -> int:
    return int(hashlib.md5(doc_id.encode()).hexdigest()[:15], 16)


def _mbucket_expr(sid_col) -> F.Column:
    return (
        F.conv(F.substring(F.md5(sid_col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % N_META_BUCKETS
    ).cast("int")


def _mbucket_py(sid: int) -> int:
    return int(hashlib.md5(str(sid).encode()).hexdigest()[:8], 16) % N_META_BUCKETS


def _mbucket_specs(id_frame: DataFrame) -> frozenset:
    """Distinct mbucket partition specs of a (vec_id) frame — the
    distinct runs DISTRIBUTED (<= N_META_BUCKETS rows collect), never a
    driver-side pass over the victim set."""
    return frozenset(
        f"mbucket={r['m']}"
        for r in id_frame.select(_mbucket_expr(F.col("vec_id")).alias("m"))
        .distinct()
        .collect()
    )


class Collection:
    """One ChromaDB-style collection rooted at ``root`` (a directory
    this class owns). All reads resolve the current committed version;
    all writes are atomic versioned commits."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        space: str = "cosine",
        embedder: "dict | None" = None,
    ):
        """``space`` is ChromaDB's ``hnsw:space`` — 'cosine' (default),
        'l2', or 'ip' — fixed at creation (persisted in the sidecar; a
        later open with a different value raises rather than silently
        reranking in the wrong metric — the r10 recall-measurement
        lesson: distance must be measured in the index's own metric).
        Candidates always come from the angular RP-LSH probe; for the
        normalized embeddings the reference stores, all three spaces
        rank identically, and for unnormalized data l2/ip still rerank
        EXACTLY in their own metric over the probed candidates.

        ``embedder`` (r12, ChromaDB's per-collection
        ``embedding_function``): an operators/embed.py spec dict
        ({'kind': 'hash_projection', 'dim': N} or {'kind':
        'sentence_transformer', 'model': name}) persisted in the
        sidecar like ``space`` — ``query_texts`` and documents-only
        ``add``/``upsert`` batches route through THIS collection's
        embedder instead of the global env-gated singleton, so two
        collections with different encoders coexist. A later open
        passing a DIFFERENT spec raises (the space guard discipline);
        opening with None adopts whatever the sidecar holds."""
        if space not in ("cosine", "l2", "ip"):
            raise ValueError(f"unknown space {space!r}")
        if embedder is not None and not isinstance(embedder, dict):
            raise ValueError("embedder: expected a spec dict or None")
        self.spark = spark
        self.root = root
        self.space = space
        self._embedder = embedder
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ state

    def _sidecar_path(self) -> str:
        return os.path.join(self.root, "collection.json")

    def _check_info(self, info: dict) -> dict:
        stored = info.get("space", "cosine")
        if stored != self.space:
            raise ValueError(
                f"collection {self.root} was created with space="
                f"{stored!r}; reopen with that space (metric mismatch "
                f"silently corrupts rankings)"
            )
        stored_emb = info.get("embedder")
        if (
            self._embedder is not None
            and stored_emb is not None
            and stored_emb != self._embedder
        ):
            raise ValueError(
                f"collection {self.root} was created with embedder="
                f"{stored_emb!r}; reopen with that spec (or None to "
                f"adopt it) — a different encoder silently corrupts "
                f"query_texts rankings"
            )
        return info

    def _load_sidecar(self) -> "dict | None":
        p = self._sidecar_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            info = json.load(f)
        return self._check_info(info)

    def _save_sidecar(self, info: dict) -> dict:
        """Exclusive-create; a racing creator must agree on the config
        (same first-batch schema) or the loser errors out loudly."""
        p = self._sidecar_path()
        try:
            fd = os.open(p, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            existing = self._load_sidecar()
            if existing != info:
                raise ValueError(
                    f"collection {self.root}: config mismatch with a "
                    f"concurrent creator: {existing} != {info}"
                )
            return existing
        with os.fdopen(fd, "w") as f:
            json.dump(info, f)
        return info

    def _cur(self) -> "str | None":
        if getattr(self, "_pin", None) is not None:
            return os.path.join(self.root, self._pin)
        return vn.current_dir(self.root)

    def _version_info(self, cur: "str | None") -> "dict | None":
        """Config persisted INSIDE the version dir (ADVICE r11): commits
        carry ``collection.json`` with the data it describes, so a
        reader/writer that resolved ``cur`` always sees a schema
        consistent with the rows it reads — no window where a schema
        evolution has committed data but not yet swapped the root
        sidecar (and an ``at()`` snapshot reads with ITS version's
        schema, not today's). None for pre-r12 versions (root sidecar
        remains the fallback)."""
        if cur is None:
            return None
        p = os.path.join(cur, "collection.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            info = json.load(f)
        return self._check_info(info)

    def _info(self, cur: "str | None") -> "dict | None":
        """Authoritative config for the resolved version: the version-
        scoped copy when present, else the root sidecar (legacy
        versions / empty collection)."""
        vinfo = self._version_info(cur)
        return vinfo if vinfo is not None else self._load_sidecar()

    def _embedder_spec(self) -> "dict | None":
        """The collection's effective embedder spec: the persisted
        sidecar value wins (creation-time contract), the constructor
        arg covers the not-yet-created window, None = the env-gated
        global singleton."""
        info = self._info(self._cur())
        if info is not None and info.get("embedder") is not None:
            return info["embedder"]
        return self._embedder

    def at(self, version: str) -> "Collection":
        """Read-only snapshot view pinned to ``version`` (a name from
        ``versions()``) — time-travel READS without moving ``_CURRENT``
        (``rollback`` is the write-side tool; this one lets a reader
        keep serving yesterday's index while writers continue).
        Committed version dirs are immutable, so the view is a true
        snapshot; note gc retains only the trailing versions (keep=2),
        so pin only versions ``versions()`` still lists. Writes through
        a pinned view raise."""
        names = {v["name"] for v in self.versions()}
        if version not in names:
            raise ValueError(
                f"unknown version {version!r}; on disk: {sorted(names)}"
            )
        snap = Collection(self.spark, self.root, space=self.space)
        snap._pin = version
        return snap

    def _require(self) -> tuple[str, dict]:
        cur = self._cur()
        info = self._info(cur)
        if cur is None or info is None:
            raise ValueError(f"collection {self.root} is empty — add() first")
        return cur, info

    def _meta(self, cur: str, info: dict) -> DataFrame:
        return self.spark.read.schema(info["meta_schema"]).parquet(
            os.path.join(cur, "meta")
        )

    def _vecs(self, cur: str) -> DataFrame:
        return self.spark.read.schema(VECS_SCHEMA).parquet(os.path.join(cur, "vecs"))

    def _bands(self, cur: str) -> DataFrame:
        return self.spark.read.schema(BANDS_SCHEMA).parquet(
            os.path.join(cur, "bands")
        )

    def _graph_lineage_dir(self) -> str:
        """The graph sidecar's LINEAGE state dir — stable across
        collection commits (unlike ``index_root``, which fingerprints
        the whole store and so changes on every commit by design).
        Holds ``state.json``: which collection version the current
        graph sidecar reflects, that version's parquet fingerprint
        (stale-path guard: a recreated collection at the same path must
        never be served a previous collection's graph), and the scratch
        sf_dir whose graph root carries the sidecar's version history.

        Lives INSIDE the collection root (ADVICE r13: a world-shared
        /tmp path could be pre-created/poisoned by another local user
        and outlived the collection it described, decoupling state and
        collection lifetimes). The versioning layer only ever touches
        ``v_*`` / ``.__tmp_*`` entries, so a dotted sibling is inert to
        commits/compaction — and ``delete_collection``'s rm -rf now
        takes the lineage down WITH the collection, closing the
        recreate-at-same-path staleness window structurally."""
        return os.path.join(self.root, ".graph_lineage")

    def _graph_sidecar(self, cur: str) -> str:
        """Resolve the navigable-graph sidecar index over THIS
        collection version's vectors — the reference's actual serving
        structure (ChromaDB's default index IS hnswlib). INCREMENTAL
        (VERDICT r12 next #3): the first graph query stages the version
        as a scratch corpus and full-builds; subsequent versions apply
        the vecs DELTA against the last reflected version through
        ``update_graph_index`` (pure additions) and
        ``delete_from_graph_index`` (pure removals) on the SAME graph
        root — a steady upsert stream pays O(batch) per commit, exactly
        hnswlib's ``add_items`` amortization, instead of a full rebuild
        per version. CHANGED embeddings are incremental too (r14,
        VERDICT r13 next #4): the old sid is tombstoned and the new
        vector added under a fresh surrogate rid in the sidecar's
        PRIVATE id space — the graph stays ADD-only (hnswlib's own
        contract) while an update()-heavy workload pays O(batch) per
        commit; the rid→sid alias map rides the lineage state and is
        applied at pool emission (``_graph_alias_map``). Re-added
        tombstoned ids, a compacted-away predecessor version, a
        cross-lifetime fingerprint mismatch, or a concurrent-writer
        race still fall back to the full rebuild (which RESETS the
        alias map — a fresh scratch serves plain sids). Emission safety
        is structural: deltas only ever REMOVE ids from the
        collection's vecs store, and every strategy's final distance
        join runs against the CURRENT version's vecs, so tombstoned
        pool candidates drop out there (a replaced sid surviving in a
        pool as a routing bridge joins to its CURRENT vector — right
        answer by construction; the alias translation dedups it against
        its rid twin). Returns the graph version dir."""
        from ..memo import dataset_fingerprint, index_root
        from ..operators.graph_ann import build_graph_index

        lin = self._graph_lineage_dir()
        state_p = os.path.join(lin, "state.json")
        cur_name = os.path.basename(cur)
        state = None
        if os.path.exists(state_p):
            try:
                with open(state_p) as f:
                    state = json.load(f)
            except (OSError, ValueError):
                state = None

        def _fp(ver_dir: str) -> list:
            return [list(t) for t in dataset_fingerprint(ver_dir)]

        def _save(scratch: str, alias: "dict | None" = None) -> None:
            os.makedirs(lin, exist_ok=True)
            tmp = state_p + ".__tmp__"
            with open(tmp, "w") as f:
                json.dump(
                    {
                        "coll_ver": cur_name,
                        "fp": _fp(cur),
                        "scratch": scratch,
                        # sid -> PRIVATE graph id for incrementally
                        # replaced vectors; {} after a full rebuild (a
                        # fresh scratch serves plain sids)
                        "alias": alias or {},
                    },
                    f,
                )
            os.replace(tmp, state_p)

        if state is not None and state.get("coll_ver") == cur_name:
            if state.get("fp") == _fp(cur) and os.path.isdir(
                state.get("scratch", "")
            ):
                # the sidecar already reflects this exact version
                return build_graph_index(self.spark, state["scratch"])
            state = None  # same name, different content: stale lineage
        if (
            state is not None
            and state.get("coll_ver", "") < cur_name
            and os.path.isdir(os.path.join(self.root, state.get("coll_ver", "")))
            and os.path.isdir(state.get("scratch", ""))
            # ADVICE r13 (medium): the delta branch must verify the
            # lineage's stored fingerprint against the PREV version dir
            # it is about to diff from — version dirs are immutable
            # within a lifetime, so a mismatch can only mean the
            # lineage outlived its collection (recreated at the same
            # path with version numbering past the stale coll_ver);
            # falling through serves a full rebuild instead of applying
            # a new-collection delta to an old-collection graph
            and state.get("fp")
            == _fp(os.path.join(self.root, state["coll_ver"]))
        ):
            prev = os.path.join(self.root, state["coll_ver"])
            try:
                gver, alias = self._graph_apply_delta(
                    state["scratch"], prev, cur, state.get("alias") or {}
                )
                _save(state["scratch"], alias)
                return gver
            except (ValueError, vn.ConcurrentWriterError):
                pass  # not incrementally applicable: full rebuild below
        # full (re)build: stage this version as a fresh scratch corpus
        # (content-addressed by version name + store fingerprint) and
        # run the shared build pipeline — one graph lifecycle
        # implementation, not a facade fork
        scratch = index_root(
            "coll_graph_corpus", self.root, cur_name
        )
        corpus_p = os.path.join(scratch, "embeddings.parquet")
        if not os.path.isdir(corpus_p):
            tmp_p = corpus_p + ".__tmp__"
            self._vecs(cur).select(
                "vec_id", F.col("emb").alias("embedding")
            ).write.mode("overwrite").parquet(tmp_p)
            os.makedirs(scratch, exist_ok=True)
            try:
                os.rename(tmp_p, corpus_p)
            except OSError:
                pass  # racing stager won; identical content
        gver = build_graph_index(self.spark, scratch)
        if state is None or state.get("coll_ver", "") <= cur_name:
            # never move the lineage BACKWARD: a pinned-snapshot fork
            # querying an older version gets its own scratch build
            # without resetting the live lineage
            _save(scratch)
        return gver

    def _graph_apply_delta(
        self, scratch: str, prev: str, cur: str, alias: dict
    ) -> "tuple[str, dict]":
        """Advance the sidecar graph from the ``prev`` collection
        version to ``cur`` by the vecs diff: pure additions stream
        through ``update_graph_index`` (frozen coarse structure, capped
        reversed edges), pure removals through
        ``delete_from_graph_index`` (tombstones keep routing), and
        CHANGED embeddings (same sid, new vector) become tombstone-old
        + add-under-fresh-surrogate (r14, VERDICT r13 next #4): the
        graph node for a replaced sid is a PRIVATE rid =
        md5("rep|version|sid") in the same 60-bit space, recorded in
        ``alias`` (sid -> live graph id) and translated back at pool
        emission — the graph stays ADD-only (hnswlib's contract) while
        update()-heavy workloads pay O(batch) per commit. Deterministic
        rids make a crash replay idempotent (the whole re-added batch
        is detected as present and no-ops). Raises ValueError on
        structural inapplicability (e.g. an rid collision trips the
        ADD-only guard) — the caller then serves a full rebuild, which
        resets the alias map. Returns (graph version dir, new alias)."""
        from ..operators.graph_ann import (
            build_graph_index,
            delete_from_graph_index,
            update_graph_index,
        )

        from ..operators.dedup import md5_long

        pv = self._vecs(prev).select("vec_id", "emb")
        cv = self._vecs(cur).select("vec_id", "emb")
        cur_name = os.path.basename(cur)
        # ADVICE r14 #3: the rid derives DISTRIBUTEDLY (md5_long over
        # the same "rep|version|sid" string the driver loop used to
        # hash — identical first-15-hex-chars value), and the driver
        # collects only the (sid, rid) id pairs for the alias map —
        # never the changed embeddings, so an update()-heavy commit on
        # a wide-embedding collection stays O(batch × 16 bytes) driver
        # memory, not O(batch × dim)
        changed = (
            cv.join(pv.select("vec_id", F.col("emb").alias("pe")), "vec_id")
            .filter(F.col("emb") != F.col("pe"))
            .select(
                "vec_id",
                "emb",
                md5_long(
                    F.concat(
                        F.lit(f"rep|{cur_name}|"),
                        F.col("vec_id").cast("string"),
                    )
                ).alias("rid"),
            )
        )
        alias = dict(alias)
        tomb_ids = []
        n_changed = 0
        for r in changed.select("vec_id", "rid").collect():
            sid = int(r["vec_id"])
            n_changed += 1
            # tombstone the sid's LIVE graph node (the sid itself, or
            # the rid of an earlier replacement)
            tomb_ids.append(int(alias.get(str(sid), sid)))
            alias[str(sid)] = int(r["rid"])
        added = cv.join(pv.select("vec_id"), "vec_id", "left_anti")
        removed = [
            int(r["vec_id"])
            for r in pv.join(cv.select("vec_id"), "vec_id", "left_anti")
            .select("vec_id")
            .collect()
        ]
        for sid in removed:
            tomb_ids.append(int(alias.pop(str(sid), sid)))
        gver = build_graph_index(self.spark, scratch)
        if n_changed:
            added = added.unionByName(
                changed.select(F.col("rid").alias("vec_id"), "emb")
            )
        if added.head(1):
            gver = update_graph_index(self.spark, scratch, added)
        if tomb_ids:
            gver = delete_from_graph_index(self.spark, scratch, tomb_ids)
        return gver, alias

    def _graph_alias_map(self) -> dict:
        """{private graph id -> sid} for incrementally REPLACED vectors
        (the inverse of the lineage's sid->rid alias) — applied when a
        graph pool's ids become collection candidates. Empty when the
        sidecar has never replaced (the common case: zero overhead)."""
        state_p = os.path.join(self._graph_lineage_dir(), "state.json")
        try:
            with open(state_p) as f:
                alias = json.load(f).get("alias") or {}
        except (OSError, ValueError):
            return {}
        return {int(g): int(s) for s, g in alias.items()}

    def _graph_batch_state(self, gver: str, qvecs: list) -> tuple:
        """The fused-IO prologue shared by the blind and the ACORN
        facade beams: resolves the graph version's entry and coarse
        structure (memoized collects), ranks each query's
        GRAPH_SEED_CELLS nearest cells driver-side and takes their hubs
        as seed doors (zero per-query jobs — cellhubs/ is collected
        once per version), and returns (fetch_vecs, fetch_adj,
        payload, visited)
        — visited pre-seeded with each query's scored seeds (md5-min
        entry hub + its seed-cell hubs, NO self-exclusion: a stored
        vector identical to a query surfaces at distance 0, Chroma
        semantics)."""
        from ..memo import component_df, version_memo
        from ..operators.ann import VECS_SCHEMA as GV_SCHEMA
        from ..operators.ann import vec_bucket_py
        from ..operators.graph_ann import (
            GRAPH_EDGES_SCHEMA,
            GRAPH_ENTRY_SCHEMA,
            _point_reads,
            _seed_hubs,
            _sim4,
        )

        # session-memoized handles for the immutable graph version's
        # components + scoped-AQE point reads — the graph_ann.py r16
        # serving discipline applied to the facade's fetchers (each
        # fetch used to rebuild the datasource relation and pay AQE's
        # wrapper on a single-stage collect)
        vecs_df = component_df(self.spark, gver, "vecs", GV_SCHEMA)
        edges_df = component_df(self.spark, gver, "edges", GRAPH_EDGES_SCHEMA)

        def fetch_vecs(ids) -> dict:
            ids = sorted(ids)
            vbs = sorted({vec_bucket_py(i) for i in ids})
            with _point_reads(self.spark):
                rows = (
                    vecs_df
                    .filter(
                        F.col("vbucket").isin(vbs) & F.col("vec_id").isin(ids)
                    )
                    .select("vec_id", "emb")
                    .collect()
                )
            return {r["vec_id"]: [float(x) for x in r["emb"]] for r in rows}

        # entry/ is a tiny table in an immutable graph version — one
        # collect per (session, version), not one job per query
        entry = version_memo(
            self.spark,
            gver,
            "coll_graph_entry",
            lambda: (
                self.spark.read.schema(GRAPH_ENTRY_SCHEMA)
                .parquet(os.path.join(gver, "entry"))
                .orderBy("rk")
                .head()["vec_id"]
            ),
        )
        # seed doors: the hubs of each query's GRAPH_SEED_CELLS nearest
        # cells (pure driver math over the memoized cents + the graph
        # version's cellhubs table — the r14 multi-door seeding; this
        # replaced the per-batch assignment job + member read + hubmap
        # point-read with zero jobs)
        seeds_per_q = []
        for q in qvecs:
            s = {int(entry)}
            s.update(int(h) for h in _seed_hubs(self.spark, gver, list(q)))
            seeds_per_q.append(s)
        first = fetch_vecs(set().union(*seeds_per_q)) if seeds_per_q else {}
        visited = [
            {s: _sim4(q, first[s]) for s in seeds if s in first}
            for q, seeds in zip(qvecs, seeds_per_q)
        ]
        # shared payload cache filled by fetch_adj from the edge rows'
        # neighbor embeddings (r17 GRAPH_EDGES_SCHEMA): the beams read
        # candidate vectors from here instead of a second vecs fetch
        payload: dict = {}

        def fetch_adj(srcs) -> dict:
            """One fused edges point-read: {src: {nbr, ...}}, and the
            neighbors' embeddings land in ``payload`` from the same
            rows (r17 — the per-round vecs fetch is gone). NO
            per-source expansion cap — a sim-ranked cap was measured to
            sever hub star-doors into interleaved sub-clusters
            (graph_ann.py module doc); volume is already bounded by the
            build's per-source reversal cap."""
            srcs = sorted(srcs)
            if not srcs:
                return {}
            sbs = sorted({vec_bucket_py(s) for s in srcs})
            adj: dict = {}
            with _point_reads(self.spark):
                rows = (
                    edges_df
                    .filter(
                        F.col("sbucket").isin(sbs) & F.col("src").isin(srcs)
                    )
                    .select("src", "nbr", "nemb")
                    .collect()
                )
            for r in rows:
                adj.setdefault(r["src"], set()).add(r["nbr"])
                if r["nbr"] not in payload and r["nemb"] is not None:
                    payload[r["nbr"]] = [float(x) for x in r["nemb"]]
            return adj

        return fetch_vecs, fetch_adj, payload, visited

    def _graph_beam_batch(
        self, gver: str, qvecs: list, beam: int, rounds: int
    ) -> list:
        """Beam searches for M RAW query vectors with FUSED IO (the
        ann_graph_batch_topk discipline): each round issues ONE
        payload-carrying edges point-read for the union of all
        frontiers (r17: candidate embeddings ride the edge rows, so
        the per-round vecs fetch is gone; prologue jobs:
        ``_graph_batch_state``). Per-query visited state is untouched,
        so each query's evolution equals its solo run
        (ann_graph_batch_topk's pinned property). Returns one
        {sid: 4-dp sim} per query, in input order."""
        from ..operators.graph_ann import _sim4

        fetch_vecs, fetch_adj, payload, visited = self._graph_batch_state(
            gver, qvecs
        )
        frontier = [
            sorted(v, key=lambda x: (-v[x], x))[:beam] for v in visited
        ]
        for _ in range(rounds):
            all_srcs = {s for fr in frontier for s in fr}
            if not all_srcs:
                break
            adj = fetch_adj(all_srcs)
            new_per_q = [
                {n for s in frontier[qi] for n in adj.get(s, ())}
                - set(visited[qi])
                for qi in range(len(qvecs))
            ]
            need = set().union(*new_per_q) if new_per_q else set()
            if not need:
                break  # every query at its fixed point
            for qi, q in enumerate(qvecs):
                for vid in new_per_q[qi]:
                    if vid in payload:
                        visited[qi][vid] = _sim4(q, payload[vid])
                frontier[qi] = sorted(
                    visited[qi], key=lambda x: (-visited[qi][x], x)
                )[:beam]
        return visited

    def _graph_beam_batch_acorn(
        self, gver: str, qvecs: list, beam: int, rounds: int, pass_of
    ) -> "tuple[list, set]":
        """Predicate-aware facade beams (VERDICT r12 next #4, after
        ACORN SIGMOD'24 — the graph_ann.py _beam_visited_acorn rule
        with this facade's fused IO): per query, the frontier ranks
        PASSING visited nodes first (failing ones fill only when
        passing are scarce), and hop-1's failing members get their own
        neighbors expanded (hop 2) — so a selective ``where`` keeps
        recall instead of thinning an oblivious pool (BASELINE.md r12b:
        0.15 at 10% selectivity). Per round: two fused payload-carrying
        edges point-reads (frontiers; failing hop-1) plus two fused
        pass lookups on the filtered meta (mbucket-pruned) — the
        per-round vecs fetch rides the edge rows since r17. ~2× the
        blind beam's IO, the documented opt-in cost. Returns
        (visited list, passing sid set)."""
        from ..operators.graph_ann import _sim4

        fetch_vecs, fetch_adj, payload, visited = self._graph_batch_state(
            gver, qvecs
        )
        passing: set = set(pass_of({s for v in visited for s in v}))
        for _ in range(rounds):
            frontier = [
                sorted(
                    v, key=lambda x: (x not in passing, -v[x], x)
                )[:beam]
                for v in visited
            ]
            all_srcs = {s for fr in frontier for s in fr}
            if not all_srcs:
                break
            adj = fetch_adj(all_srcs)
            new1_per_q = [
                {n for s in frontier[qi] for n in adj.get(s, ())}
                - set(visited[qi])
                for qi in range(len(qvecs))
            ]
            need1 = set().union(*new1_per_q) if new1_per_q else set()
            pass1 = set(pass_of(need1 - passing)) if need1 else set()
            passing |= pass1
            # hop 2 through the failing hop-1 members, fused across
            # queries (each query only adopts hop-2 nodes reached
            # through ITS OWN failing neighbors — per-query state stays
            # solo-equivalent)
            fail_per_q = [
                {n for n in new1_per_q[qi] if n not in passing}
                for qi in range(len(qvecs))
            ]
            all_fail = set().union(*fail_per_q) if fail_per_q else set()
            adj2 = fetch_adj(all_fail)
            new2_per_q = [
                {n for s in fail_per_q[qi] for n in adj2.get(s, ())}
                - set(visited[qi])
                - new1_per_q[qi]
                for qi in range(len(qvecs))
            ]
            need2 = set().union(*new2_per_q) if new2_per_q else set()
            pass2 = set(pass_of(need2 - passing)) if need2 else set()
            passing |= pass2
            need = need1 | need2
            if not need:
                break
            for qi, q in enumerate(qvecs):
                for vid in new1_per_q[qi] | new2_per_q[qi]:
                    if vid in payload:
                        visited[qi][vid] = _sim4(q, payload[vid])
        return visited, passing

    def _band_rows_for(self, e: DataFrame, dim: int) -> DataFrame:
        """The RP banding kernel at this collection's dim (the module
        kernel rp_band_rows_for is fixed at the engine table's RP_DIM;
        signatures here come from the SAME md5-seeded planes generator,
        so a 64-dim collection bands byte-identically to the engine)."""
        import numpy as np
        import pandas as pd

        signs_t = np.array(_rp_plane_signs(RP_PLANES, dim), dtype=np.int64).T

        def batches(it):
            for pdf in it:
                if len(pdf) == 0:
                    continue
                mat = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["emb"]]
                )
                if mat.shape[1] != dim:
                    raise ValueError(
                        f"collection dim={dim}, got {mat.shape[1]}"
                    )
                keys = _rp_band_keys(mat, signs_t)
                ids = pdf["vec_id"].to_numpy()
                yield pd.DataFrame(
                    {
                        "vec_id": np.repeat(ids, RP_BANDS),
                        "band": np.tile(
                            np.arange(RP_BANDS, dtype=np.int32), len(ids)
                        ),
                        "band_key": keys.reshape(-1).astype(np.int32),
                    }
                )

        return e.mapInPandas(batches, BANDS_SCHEMA)

    # ----------------------------------------------------------- writes

    @staticmethod
    def _normalize(batch: DataFrame) -> tuple[DataFrame, list[str]]:
        cols = batch.columns
        if "id" not in cols or "embedding" not in cols:
            raise ValueError("batch needs 'id' and 'embedding' columns")
        meta_cols = [c for c in cols if c not in _RESERVED]
        atomic = ("string", "bigint", "int", "smallint", "tinyint",
                  "double", "float", "boolean", "date", "timestamp",
                  "decimal")
        for f in batch.schema.fields:
            if f.name in meta_cols and not f.dataType.simpleString().startswith(atomic):
                raise ValueError(
                    f"metadata column {f.name!r} must be a scalar "
                    f"(ChromaDB metadata values are str/int/float/bool), "
                    f"got {f.dataType.simpleString()}"
                )
        doc = (
            F.col("document").cast("string")
            if "document" in cols
            else F.lit(None).cast("string")
        )
        out = batch.select(
            F.col("id").cast("string").alias("id"),
            F.col("embedding").cast("array<double>").alias("emb"),
            doc.alias("document"),
            *[F.col(c) for c in meta_cols],
        )
        return out, meta_cols

    def add(self, batch: DataFrame) -> str:
        """Insert-only (ChromaDB ``add``): any id already present
        raises ``DuplicateIDError``."""
        return self._write(batch, replace=False)

    def upsert(self, batch: DataFrame) -> str:
        """Insert-or-replace (the reference's write path,
        indexing_agent.py:332-361): a resubmitted id's vector, document
        and metadata are replaced atomically across all components."""
        return self._write(batch, replace=True)

    def update(self, batch: DataFrame) -> str:
        """Update-only (ChromaDB ``update`` — distinct from ``upsert``):
        every id in the batch must already exist; an absent id raises
        ``KeyError`` and nothing commits.

        Partial batches (r11, the Chroma ``update(ids, metadatas=...)``
        shape): the batch may OMIT ``embedding``, ``document``, and/or
        any metadata column — omitted fields keep their stored values,
        filled by a bucket-pruned join against the current version
        BEFORE the atomic replace (Chroma replaces the whole metadata
        dict; with schema-on-first-write typed columns, the column
        subset is the equivalent contract). Provided columns replace.
        A full-schema batch takes the direct path with zero old reads
        beyond the resubmission check.

        Lost-update fence (ADVICE r11): the carried-forward old values
        are a snapshot; the commit CASes on exactly that snapshot's
        version, so a concurrent commit landing mid-assembly raises
        ``ConcurrentWriterError`` instead of silently reverting the
        interleaved writer's changes to omitted columns — this method
        then re-derives the assembly from the new current version and
        retries (bounded)."""
        cols = set(batch.columns)
        if "id" not in cols:
            raise ValueError("batch needs an 'id' column")
        cur = self._cur()
        info = self._info(cur)
        if cur is None or info is None:
            some = [r["id"] for r in batch.select("id").limit(3).collect()]
            raise KeyError(
                f"update(): collection is empty — ids {some} absent; "
                f"use add() or upsert()"
            )
        meta_cols = self._meta_cols(info)
        full = {"embedding", "document", *meta_cols}
        provided = cols - {"id"}
        unknown = provided - full
        if unknown:
            raise ValueError(
                f"update(): unknown columns {sorted(unknown)} — collection "
                f"schema is {sorted(full)}"
            )
        if provided >= full:
            return self._write(batch, replace=True, require_present=True)

        b = batch.withColumn(
            "vec_id", _sid_expr(F.col("id").cast("string"))
        ).localCheckpoint(eager=True)
        n = b.count()
        if n == 0:
            return cur
        if b.select("id").distinct().count() != n:
            raise ValueError("duplicate ids within one batch")
        last = None
        for _ in range(3):
            try:
                return self._update_partial(b, n, provided, cur, info, meta_cols)
            except vn.ConcurrentWriterError as ex:
                last = ex
                cur = self._cur()
                info = self._info(cur)
                if cur is None or info is None:
                    raise
                meta_cols = self._meta_cols(info)
        raise last

    def _update_partial(self, b, n, provided, cur, info, meta_cols) -> str:
        """One partial-update attempt against the ``cur`` snapshot: fill
        omitted columns from ``cur``'s stores, then commit with the CAS
        expected pinned to ``cur`` (via ``_write(expected_version=...)``)
        so a stale assembly loses loudly, never silently."""
        mb = sorted(
            r["m"]
            for r in b.select(_mbucket_expr(F.col("vec_id")).alias("m"))
            .distinct()
            .collect()
        )
        old = (
            self._meta(cur, info)
            .filter(F.col("mbucket").isin(mb))
            .join(b.select("vec_id"), "vec_id", "leftsemi")
            .select(
                "vec_id",
                F.col("document").alias("_old_document"),
                *[F.col(c).alias(f"_old_{c}") for c in meta_cols],
            )
        )
        assembled = b.join(old, "vec_id")
        if "embedding" not in provided:
            vb = sorted(
                r["b"]
                for r in b.select(vec_bucket_expr(F.col("vec_id")).alias("b"))
                .distinct()
                .collect()
            )
            oldv = (
                self._vecs(cur)
                .filter(F.col("vbucket").isin(vb))
                .join(b.select("vec_id"), "vec_id", "leftsemi")
                .select("vec_id", F.col("emb").alias("_old_embedding"))
            )
            assembled = assembled.join(oldv, "vec_id")
        # assemble in the COLLECTION's column order, not sorted order:
        # _write derives the meta schema from batch column order, so a
        # collection whose metadata columns are not alphabetical must
        # still round-trip (regression-pinned)
        sel = [F.col("id")]
        for c in ["embedding", "document"] + meta_cols:
            sel.append(
                F.col(c) if c in provided else F.col(f"_old_{c}").alias(c)
            )
        assembled = assembled.select(*sel).localCheckpoint(eager=True)
        if assembled.count() != n:
            absent = [
                r["id"]
                for r in b.join(
                    assembled.select(_sid_expr(F.col("id")).alias("vec_id")),
                    "vec_id",
                    "left_anti",
                )
                .select("id")
                .head(3)
            ]
            raise KeyError(
                f"update(): ids not present: {absent} — use upsert() to "
                f"insert-or-replace"
            )
        return self._write(
            assembled,
            replace=True,
            require_present=True,
            expected_version=os.path.basename(cur),
        )

    def _assert_writable(self) -> None:
        if getattr(self, "_pin", None) is not None:
            raise ValueError(
                f"collection view pinned to {self._pin} is read-only — "
                f"write through the unpinned Collection"
            )

    def _write(
        self,
        batch: DataFrame,
        replace: bool,
        require_present: bool = False,
        expected_version: "str | None" = None,
    ) -> str:
        """``expected_version`` (ADVICE r11): the version name the
        caller's batch was ASSEMBLED against (partial update's
        carried-forward old values). When set, the resolved current
        version must still be it — and the commit CASes on it under the
        lock — so a concurrent commit between assembly and here raises
        ``ConcurrentWriterError`` instead of silently reverting the
        interleaved writer's columns."""
        self._assert_writable()
        if "embedding" not in batch.columns and "document" in batch.columns:
            # ChromaDB add(documents=...): embeddings computed by THE
            # COLLECTION's embedder (sidecar spec; global singleton
            # when unset) through the Arrow batch path (r12)
            from ..operators.embed import make_embed_udf_for

            batch = batch.withColumn(
                "embedding",
                make_embed_udf_for(self._embedder_spec())(
                    F.col("document").cast("string")
                ),
            )
        b, meta_cols = self._normalize(batch)
        n = b.count()
        if n == 0:
            cur = self._cur()
            return cur if cur is not None else ""
        if b.select("id").distinct().count() != n:
            raise ValueError("duplicate ids within one batch")
        b = b.withColumn("vec_id", _sid_expr(F.col("id"))).localCheckpoint(
            eager=True
        )
        # within-batch surrogate collision (ADVICE r11): two DISTINCT new
        # ids sharing one 60-bit surrogate pass the duplicate-id check
        # above and would silently write two rows under one vec_id —
        # reject at write time, same contract as the existing-row check.
        intra = (
            b.groupBy("vec_id")
            .agg(F.countDistinct("id").alias("n_ids"), F.min("id").alias("a"), F.max("id").alias("z"))
            .filter(F.col("n_ids") > 1)
            .head(1)
        )
        if intra:
            r = intra[0]
            raise SurrogateCollisionError(
                f"ids {r['a']!r} and {r['z']!r} in one batch share surrogate "
                f"{r['vec_id']} — shard into another collection"
            )

        dim = b.select(F.size("emb").alias("d")).agg(
            F.min("d").alias("lo"), F.max("d").alias("hi")
        ).head()
        if dim["lo"] != dim["hi"]:
            raise ValueError(f"mixed embedding dims {dim['lo']}..{dim['hi']}")
        meta_schema = ", ".join(
            ["vec_id bigint", "id string", "document string"]
            + [
                f"{f.name} {f.dataType.simpleString()}"
                for f in b.schema.fields
                if f.name in meta_cols
            ]
            + ["mbucket int"]
        )
        cur = self._cur()
        if expected_version is not None and (
            cur is None or os.path.basename(cur) != expected_version
        ):
            raise vn.ConcurrentWriterError(
                f"{self.root}: batch assembled against {expected_version} "
                f"but _CURRENT is "
                f"{None if cur is None else os.path.basename(cur)!r} — "
                f"re-derive"
            )
        # validate against the VERSION-scoped config when the resolved
        # version carries one (schema consistent with the data by
        # construction — ADVICE r11); root sidecar covers first-write
        # and legacy versions.
        info = self._version_info(cur) if cur is not None else None
        if info is None:
            desired = {
                "dim": dim["lo"],
                "meta_schema": meta_schema,
                "space": self.space,
            }
            if self._embedder is not None:
                desired["embedder"] = self._embedder
            info = self._save_sidecar(desired)
        if info["meta_schema"] != meta_schema:
            raise ValueError(
                f"metadata schema mismatch: collection has "
                f"{info['meta_schema']!r}, batch brings {meta_schema!r}"
            )
        if info["dim"] != dim["lo"]:
            raise ValueError(f"dim mismatch: {info['dim']} != {dim['lo']}")
        extra = {"collection.json": json.dumps(info)}

        batch_ids = b.select("vec_id", "id")
        batch_bands = self._band_rows_for(
            b.select("vec_id", "emb").filter(_nonzero_pred()), info["dim"]
        ).localCheckpoint(eager=True)

        if cur is None:
            if require_present:
                some = [r["id"] for r in b.select("id").head(3)]
                raise KeyError(
                    f"update(): collection is empty — ids {some} absent; "
                    f"use add() or upsert()"
                )
            # initial build: plain component writes, expected=None
            try:
                new = vn.commit_version(
                    self.spark,
                    self.root,
                    self._plan(b, batch_bands, meta_cols, frozenset(), frozenset(), frozenset(), None),
                    expected=None,
                    extra_files=extra,
                )
            except vn.ConcurrentWriterError:
                # a racing creator won the initial commit; replay this
                # batch on top of theirs with the CALLER's semantics —
                # a losing add() must still raise DuplicateIDError if the
                # winner carried overlapping ids (VERDICT r10 next #4)
                return self._write(batch, replace=replace, require_present=require_present)
            return new

        # resubmitted ids: pruned reverse-map read from the collection's
        # own meta store (the vecs store's analog of update_rp_index)
        mbuckets = sorted(
            r["m"]
            for r in b.select(_mbucket_expr(F.col("vec_id")).alias("m"))
            .distinct()
            .collect()
        )
        old_meta_aff = self._meta(cur, info).filter(F.col("mbucket").isin(mbuckets))
        clash = (
            old_meta_aff.join(batch_ids.withColumnRenamed("id", "new_id"), "vec_id")
            .select("vec_id", "id", "new_id")
            .localCheckpoint(eager=True)
        )
        coll = clash.filter(F.col("id") != F.col("new_id")).head(1)
        if coll:
            r = coll[0]
            raise SurrogateCollisionError(
                f"ids {r['id']!r} and {r['new_id']!r} share surrogate "
                f"{r['vec_id']} — shard into another collection"
            )
        resub_ids = clash.select("vec_id").localCheckpoint(eager=True)
        if require_present:
            absent = (
                batch_ids.join(resub_ids, "vec_id", "left_anti").select("id").head(3)
            )
            if absent:
                raise KeyError(
                    f"update(): ids not present: {[r['id'] for r in absent]} — "
                    f"use upsert() to insert-or-replace"
                )
        if not replace and resub_ids.head(1):
            some = [r["vec_id"] for r in resub_ids.head(3)]
            raise DuplicateIDError(
                f"add(): ids already present (surrogates {some}) — use upsert()"
            )

        rw_mb = _mbucket_specs(resub_ids)
        # victim vectors' stale band/vec partitions, reverse-mapped from
        # the current vecs store (pruned by the victims' vbuckets)
        rw_vb, rw_pairs = self._stale_partitions(cur, resub_ids, info["dim"])
        new = vn.commit_version(
            self.spark,
            self.root,
            self._plan(b, batch_bands, meta_cols, rw_pairs, rw_vb, rw_mb, (cur, info, resub_ids)),
            expected=os.path.basename(cur),
            compact=_COMPONENTS,
            extra_files=extra,
        )
        return new

    def _stale_partitions(self, cur, victim_ids, dim):
        vbuckets = sorted(
            r["b"]
            for r in victim_ids.select(
                vec_bucket_expr(F.col("vec_id")).alias("b")
            )
            .distinct()
            .collect()
        )
        if not vbuckets:
            return frozenset(), frozenset()
        old = (
            self._vecs(cur)
            .filter(F.col("vbucket").isin(vbuckets))
            .join(victim_ids, "vec_id", "leftsemi")
            .localCheckpoint(eager=True)
        )
        rw_vb = frozenset(
            f"vbucket={r['vbucket']}"
            for r in old.select("vbucket").distinct().collect()
        )
        rw_pairs = frozenset(
            f"band={r['band']}/band_key={r['band_key']}"
            for r in self._band_rows_for(
                old.select("vec_id", "emb").filter(_nonzero_pred()), dim
            )
            .select("band", "band_key")
            .distinct()
            .collect()
        )
        return rw_vb, rw_pairs

    def _plan(self, b, batch_bands, meta_cols, rw_pairs, rw_vb, rw_mb, prev):
        """Component plans: survivors (anti-joined old rows of rewritten
        partitions) + batch appends — the shared-kernel discipline."""
        def survivors(read, part_col_set, victim_ids, keep_cols):
            preds = []
            for spec in sorted(part_col_set):
                kv = dict(p.split("=") for p in spec.split("/"))
                leg = None
                for c, v in kv.items():
                    e = F.col(c).cast("string") == v
                    leg = e if leg is None else (leg & e)
                preds.append(leg)
            return (
                read.filter(reduce(or_, preds))
                .join(victim_ids, "vec_id", "left_anti")
                .select(*keep_cols)
            )

        band_writes, vec_writes, meta_writes = [], [], []
        if prev is not None:
            cur, info, resub_ids = prev
            if rw_pairs:
                band_writes.append(
                    survivors(
                        self._bands(cur), rw_pairs, resub_ids,
                        ["band", "band_key", "vec_id"],
                    )
                )
            if rw_vb:
                vec_writes.append(
                    survivors(
                        self._vecs(cur), rw_vb, resub_ids,
                        ["vbucket", "vec_id", "emb"],
                    )
                )
            if rw_mb:
                meta_writes.append(
                    survivors(
                        self._meta(cur, info), rw_mb, resub_ids,
                        ["mbucket", "vec_id", "id", "document", *meta_cols],
                    )
                )
        band_writes.append(batch_bands.select("band", "band_key", "vec_id"))
        vec_writes.append(
            b.select(
                vec_bucket_expr(F.col("vec_id")).alias("vbucket"),
                "vec_id",
                "emb",
            )
        )
        meta_writes.append(
            b.select(
                _mbucket_expr(F.col("vec_id")).alias("mbucket"),
                "vec_id",
                "id",
                "document",
                *meta_cols,
            )
        )
        return [
            vn.Component("bands", ("band", "band_key"), frozenset(rw_pairs), tuple(band_writes)),
            vn.Component("vecs", ("vbucket",), frozenset(rw_vb), tuple(vec_writes)),
            vn.Component("meta", ("mbucket",), frozenset(rw_mb), tuple(meta_writes)),
        ]

    def delete(
        self,
        ids: "list[str] | None" = None,
        where: "dict | None" = None,
        where_document: "dict | None" = None,
    ) -> str:
        """Targeted deletion (ChromaDB ``delete(ids=..., where=...)``):
        victims resolve from literal ids (mbucket-pruned point reads)
        and/or compiled DSL predicates on the meta store; only victim
        partitions rewrite, inside one atomic commit."""
        self._assert_writable()
        if ids is None and where is None and where_document is None:
            raise ValueError("delete(): pass ids and/or where/where_document")
        cur, info = self._require()
        meta = self._meta(cur, info)
        pred = None
        if ids is not None:
            sids = sorted({_sid_py(i) for i in ids})
            mb = sorted({_mbucket_py(s) for s in sids})
            pred = F.col("mbucket").isin(mb) & F.col("vec_id").isin(sids)
        if where is not None:
            w = compile_where(where)
            pred = w if pred is None else (pred & w)
        if where_document is not None:
            wd = compile_where_document(where_document, "document")
            pred = wd if pred is None else (pred & wd)
        victims = meta.filter(pred).select("vec_id").localCheckpoint(eager=True)
        if not victims.head(1):
            return cur
        rw_mb = _mbucket_specs(victims)
        rw_vb, rw_pairs = self._stale_partitions(cur, victims, info["dim"])

        def survivors(read, specs, keep):
            preds = []
            for spec in sorted(specs):
                kv = dict(p.split("=") for p in spec.split("/"))
                leg = None
                for c, v in kv.items():
                    e = F.col(c).cast("string") == v
                    leg = e if leg is None else (leg & e)
                preds.append(leg)
            return (
                read.filter(reduce(or_, preds))
                .join(victims, "vec_id", "left_anti")
                .select(*keep)
            )

        comps = [
            vn.Component(
                "bands",
                ("band", "band_key"),
                rw_pairs,
                (survivors(self._bands(cur), rw_pairs, ["band", "band_key", "vec_id"]),)
                if rw_pairs
                else (),
            ),
            vn.Component(
                "vecs",
                ("vbucket",),
                rw_vb,
                (survivors(self._vecs(cur), rw_vb, ["vbucket", "vec_id", "emb"]),)
                if rw_vb
                else (),
            ),
            vn.Component(
                "meta",
                ("mbucket",),
                rw_mb,
                (
                    survivors(
                        self._meta(cur, info),
                        rw_mb,
                        ["mbucket", "vec_id", "id", "document"]
                        + self._meta_cols(info),
                    ),
                )
                if rw_mb
                else (),
            ),
        ]
        return vn.commit_version(
            self.spark,
            self.root,
            comps,
            expected=os.path.basename(cur),
            compact=_COMPONENTS,
        )

    @staticmethod
    def _meta_cols(info: dict) -> list[str]:
        names = [p.strip().split()[0] for p in info["meta_schema"].split(",")]
        return [
            n for n in names if n not in ("vec_id", "id", "document", "mbucket")
        ]

    def merge_from(self, other: "Collection", on_conflict: str = "error") -> str:
        """Merge another collection's contents into this one — the
        distributed-build pattern: shard the corpus, build per-shard
        collections IN PARALLEL (each an independent root with its own
        writer lock), then fold them together. Because every partition
        value is content-derived by SHARED kernels (band keys from the
        md5-seeded planes, vbucket/mbucket from md5 of the sid), the
        source's component rows are valid in the destination AS-IS:
        a disjoint merge is pure file appends into hardlinked
        partitions — ZERO re-banding, ZERO re-hashing, zero reads of
        destination data.

        ``on_conflict`` for ids present in both (detected by one
        thin-projection join — a merge is corpus-scale by nature):
        'error' (default), 'keep_self' (destination wins; the add
        analog), 'replace' (source wins; the upsert analog — victim
        partitions rewrite exactly as in ``upsert``). Cross-collection
        surrogate collisions (same sid, different id) always raise.

        DISJOINT merges (and merges into an empty root) take the
        METADATA-ONLY fast path: the source's parquet files HARDLINK
        into the new version's partition dirs (Component.
        merge_from_paths) — O(number of files) directory ops, zero row
        data read or written; only conflicted merges fall back to
        rewriting the affected partitions."""
        self._assert_writable()
        if on_conflict not in ("error", "keep_self", "replace"):
            raise ValueError(f"on_conflict: unknown mode {on_conflict!r}")
        ocur, oinfo = other._require()
        if oinfo.get("space", "cosine") != self.space:
            raise ValueError(
                f"merge_from: source space {oinfo.get('space', 'cosine')!r} "
                f"!= destination space {self.space!r}"
            )
        src_meta = other._meta(ocur, oinfo)
        src_vecs = other._vecs(ocur)
        src_bands = other._bands(ocur)
        meta_cols = self._meta_cols(oinfo)

        def _link_comps():
            return [
                vn.Component(
                    "bands", ("band", "band_key"),
                    merge_from_paths=(os.path.join(ocur, "bands"),),
                ),
                vn.Component(
                    "vecs", ("vbucket",),
                    merge_from_paths=(os.path.join(ocur, "vecs"),),
                ),
                vn.Component(
                    "meta", ("mbucket",),
                    merge_from_paths=(os.path.join(ocur, "meta"),),
                ),
            ]

        cur = self._cur()
        info = self._info(cur)
        if cur is None:
            info = self._save_sidecar(dict(oinfo))
            return vn.commit_version(
                self.spark, self.root, _link_comps(), expected=None,
                extra_files={"collection.json": json.dumps(info)},
            )

        if info != oinfo:
            raise ValueError(
                f"merge_from: config mismatch {info} != {oinfo} "
                f"(same dim and metadata schema required)"
            )
        clash = (
            src_meta.select("vec_id", F.col("id").alias("src_id"))
            .join(self._meta(cur, info).select("vec_id", "id"), "vec_id")
            .localCheckpoint(eager=True)
        )
        coll = clash.filter(F.col("id") != F.col("src_id")).head(1)
        if coll:
            r = coll[0]
            raise SurrogateCollisionError(
                f"ids {r['id']!r} and {r['src_id']!r} share surrogate "
                f"{r['vec_id']}"
            )
        overlap = clash.select("vec_id").localCheckpoint(eager=True)
        has_overlap = bool(overlap.head(1))
        if has_overlap and on_conflict == "error":
            some = [r["vec_id"] for r in overlap.head(3)]
            raise DuplicateIDError(
                f"merge_from: ids present in both collections "
                f"(surrogates {some}) — pass on_conflict="
                f"'keep_self' or 'replace'"
            )
        if not has_overlap:
            # disjoint: the metadata-only fast path (zero row IO)
            return vn.commit_version(
                self.spark,
                self.root,
                _link_comps(),
                expected=os.path.basename(cur),
                compact=_COMPONENTS,
            )

        if has_overlap and on_conflict == "keep_self":
            src_bands = src_bands.join(overlap, "vec_id", "left_anti")
            src_vecs = src_vecs.join(overlap, "vec_id", "left_anti")
            src_meta = src_meta.join(overlap, "vec_id", "left_anti")

        rw_vb, rw_pairs, rw_mb = frozenset(), frozenset(), frozenset()
        if has_overlap and on_conflict == "replace":
            rw_mb = _mbucket_specs(overlap)
            rw_vb, rw_pairs = self._stale_partitions(cur, overlap, info["dim"])

        def survivors(read, specs, keep):
            preds = []
            for spec in sorted(specs):
                kv = dict(p.split("=") for p in spec.split("/"))
                leg = None
                for c, v in kv.items():
                    e = F.col(c).cast("string") == v
                    leg = e if leg is None else (leg & e)
                preds.append(leg)
            return (
                read.filter(reduce(or_, preds))
                .join(overlap, "vec_id", "left_anti")
                .select(*keep)
            )

        band_writes = (
            [survivors(self._bands(cur), rw_pairs, ["band", "band_key", "vec_id"])]
            if rw_pairs
            else []
        ) + [src_bands.select("band", "band_key", "vec_id")]
        vec_writes = (
            [survivors(self._vecs(cur), rw_vb, ["vbucket", "vec_id", "emb"])]
            if rw_vb
            else []
        ) + [src_vecs.select("vbucket", "vec_id", "emb")]
        meta_keep = ["mbucket", "vec_id", "id", "document", *meta_cols]
        meta_writes = (
            [survivors(self._meta(cur, info), rw_mb, meta_keep)] if rw_mb else []
        ) + [src_meta.select(*meta_keep)]
        comps = [
            vn.Component("bands", ("band", "band_key"), rw_pairs, tuple(band_writes)),
            vn.Component("vecs", ("vbucket",), rw_vb, tuple(vec_writes)),
            vn.Component("meta", ("mbucket",), rw_mb, tuple(meta_writes)),
        ]
        return vn.commit_version(
            self.spark,
            self.root,
            comps,
            expected=os.path.basename(cur),
            compact=_COMPONENTS,
        )

    def fsck(self) -> list:
        """Integrity check: the generic versioned-root invariants
        (pointer, orphans, locks, component readability —
        versioning.fsck_index) plus the facade's semantic invariants:
        vecs↔meta surrogate sets agree, every band row's vector exists,
        nonzero vectors band exactly RP_BANDS times, no surrogate maps
        to two ids. Returns (check, ok, detail) tuples, never raises."""
        cur = self._cur()
        info = self._info(cur)
        comps = [
            ("bands", ["band", "band_key"], BANDS_SCHEMA),
            ("vecs", ["vbucket"], VECS_SCHEMA),
        ] + ([("meta", ["mbucket"], info["meta_schema"])] if info else [])
        out = vn.fsck_index(self.spark, self.root, comps)
        if cur is None or info is None:
            return out
        meta = self._meta(cur, info)
        vecs = self._vecs(cur)
        bands = self._bands(cur)
        a = vecs.join(meta, "vec_id", "left_anti").count()
        b = meta.join(vecs, "vec_id", "left_anti").count()
        out.append(
            ("vecs_meta_same_ids", a == 0 and b == 0, f"vecs_only={a} meta_only={b}")
        )
        c = bands.join(vecs, "vec_id", "left_anti").count()
        out.append(("bands_subset_of_vecs", c == 0, f"dangling={c}"))
        nz = vecs.filter(_nonzero_pred()).count()
        nb = bands.count()
        out.append(
            (
                "nonzero_band_fanout",
                nb == nz * RP_BANDS,
                f"bands={nb} expect={nz}*{RP_BANDS}",
            )
        )
        dup = (
            meta.groupBy("vec_id")
            .agg(F.countDistinct("id").alias("n"))
            .filter(F.col("n") > 1)
            .count()
        )
        out.append(("surrogates_unique", dup == 0, f"collisions={dup}"))
        return out

    def versions(self) -> "list[dict]":
        """Time-travel catalog (versioning.list_versions)."""
        return vn.list_versions(self.root)

    def describe(self) -> dict:
        """Operational metadata (versioning.describe_index) plus the
        collection config — the ops dashboard row."""
        d = vn.describe_index(self.root)
        d["config"] = self._load_sidecar()
        return d

    def compact(self, threshold: int = 1) -> "str | None":
        """Fold accumulated append files (mutations auto-compact past
        the kernel threshold; this is the explicit maintenance call for
        a tighter bound before a read-heavy phase)."""
        self._assert_writable()
        return vn.compact_index(self.spark, self.root, _COMPONENTS, threshold)

    def rollback(self, to: "str | None" = None) -> str:
        """Undo the last mutation (or roll back to a named on-disk
        version): one pointer swing under the writer lock — the next
        read serves the restored state, the abandoned version becomes
        an orphan the next commit sweeps (versioning.rollback_index)."""
        self._assert_writable()
        return vn.rollback_index(self.root, to)

    # ------------------------------------------------------------ reads

    def modify(self, name: "str | None" = None, metadata: "dict | None" = None) -> None:
        """ChromaDB ``collection.modify(name=..., metadata=...)``:
        rename the collection and/or replace its COLLECTION-LEVEL user
        metadata (a small descriptive dict — distinct from per-row
        metadata). The user dict lives in its own sidecar file so the
        config sidecar's racing-creator equality check is untouched;
        rename is one atomic ``os.rename`` of the root directory (same
        filesystem by construction — the new name is a sibling)."""
        self._assert_writable()
        if metadata is not None:
            if not isinstance(metadata, dict):
                raise ValueError("metadata: expected a dict")
            tmp = os.path.join(self.root, ".user_meta.tmp")
            with open(tmp, "w") as f:
                json.dump(metadata, f)
            os.replace(tmp, os.path.join(self.root, "user_meta.json"))
        if name is not None:
            if not name or "/" in name or name.startswith("."):
                raise ValueError(f"invalid collection name {name!r}")
            new_root = os.path.join(os.path.dirname(self.root), name)
            if os.path.exists(new_root):
                raise ValueError(f"collection {name!r} already exists")
            os.rename(self.root, new_root)
            self.root = new_root

    @property
    def metadata(self) -> dict:
        """Collection-level user metadata set via ``modify`` ({} if unset)."""
        p = os.path.join(self.root, "user_meta.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    @property
    def name(self) -> str:
        return os.path.basename(self.root)

    def add_metadata_column(
        self, name: str, sql_type: str, default=None
    ) -> str:
        """Schema evolution for the typed metadata store (r11): ChromaDB
        metadata is schemaless per row, so a migrant WILL eventually add
        a field — under schema-on-first-write that needs an explicit
        ALTER. Adds ``name sql_type`` to the metadata schema, filled
        with ``default`` (NULL when omitted) on every existing row.

        Cost shape: rewrites the META component only — the narrow
        sidecar table, never the vector store or band table (those
        components hardlink through unchanged); one atomic commit.
        The new schema commits ATOMICALLY with the data — persisted
        inside the version dir (ADVICE r11: the old post-commit root
        sidecar swap left a window where a concurrent upsert normalized
        against the OLD schema and rewrote victim partitions without
        the new column; writers now validate against the version-scoped
        schema and CAS on the version, so that upsert loses loudly and
        re-derives). The root sidecar refreshes after as a convenience
        cache; a crash between the two is harmless — the version copy
        is authoritative. Subsequent batches must carry the new column
        (the schema-on-write contract, now including it)."""
        self._assert_writable()
        cur, info = self._require()
        atomic = ("string", "bigint", "int", "smallint", "tinyint",
                  "double", "float", "boolean", "date", "timestamp")
        if sql_type not in atomic:
            raise ValueError(f"unsupported metadata type {sql_type!r}")
        taken = set(self._meta_cols(info)) | set(_RESERVED)
        if name in taken:
            raise ValueError(f"column {name!r} already exists or is reserved")
        old_schema = info["meta_schema"]
        assert old_schema.endswith(", mbucket int")
        new_schema = old_schema.replace(
            ", mbucket int", f", {name} {sql_type}, mbucket int"
        )
        meta = self._meta(cur, info)
        widened = meta.select(
            *[c for c in meta.columns if c != "mbucket"],
            F.lit(default).cast(sql_type).alias(name),
            "mbucket",
        )
        all_mb = frozenset(f"mbucket={i}" for i in range(N_META_BUCKETS))
        new_info = dict(info)
        new_info["meta_schema"] = new_schema
        new = vn.commit_version(
            self.spark,
            self.root,
            [
                vn.Component("meta", ("mbucket",), all_mb, (widened,)),
                vn.Component("bands", link_from=os.path.join(cur, "bands")),
                vn.Component("vecs", link_from=os.path.join(cur, "vecs")),
            ],
            expected=os.path.basename(cur),
            compact=_COMPONENTS,
            extra_files={"collection.json": json.dumps(new_info)},
        )
        tmp = self._sidecar_path() + ".__tmp__"
        with open(tmp, "w") as f:
            json.dump(new_info, f)
        os.replace(tmp, self._sidecar_path())
        return new

    def fork(self, dst_root: str) -> "Collection":
        """Copy-on-write clone (ChromaDB ``collection.fork``): hardlink
        the current version into a fresh independent root — O(files)
        directory ops, zero row data copied; both sides then mutate
        freely (every write creates new files in new version dirs, so
        shared inodes never diverge in place). Config + user-metadata
        sidecars are copied (not linked — they are replaced in place by
        ``modify``).

        Forking an ``at()``-pinned snapshot view clones THE PINNED
        version (ADVICE r11 — the old path silently cloned the latest,
        contradicting the snapshot abstraction), and the fork's root
        sidecar comes from the pinned version's own config (schema as
        of that version, not today's)."""
        import shutil as _sh

        pin = getattr(self, "_pin", None)
        vn.fork_index(self.root, dst_root, version=pin)
        vinfo = self._version_info(self._cur())
        if vinfo is not None:
            tmp = os.path.join(dst_root, "collection.json.__tmp__")
            with open(tmp, "w") as f:
                json.dump(vinfo, f)
            os.replace(tmp, os.path.join(dst_root, "collection.json"))
        elif os.path.exists(self._sidecar_path()):
            _sh.copyfile(
                self._sidecar_path(), os.path.join(dst_root, "collection.json")
            )
        p = os.path.join(self.root, "user_meta.json")
        if os.path.exists(p):
            _sh.copyfile(p, os.path.join(dst_root, "user_meta.json"))
        return Collection(self.spark, dst_root, space=self.space)

    def count(self) -> int:
        cur = self._cur()
        info = self._info(cur)
        if cur is None or info is None:
            return 0
        return self._meta(cur, info).count()

    def peek(self, n: int = 10) -> DataFrame:
        cur, info = self._require()
        return self._meta(cur, info).drop("mbucket", "vec_id").orderBy("id").limit(n)

    def get(
        self,
        ids: "list[str] | None" = None,
        where: "dict | None" = None,
        where_document: "dict | None" = None,
        limit: "int | None" = None,
        offset: "int | None" = None,
        after_id: "str | None" = None,
        include_embeddings: bool = False,
        include: "list[str] | None" = None,
    ) -> DataFrame:
        """ChromaDB ``get``: literal ids prune to their mbucket
        directories; DSL filters compile to pushed-down predicates.
        Deterministic: ordered by id.

        Pagination: ``offset`` is ChromaDB's positional contract (skip N
        rows of the id-ordered result — fine for dashboards, but a deep
        offset still sorts+discards N rows per page). ``after_id`` is the
        keyset path (``id > after_id`` is a pushed-down predicate, so page
        depth costs nothing at scale — same discipline as the BM25
        search_after key); pass one or the other, not both.

        ``include`` is ChromaDB's projection switch, any subset of
        {'documents', 'metadatas', 'embeddings'} (default: documents +
        metadatas, embeddings opt-in — the fat column never rides along
        unasked, the docvalues split). ``include_embeddings=True`` is the
        pre-r11 spelling of ``include=[..., 'embeddings']``; an
        ids-bounded get joins a vbucket-pruned vecs slice."""
        cur, info = self._require()
        if offset is not None and after_id is not None:
            raise ValueError("pass offset OR after_id, not both")
        inc = {"documents", "metadatas"} if include is None else set(include)
        unknown = inc - {"documents", "metadatas", "embeddings"}
        if unknown:
            raise ValueError(f"include: unknown items {sorted(unknown)}")
        if include_embeddings:
            inc.add("embeddings")
        d = self._meta(cur, info)
        if ids is not None:
            sids = sorted({_sid_py(i) for i in ids})
            mb = sorted({_mbucket_py(s) for s in sids})
            d = d.filter(F.col("mbucket").isin(mb) & F.col("vec_id").isin(sids))
        if where is not None:
            d = d.filter(compile_where(where))
        if where_document is not None:
            d = d.filter(compile_where_document(where_document, "document"))
        if after_id is not None:
            d = d.filter(F.col("id") > after_id)
        if "embeddings" in inc:
            from ..operators.ann import vec_bucket_py

            v = self._vecs(cur)
            if ids is not None:
                v = v.filter(
                    F.col("vbucket").isin(sorted({vec_bucket_py(s) for s in sids}))
                )
            d = d.join(
                v.select("vec_id", F.col("emb").alias("embedding")),
                "vec_id",
                "left",
            )
        drop = ["mbucket", "vec_id"]
        if "documents" not in inc:
            drop.append("document")
        if "metadatas" not in inc:
            drop.extend(self._meta_cols(info))
        d = d.drop(*drop).orderBy("id")
        if offset:
            d = d.offset(offset)
        return d.limit(limit) if limit is not None else d

    def query(
        self,
        query_embeddings=None,
        n_results: int = 10,
        where: "dict | None" = None,
        where_document: "dict | None" = None,
        multiprobe_hamming: int = 1,
        query_texts=None,
        include: "list[str] | None" = None,
        filter_strategy: str = "probe",
        prefilter_threshold: int = 10_000,
        graph_beam: "int | None" = None,
        graph_rounds: "int | None" = None,
        graph_predicate_expansion: "bool | None" = None,
    ) -> DataFrame:
        """ChromaDB ``query``: RP-LSH probe (client-side band keys →
        literal partition predicates), vecs-store cosine rerank, DSL
        post-filter on the meta sidecar, top n_results per query.

        ``include`` (r11, the ChromaDB projection switch): any subset of
        {'documents', 'metadatas', 'embeddings', 'distances'} — default
        documents + metadatas + distances (the Chroma default);
        embeddings opt-in, joined from the vecs store only when asked
        (the get() docvalues discipline). ``id`` and ``query_idx``
        always ride along (they key the result).

        ``filter_strategy`` (r11, the adaptive pre-filter plan every
        production vector DB ships): 'probe' (default) = LSH candidates
        then post-filter — the documented, oracle-pinned shape; right
        when filters keep most of the corpus (multiprobe holds
        recall@10 >= 0.98 down to 10% selectivity, BASELINE.md r11).
        'exact' = skip the probe and rerank EXACTLY over the filter's
        survivors — right when the filter is ultra-selective (at 0.1%
        selectivity the survivors of ANY probe thin below k by
        construction; exact-over-survivors is both cheaper and
        recall-1.0 because the survivor set is smaller than a probe's
        candidate set). 'auto' = one cheap COUNT on the narrow meta
        sidecar picks: exact iff survivors <= ``prefilter_threshold``
        (at 100 TB that is a metadata-column count against pushed-down
        predicates, never a vector read). 'auto' is OPT-IN rather than
        the default so the default plan stays deterministic and
        probe-pinned — a plan that silently depends on a cardinality
        count is the wrong default for a reproducibility-first engine.

        ``query_texts`` is the reference's primary entry
        (``semantic_search(query: str)``, vector_search_tool.py:33-46):
        the text embeds DRIVER-side through the engine's embedder
        singleton (operators/embed.py — env-gated SentenceTransformer,
        deterministic hash-projection fallback), one row, no job — the
        reference does exactly this before its collection.query. The
        embedder's dim must match the collection's (a collection built
        with a different encoder fails loudly, never serves garbage).

        ``graph_predicate_expansion`` (tri-state, r15): ``True`` forces
        the ACORN predicate-aware walk, ``False`` forces the blind
        walk + emission filter, ``None`` (default) AUTO-selects — a
        filtered graph query estimates selectivity from two narrow
        meta-sidecar counts and takes the ACORN beam below
        ``GRAPH_AUTO_EXPANSION_SELECTIVITY`` (the silent thin-pool
        case a Chroma-parity ``query(where=...)`` caller used to hit).

        Returns (query_idx, id, distance, document, <metadata>), with
        ``distance = 1 - round(cos, 4)`` (cosine space). Post-filtering
        is the right order for LSH (buckets are metadata-blind); the
        multiprobe default widens candidates because filters thin them.
        """
        import numpy as np

        cur, info = self._require()
        dim = info["dim"]
        inc = (
            {"documents", "metadatas", "distances"}
            if include is None
            else set(include)
        )
        unknown = inc - {"documents", "metadatas", "embeddings", "distances"}
        if unknown:
            raise ValueError(f"include: unknown items {sorted(unknown)}")
        if (query_embeddings is None) == (query_texts is None):
            raise ValueError(
                "pass exactly one of query_embeddings / query_texts"
            )
        if query_texts is not None:
            from ..operators.embed import resolve_model

            # the COLLECTION's embedder (sidecar spec — r12), falling
            # back to the env-gated global singleton when unset
            model = resolve_model(info.get("embedder"))
            texts = (
                [query_texts] if isinstance(query_texts, str) else list(query_texts)
            )
            query_embeddings = model.encode(texts)
            if len(query_embeddings[0]) != dim:
                raise ValueError(
                    f"embedder dim {len(query_embeddings[0])} != "
                    f"collection dim {dim} — this collection was not "
                    f"built with the active embedder"
                )
        qs = query_embeddings
        if hasattr(qs, "tolist"):
            qs = qs.tolist()  # accept numpy input without ambiguous-truth traps
        if qs and isinstance(qs[0], (int, float)):
            qs = [qs]
        mat = np.asarray(qs, dtype=np.float64)
        if mat.ndim != 2 or mat.shape[1] != dim:
            raise ValueError(f"query_embeddings must be n x {dim}")
        if filter_strategy not in ("auto", "probe", "exact", "graph"):
            raise ValueError(
                "filter_strategy: 'auto'|'probe'|'exact'|'graph', "
                f"got {filter_strategy!r}"
            )
        meta = self._meta(cur, info)
        if where is not None:
            meta = meta.filter(compile_where(where))
        if where_document is not None:
            meta = meta.filter(compile_where_document(where_document, "document"))
        has_filter = where is not None or where_document is not None
        strategy = filter_strategy
        if strategy == "auto":
            strategy = (
                "exact"
                if has_filter and meta.count() <= prefilter_threshold
                else "probe"
            )
        elif strategy == "exact" and not has_filter:
            raise ValueError(
                "filter_strategy='exact' needs a where/where_document filter"
            )

        if strategy == "exact":
            # ultra-selective filter: the survivor set is SMALLER than
            # any probe's candidate set — score all of it exactly
            qidx = self.spark.createDataFrame(
                [(i,) for i in range(mat.shape[0])], "query_idx int"
            )
            cand = meta.select("vec_id").crossJoin(F.broadcast(qidx))
        elif strategy == "graph":
            # the reference's ACTUAL serving structure: beam search over
            # the navigable-graph sidecar built from this version's
            # vectors. Candidates are each query's visited pool (the
            # hnswlib candidate set); the meta filter applies at
            # emission on the pool, never during traversal (the filter-
            # functor discipline — restricting the walk would
            # disconnect the graph). Distances recompute below in the
            # same 4-dp Catalyst expression every strategy uses.
            if self.space != "cosine":
                # the graph's edges and beam scoring are cosine-built;
                # routing an l2/ip ranking through a cosine graph is the
                # r10 metric-mismatch trap (recall must be measured in
                # the index's own metric) — refuse loudly, like the
                # space sidecar guard, instead of serving blurred recall
                raise ValueError(
                    "filter_strategy='graph' serves cosine collections "
                    f"only (this collection's space is {self.space!r}); "
                    "use the probe strategies for l2/ip"
                )
            # graph_beam/graph_rounds are the search-budget knob
            # (hnswlib's ef): noisy corpora and selective filters thin
            # the visited pool, and the remedy is a wider walk — the
            # measured curve lives in tools/collection_recall_sweep.py
            # + BASELINE.md. None = the module defaults (r14: blind
            # walks at GRAPH_BEAM with the multi-cell seed doors; the
            # ACORN opt-in keeps its measured raise-ef-for-filters
            # GRAPH_ACORN_BEAM budget)
            from ..operators.graph_ann import (
                GRAPH_ACORN_BEAM,
                GRAPH_BEAM,
                GRAPH_ROUNDS,
            )

            if graph_predicate_expansion is None:
                # r15 AUTO (VERDICT r14 next #3): a selective filter
                # thins the blind walk's emission pool silently — the
                # exact case a Chroma-parity caller hits with
                # query(where=...). Estimate selectivity with two
                # counts on the NARROW meta sidecar (the filtered one
                # runs against pushed-down predicates; the total is
                # memoized per immutable version dir — at 100 TB both
                # are metadata-column counts, never a vector read) and
                # switch to the ACORN beam below the measured
                # crossover. Explicit True/False still forces a path —
                # the oracle-pinned driver keys pass one, so their
                # executed plan never depends on a cardinality count.
                if has_filter:
                    from ..memo import version_memo

                    n_total = version_memo(
                        self.spark,
                        cur,
                        "coll_meta_total_rows",
                        lambda: self._meta(cur, info).count(),
                    )
                    # inclusive: at exactly half selectivity the r14
                    # table still reads ACORN 0.88 vs blind 0.69
                    graph_predicate_expansion = (
                        meta.count()
                        <= GRAPH_AUTO_EXPANSION_SELECTIVITY * max(1, n_total)
                    )
                else:
                    graph_predicate_expansion = False
            if graph_beam is None:
                graph_beam = (
                    GRAPH_ACORN_BEAM
                    if (graph_predicate_expansion and has_filter)
                    else GRAPH_BEAM
                )
            if graph_rounds is None:
                graph_rounds = GRAPH_ROUNDS
            gver = self._graph_sidecar(cur)
            # replaced vectors live in the graph under private rids —
            # translate pool ids back to sids at emission (and dedup: a
            # tombstoned sid surviving as a routing bridge and its rid
            # twin both name the same document)
            amap = self._graph_alias_map()
            qlist = [
                [float(x) for x in mat[qi]] for qi in range(mat.shape[0])
            ]
            if graph_predicate_expansion and has_filter:
                # opt-in ACORN traversal: the compiled where predicate
                # steers the frontier and failing neighbors expand an
                # extra hop (see _graph_beam_batch_acorn); pass lookups
                # are mbucket-pruned point reads of the FILTERED meta
                # (by the pool ids' SID translation when rids exist)
                fmeta = meta

                def pass_of(ids) -> set:
                    ids = sorted(ids)
                    if not ids:
                        return set()
                    tr = {g: int(amap.get(g, g)) for g in ids}
                    mb = sorted({_mbucket_py(s) for s in tr.values()})
                    sids = sorted(set(tr.values()))
                    passing_sids = {
                        r["vec_id"]
                        for r in fmeta.filter(
                            F.col("mbucket").isin(mb)
                            & F.col("vec_id").isin(sids)
                        )
                        .select("vec_id")
                        .collect()
                    }
                    return {g for g, s in tr.items() if s in passing_sids}

                pools, passing = self._graph_beam_batch_acorn(
                    gver,
                    qlist,
                    beam=graph_beam,
                    rounds=graph_rounds,
                    pass_of=pass_of,
                )
                rows = sorted(
                    {
                        (qi, int(amap.get(gid, gid)))
                        for qi, visited in enumerate(pools)
                        for gid in visited
                        if gid in passing
                    }
                )
            else:
                pools = self._graph_beam_batch(
                    gver, qlist, beam=graph_beam, rounds=graph_rounds
                )
                rows = sorted(
                    {
                        (qi, int(amap.get(gid, gid)))
                        for qi, visited in enumerate(pools)
                        for gid in visited
                    }
                )
            cand = self.spark.createDataFrame(
                rows, "query_idx int, vec_id bigint"
            )
        else:
            signs_t = np.array(
                _rp_plane_signs(RP_PLANES, dim), dtype=np.int64
            ).T
            keys = _rp_band_keys(mat, signs_t)  # n x bands

            probe_rows, pairs = [], set()
            for qi in range(mat.shape[0]):
                for b in range(RP_BANDS):
                    ks = {int(keys[qi][b])}
                    if multiprobe_hamming >= 1:
                        ks |= {
                            int(keys[qi][b]) ^ (1 << bit)
                            for bit in range(RP_BAND_BITS)
                        }
                    for key in sorted(ks):
                        probe_rows.append((qi, b, key))
                        pairs.add((b, key))

            probe = self.spark.createDataFrame(
                probe_rows, "query_idx int, band int, band_key int"
            )
            probe_pred = reduce(
                or_,
                [
                    (F.col("band") == b) & (F.col("band_key") == k)
                    for b, k in sorted(pairs)
                ],
            )
            cand = (
                self._bands(cur)
                .filter(probe_pred)
                .join(F.broadcast(probe), ["band", "band_key"])
                .select("query_idx", "vec_id")
                .distinct()
            )
        qlits = F.array(
            *[
                F.expr("array(" + ",".join(_double_sql(x) for x in row) + ")")
                for row in mat
            ]
        )
        e, qe = F.col("emb"), F.col("q_emb")
        if self.space == "l2":
            dist = F.round(l2_distance(e, qe), 4)
        elif self.space == "ip":
            # Chroma's ip distance VALUE contract: 1 - <a,b> (ADVICE r11 —
            # callers threshold and display distances, not just rank them)
            dist = F.lit(1.0) - F.round(dot_product(e, qe), 4)
        else:
            dist = F.lit(1.0) - F.round(cosine_similarity(e, qe), 4)
        scored = (
            self._vecs(cur)
            .join(cand, "vec_id")
            .withColumn("q_emb", F.element_at(qlits, F.col("query_idx") + 1))
            .select("query_idx", "vec_id", dist.alias("distance"))
        )
        joined = scored.join(meta.drop("mbucket"), "vec_id")
        if "embeddings" in inc:
            joined = joined.join(
                self._vecs(cur).select("vec_id", F.col("emb").alias("embedding")),
                "vec_id",
            )
        drop = ["vec_id"]
        if "documents" not in inc:
            drop.append("document")
        if "metadatas" not in inc:
            drop.extend(self._meta_cols(info))
        if mat.shape[0] == 1:
            # single query: a global top-k collapses to
            # TakeOrderedAndProject — no rank-window shuffle
            out = (
                joined.orderBy(F.asc("distance"), F.asc("id"))
                .limit(n_results)
                .drop(*drop)
            )
            return out.drop("distance") if "distances" not in inc else out
        from pyspark.sql.window import Window

        w = Window.partitionBy("query_idx").orderBy(
            F.asc("distance"), F.asc("id")
        )
        out = (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_results)
            .drop("rank", *drop)
            .orderBy("query_idx", "distance", "id")
        )
        return out.drop("distance") if "distances" not in inc else out


def _stored_space(root: str, default: str = "cosine") -> str:
    """The space persisted in a collection's sidecar, or ``default`` for
    a collection that has never been written (no sidecar yet)."""
    p = os.path.join(root, "collection.json")
    if not os.path.exists(p):
        return default
    with open(p) as f:
        return json.load(f).get("space", "cosine")


class Client:
    """``chromadb.PersistentClient`` analog — the last piece of the
    reference's storage bootstrap (indexing_agent.py:55-70 creates or
    opens 'code_elements' and 'file_summaries' by name;
    vector_search_tool.py:22-27 reopens them): NAMED collections under
    one base directory, each an independent versioned root with its own
    writer lock (so two collections ingest concurrently without
    contention — the reference's two-collection layout maps 1:1)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _root(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid collection name {name!r}")
        return os.path.join(self.path, name)

    def create_collection(
        self,
        name: str,
        space: str = "cosine",
        embedder: "dict | None" = None,
    ) -> Collection:
        """Create a NEW named collection — raises if it exists (the
        ChromaDB contract; the mkdir is the atomic claim, so racing
        creators get exactly one winner). ``space`` is ChromaDB's
        ``hnsw:space`` metadata and is persisted in the collection
        sidecar on first write (VERDICT r10 next #3: an l2/ip collection
        is fully reachable through the Client facade). ``embedder``
        (r12) is the per-collection embedding-function spec, likewise
        sidecar-persisted."""
        root = self._root(name)
        try:
            os.makedirs(root)
        except FileExistsError:
            raise ValueError(f"collection {name!r} already exists") from None
        return Collection(self.spark, root, space=space, embedder=embedder)

    def get_collection(self, name: str) -> Collection:
        """Reopen by name. The metric is READ FROM THE SIDECAR — never
        guessed — so an l2/ip collection round-trips through the Client
        without the caller restating it (the sidecar guard still rejects
        a direct Collection(root, space=wrong) open)."""
        root = self._root(name)
        if not os.path.isdir(root):
            raise ValueError(f"collection {name!r} does not exist")
        return Collection(self.spark, root, space=_stored_space(root))

    def get_or_create_collection(
        self,
        name: str,
        space: str = "cosine",
        embedder: "dict | None" = None,
    ) -> Collection:
        """The reference's actual bootstrap idiom (indexing_agent.py:
        58-70 is a get/except/create) as the one-call ChromaDB API.
        An existing collection's persisted space wins over the argument
        (get semantics); a fresh one is created with ``space``/
        ``embedder``. An existing collection whose persisted embedder
        CONFLICTS with the argument raises (the sidecar guard)."""
        root = self._root(name)
        os.makedirs(root, exist_ok=True)
        return Collection(
            self.spark,
            root,
            space=_stored_space(root, default=space),
            embedder=embedder,
        )

    def list_collections(self) -> "list[str]":
        return sorted(
            d
            for d in os.listdir(self.path)
            if os.path.isdir(os.path.join(self.path, d)) and not d.startswith(".")
        )

    def count_collections(self) -> int:
        return len(self.list_collections())

    def heartbeat(self) -> int:
        """ChromaDB liveness probe: current time in nanoseconds."""
        import time

        return time.time_ns()

    def reset(self) -> bool:
        """ChromaDB ``reset``: delete EVERY collection under this client
        (the destructive test-teardown verb — deliberately not wired to
        any query path)."""
        for name in self.list_collections():
            self.delete_collection(name)
        return True

    def fork_collection(self, name: str, new_name: str) -> Collection:
        """ChromaDB ``fork``: clone an existing named collection into a
        new name under this client (hardlink copy-on-write — see
        ``Collection.fork``)."""
        src = self.get_collection(name)
        return src.fork(self._root(new_name))

    def modify_collection(
        self,
        name: str,
        new_name: "str | None" = None,
        metadata: "dict | None" = None,
    ) -> Collection:
        """Client-side spelling of ``Collection.modify`` (rename and/or
        collection-level metadata); returns the (re-opened) collection."""
        coll = self.get_collection(name)
        coll.modify(name=new_name, metadata=metadata)
        return coll

    def delete_collection(self, name: str) -> None:
        import shutil

        root = self._root(name)
        if not os.path.isdir(root):
            raise ValueError(f"collection {name!r} does not exist")
        shutil.rmtree(root)


# --------------------------------------------------------------- serving
# Driver-checked keys: a build-once/serve-many demo collection over the
# sf_dir corpus (documents INNER JOIN embeddings on doc_id = vec_id —
# the collection holds exactly the embedded documents), memoized like
# every other index root.


def demo_collection(spark: SparkSession, sf_dir: str) -> Collection:
    from ..memo import index_root
    from ..sources.tables import load_table

    root = index_root(
        "collection_v1", sf_dir, RP_PLANES, RP_BANDS, N_META_BUCKETS
    )
    coll = Collection(spark, root)
    if coll._cur() is None:
        d = load_table(spark, sf_dir, "documents")
        e = load_table(spark, sf_dir, "embeddings")
        batch = e.join(d, e["vec_id"] == d["doc_id"]).select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("text").alias("document"),
            "lang",
            "source",
            "n_chars",
        )
        coll.add(batch)
    return coll


def demo_collection_ip(spark: SparkSession, sf_dir: str) -> Collection:
    """Inner-product-space twin of ``demo_collection`` (own memoized
    root — the space is fixed at creation and persisted)."""
    from ..memo import index_root
    from ..sources.tables import load_table

    root = index_root(
        "collection_ip_v1", sf_dir, RP_PLANES, RP_BANDS, N_META_BUCKETS
    )
    coll = Collection(spark, root, space="ip")
    if coll._cur() is None:
        d = load_table(spark, sf_dir, "documents")
        e = load_table(spark, sf_dir, "embeddings")
        batch = e.join(d, e["vec_id"] == d["doc_id"]).select(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
            F.col("text").alias("document"),
            "lang",
            "source",
            "n_chars",
        )
        coll.add(batch)
    return coll


def collection_query_ip_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """The facade's inner-product space end-to-end (r11): same probe and
    post-filter as collection_query_topk, but the collection was CREATED
    with space='ip' and distances follow ChromaDB's value contract
    ``1 - <a,b>`` (the ADVICE r11 fix, oracle-locked here — rankings
    alone would not catch a constant shift)."""
    from ..sources.tables import load_table

    coll = demo_collection_ip(spark, sf_dir)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .head()
    )
    return coll.query(
        [float(x) for x in q["e"]],
        n_results=k,
        where=COLLECTION_WHERE_DEMO,
    ).select("id", "distance", "lang", "n_chars")


def collection_query_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """The reference's ``collection.query(query_embeddings, n_results,
    where={...})`` (vector_search_tool.py:33-46) end-to-end on the
    facade: client-side band keys -> pruned band probe -> vecs rerank ->
    DSL post-filter -> top-k. Includes the query's own document
    (ChromaDB does not exclude self-matches)."""
    from ..sources.tables import load_table

    coll = demo_collection(spark, sf_dir)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .head()
    )
    return coll.query(
        [float(x) for x in q["e"]],
        n_results=k,
        where=COLLECTION_WHERE_DEMO,
    ).select("id", "distance", "lang", "n_chars")


def collection_query_graph_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """``collection.query`` served by the navigable-graph sidecar —
    the reference's ACTUAL index structure (ChromaDB's backend is
    hnswlib; every other facade strategy approximates it with LSH):
    beam search over the graph built from the collection's own vectors,
    meta filter at emission (predicate-blind traversal), self-match
    included at distance 0. The oracle reconstructs the whole graph
    over the collection's md5-surrogate ids and replays the raw-vector
    beam (entry hub + query-cell hub seeds, no self-exclusion)."""
    from ..sources.tables import load_table

    coll = demo_collection(spark, sf_dir)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .head()
    )
    return coll.query(
        [float(x) for x in q["e"]],
        n_results=k,
        where=COLLECTION_WHERE_DEMO,
        filter_strategy="graph",
        # pinned blind: the oracle replays the predicate-blind beam, so
        # this key must not depend on the auto selectivity estimate
        # (the demo where keeps ~70% of the corpus — auto would resolve
        # to blind anyway, but a driver key's plan stays explicit)
        graph_predicate_expansion=False,
    ).select("id", "distance", "lang", "n_chars")


def collection_query_graph_acorn_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """``collection.query`` with the opt-in ACORN traversal (r13): a
    selective where (lang='fr', ~14% of the demo collection) steers the
    beam — passing nodes rank first in the frontier and failing hop-1
    neighbors expand one extra hop — at the module default budget
    (GRAPH_BEAM/GRAPH_ROUNDS, which dominates r13's measured
    raise-ef-for-filters graph_beam=16 setting). The oracle replays the
    pass-flagged fused beam over the surrogate keyspace."""
    from ..sources.tables import load_table

    coll = demo_collection(spark, sf_dir)
    q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == query_vec_id)
        .select(F.col("embedding").cast("array<double>").alias("e"))
        .head()
    )
    return coll.query(
        [float(x) for x in q["e"]],
        n_results=k,
        where={"lang": {"$eq": "fr"}},
        filter_strategy="graph",
        graph_predicate_expansion=True,
    ).select("id", "distance", "lang")


def collection_query_graph_batch_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_ids: tuple = (0, 9),
    k: int = 5,
) -> DataFrame:
    """Batched facade graph serving: M queries through ONE fused beam
    (`_graph_beam_batch` — one assignment job, one hub resolution, one
    edges read + one vecs fetch per round for the union of frontiers);
    per-query state untouched, so each query's rows equal its solo run
    (pinned) and the oracle replays M solo chains over the shared
    surrogate-keyspace graph."""
    from ..sources.tables import load_table

    coll = demo_collection(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    qs = [
        [
            float(x)
            for x in emb.filter(F.col("vec_id") == qid)
            .select(F.col("embedding").cast("array<double>").alias("e"))
            .head()["e"]
        ]
        for qid in query_vec_ids
    ]
    return coll.query(qs, n_results=k, filter_strategy="graph").select(
        "query_idx", "id", "distance"
    )


def collection_get_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``collection.get(where=..., where_document=...)`` on the facade
    (vector_search_tool.py:149-232's element/file lookups, full DSL)."""
    coll = demo_collection(spark, sf_dir)
    return coll.get(
        where=COLLECTION_GET_WHERE_DEMO,
        where_document=COLLECTION_GET_WDOC_DEMO,
        limit=20,
    ).select("id", "lang", "source", "n_chars")


def collection_get_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel READ through the facade (r13 — the MVCC story
    end-to-end as a driver key): a two-commit lifecycle on its OWN
    tagged root (even doc_ids commit as v_000000, odd ones as v_000001
    — mutating keys never share a root with other serving keys, the
    vacuum-key discipline), then ``snapshot('v_000000').get(...)``
    serves YESTERDAY'S corpus while ``_CURRENT`` points at today's:
    the rows are exactly the FIRST commit's filter survivors, proving
    committed version dirs are immutable snapshots. Replays detect the
    target state (both versions present) and serve directly."""
    from ..memo import index_root
    from ..sources.tables import load_table

    root = index_root(
        "collection_snap_v1", sf_dir, RP_PLANES, RP_BANDS, N_META_BUCKETS
    )
    coll = Collection(spark, root)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    base = e.join(d, e["vec_id"] == d["doc_id"]).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        F.col("text").alias("document"),
        "lang",
        "source",
        "n_chars",
        (F.col("doc_id") % 2).alias("par"),
    )
    if coll._cur() is None:
        coll.add(base.filter(F.col("par") == 0).drop("par"))
    if os.path.basename(coll._cur()) == "v_000000":
        coll.add(base.filter(F.col("par") == 1).drop("par"))
    snap = coll.at("v_000000")
    return snap.get(where={"lang": {"$in": ["en", "de"]}}, limit=20).select(
        "id", "lang", "n_chars"
    )


def collection_rollback_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side time travel (r13 — ``rollback``'s pointer swing as a
    driver key, complementing ``collection_get_snapshot``'s read-side
    pin): add even doc_ids (v_000000), add odd ones (v_000001), then
    ``rollback('v_000000')`` — one atomic ``_CURRENT`` swing under the
    writer lock — and serve ``get`` from the RESTORED state: rows are
    exactly the first commit's filter survivors, the second commit's
    rows gone without any data rewrite (the abandoned version is an
    orphan the next commit sweeps). Replay-safe at every crash window:
    whatever version ``_CURRENT`` names on entry, the key converges it
    back to v_000000 before reading."""
    from ..memo import index_root
    from ..sources.tables import load_table

    root = index_root(
        "collection_rollback_v1", sf_dir, RP_PLANES, RP_BANDS, N_META_BUCKETS
    )
    coll = Collection(spark, root)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    base = e.join(d, e["vec_id"] == d["doc_id"]).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        F.col("text").alias("document"),
        "lang",
        "source",
        "n_chars",
        (F.col("doc_id") % 2).alias("par"),
    )
    if coll._cur() is None:
        coll.add(base.filter(F.col("par") == 0).drop("par"))
    if os.path.basename(coll._cur()) == "v_000000" and not os.path.isdir(
        os.path.join(root, "v_000001")
    ):
        coll.add(base.filter(F.col("par") == 1).drop("par"))
    if os.path.basename(coll._cur()) != "v_000000":
        coll.rollback("v_000000")
    return coll.get(where={"lang": {"$in": ["es", "zh"]}}, limit=20).select(
        "id", "lang", "n_chars"
    )


def collection_replace_graph_topk(
    spark: SparkSession, sf_dir: str, k: int = 10
) -> DataFrame:
    """Incremental vector REPLACE through the graph sidecar, end-to-end
    as a driver key (r14 — VERDICT r13 next #4's oracle coverage):
    v_000000 adds the whole demo corpus; a graph query stages the
    sidecar at v_000000 (full build); v_000001 ``update``s doc-3's
    embedding to embeddings[7]'s vector; the next graph query advances
    the sidecar INCREMENTALLY — tombstone doc-3's old node, add the new
    vector under the private rid = md5('rep|v_000001|<sid>'), alias-
    translate at emission. Queried AT the new vector, both doc-7 and
    the replaced doc-3 surface at distance 0.

    Every run REPLAYS the lifecycle deterministically (the rollback
    key's discipline): roll back to v_000000, wipe the sidecar lineage
    (forces the staged-at-v_000000 state), query, update, query — so
    the driver always exercises the replace path, never a cached
    shortcut serving a differently-built graph. The oracle reconstructs
    the v_000000 graph over the surrogate keyspace, applies the
    update-path edge discipline for the rid (frozen-centroid top-2-cell
    candidates, md5-capped union members, star bridge, reversals), runs
    the beam over the UNION adjacency, translates rid->sid, and ranks
    against the CURRENT (post-replace) vectors."""
    import shutil

    from ..memo import index_root
    from ..sources.tables import load_table

    root = index_root(
        "collection_replace_graph_v1", sf_dir, RP_PLANES, RP_BANDS,
        N_META_BUCKETS,
    )
    coll = Collection(spark, root)
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    base = e.join(d, e["vec_id"] == d["doc_id"]).select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
        F.col("text").alias("document"),
        "lang",
        "source",
        "n_chars",
    )
    if coll._cur() is None:
        coll.add(base)
    if os.path.basename(coll._cur()) != "v_000000":
        coll.rollback("v_000000")
    shutil.rmtree(coll._graph_lineage_dir(), ignore_errors=True)
    qv = [
        float(x)
        for x in e.filter(F.col("vec_id") == 7).head()["embedding"]
    ]
    # stage the sidecar at v_000000 (the lineage anchor the delta
    # advances from)
    coll.query(qv, n_results=1, filter_strategy="graph").collect()
    coll.update(
        e.filter(F.col("vec_id") == 7).select(
            F.lit("doc-3").alias("id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
    )
    return coll.query(qv, n_results=k, filter_strategy="graph").select(
        "id", "distance"
    )


def collection_get_page2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset pagination through the facade (r11): page 2 of the
    filtered ``get`` via ``after_id`` — the cursor is the last id of
    page 1, so the page-2 read is a pushed-down ``id > cursor``
    predicate (O(page) at any depth; the positional ``offset``
    alternative sorts-and-discards the prefix). Cursor derived
    DRIVER-side from page 1 (one k-row job), the search_after
    discipline of the BM25 serving layer."""
    coll = demo_collection(spark, sf_dir)
    page1 = coll.get(where=COLLECTION_GET_WHERE_DEMO, limit=10).select("id")
    rows = page1.collect()
    if not rows:
        return coll.get(where=COLLECTION_GET_WHERE_DEMO, limit=10).select(
            "id", "lang", "source", "n_chars"
        )
    cursor = rows[-1]["id"]
    return coll.get(
        where=COLLECTION_GET_WHERE_DEMO, limit=10, after_id=cursor
    ).select("id", "lang", "source", "n_chars")
