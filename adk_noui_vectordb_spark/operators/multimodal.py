"""Multimodal columns: opaque binary payloads + typed metadata.

North-star surface: at 100 TB a training pipeline carries images/audio/video
as ``binary`` columns beside typed metadata, and runs decode / feature
extraction / resize / frame-sampling as Arrow-batched Python stages
(``mapInPandas``), because the decoders are native libraries, not SQL.

The container ships no image/audio libraries, so the decode step is STUBBED
(documented NotImplementedError) behind a deterministic byte-level feature
extractor — but every piece of Spark plumbing is real: binary schema, Arrow
record-batch iteration, per-batch vectorization, output schema contract.
Swapping in PIL/ffmpeg changes only ``_decode_stub``.

``multimodal_assets`` synthesizes assets from the documents table (text
bytes as payload) so the pipeline is runnable and oracle-checkable on the
driver testdata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes int, content_digest string"
)


def multimodal_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(asset_id, modality, payload binary, meta) synthesized from documents.

    Modality is assigned deterministically; payload is the document text
    encoded as bytes (stands in for image/audio bytes).
    """
    d = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return d.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"), F.col("n_chars").alias("n_chars")
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic byte-level 'decode'. A real deployment decodes with the
    native library for the modality; none ship in this container."""
    import hashlib

    return {
        "n_bytes": len(payload),
        "content_digest": hashlib.md5(payload).hexdigest(),
    }


def decode_real(payload: bytes, modality: str):  # pragma: no cover
    """Real decoder entry point — intentionally unimplemented here.

    image -> PIL.Image.open, audio -> soundfile/librosa, video -> ffmpeg
    frame sampling. Gate: these libs are not in the container.
    """
    raise NotImplementedError(
        f"no {modality} decoder available in this environment; "
        "use the deterministic _decode_stub path"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers the binary column as zero-copy byte buffers per batch;
    the stage emits one typed feature row per asset. Partitioning carries
    over from the input (narrow op — no shuffle), which at scale means the
    decode cost spreads across all executors with no data movement.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "content_digest": [f["content_digest"] for f in feats],
                }
            )

    return assets.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked end-to-end: synthesize assets -> mapInPandas decode
    stub -> typed features."""
    return extract_features(multimodal_assets(spark, sf_dir))


RESIZE_SCHEMA = (
    "asset_id bigint, orig_chars int, thumb_digest string, scale double"
)
THUMB_CHARS = 32


def resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image 'resize' stage: image-modality assets -> fixed-size thumbnail.

    Real deployment: PIL decode -> resize -> re-encode inside the same
    mapInPandas batch loop. Stub kernel: utf-8 decode + fixed-length char
    crop + digest (deterministic, oracle-checkable). The Spark shape is
    what matters: modality filter pushed to the scan, narrow Arrow-batched
    1:1 transform, typed output schema.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            texts = [bytes(p).decode("utf-8") for p in pdf["payload"]]
            thumbs = [t[:THUMB_CHARS] for t in texts]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "orig_chars": [len(t) for t in texts],
                    "thumb_digest": [
                        hashlib.md5(t.encode("utf-8")).hexdigest()
                        for t in thumbs
                    ],
                    "scale": [
                        min(THUMB_CHARS, len(t)) / len(t) if t else 1.0
                        for t in texts
                    ],
                }
            )

    assets = multimodal_assets(spark, sf_dir).filter(
        F.col("modality") == "image"
    )
    out = assets.mapInPandas(_batches, schema=RESIZE_SCHEMA)
    return out.select(
        "asset_id", "orig_chars", "thumb_digest", F.round("scale", 4).alias("scale")
    )


FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_chars int, frame_digest string"
N_FRAMES = 4


def sample_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: one asset row -> N_FRAMES frame rows (the
    flatMap-shaped multimodal stage).

    Real deployment: ffmpeg keyframe extraction per batch. Stub kernel:
    utf-8 decode + contiguous char-range slices (frame i covers
    [i*L//N, (i+1)*L//N)), digested. mapInPandas naturally emits a
    different row count than it consumes — no explode needed, no shuffle;
    at scale each executor fans its own assets into frames locally.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = {k: [] for k in ("asset_id", "frame_idx", "frame_chars", "frame_digest")}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                t = bytes(payload).decode("utf-8")
                n = len(t)
                for i in range(N_FRAMES):
                    lo, hi = i * n // N_FRAMES, (i + 1) * n // N_FRAMES
                    frame = t[lo:hi]
                    rows["asset_id"].append(aid)
                    rows["frame_idx"].append(i)
                    rows["frame_chars"].append(len(frame))
                    rows["frame_digest"].append(
                        hashlib.md5(frame.encode("utf-8")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    assets = multimodal_assets(spark, sf_dir).filter(
        F.col("modality") == "video"
    )
    return assets.mapInPandas(_batches, schema=FRAME_SCHEMA)
