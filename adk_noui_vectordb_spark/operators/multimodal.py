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
