"""Multimodal columns: opaque binary payloads + typed metadata.

North-star surface: at 100 TB a training pipeline carries images/audio/video
as ``binary`` columns beside typed metadata, and runs decode / feature
extraction / resize / frame-sampling as Arrow-batched Python stages
(``mapInPandas``), because the decoders are native libraries, not SQL.

The IMAGE and AUDIO modalities are REAL end-to-end (round 6): image
payloads are genuine PNG files (8-bit grayscale, synthesized
deterministically from document text so the testdata stays
oracle-checkable) parsed by a pure-stdlib PNG decoder (zlib inflate +
chunk/CRC walk + full scanline-filter reconstruction — ``png_decode``);
audio payloads are genuine WAV files (RIFF/PCM 8-bit mono) parsed by a
pure-stdlib RIFF reader (``wav_decode``). Only VIDEO remains stubbed
(frame extraction genuinely needs ffmpeg, which the container lacks —
documented NotImplementedError in ``decode_real``); its byte-level
extractor keeps the Spark plumbing (binary schema, Arrow record-batch
iteration, per-batch vectorization, typed output contract) identical for
all three modalities, so swapping in ffmpeg changes only ``decode_real``.

``multimodal_assets`` synthesizes assets from the documents table so the
pipeline is runnable and oracle-checkable on the driver testdata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

FEATURE_SCHEMA = (
    "asset_id bigint, modality string, n_bytes int, content_digest string, "
    "width int, height int, n_samples int, sample_rate int"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
WAV_SAMPLE_RATE = 8000


def wav_encode_pcm8(samples: bytes, sample_rate: int = WAV_SAMPLE_RATE) -> bytes:
    """Minimal-but-valid WAV writer: RIFF/WAVE container, PCM format
    chunk, one data chunk, 8-bit unsigned mono — stdlib struct only.
    8-bit PCM stores each sample as one unsigned byte, so ``samples``
    round-trips byte-for-byte through any conformant reader. An
    odd-length data chunk gets the RIFF word-alignment pad byte
    (counted in the RIFF length, NOT in the data chunk length — so
    strict readers that require aligned chunks parse it too, ADVICE r6)."""
    import struct

    if not samples:
        raise ValueError("cannot encode an empty clip")
    fmt = struct.pack(
        "<HHIIHH",
        1,  # PCM
        1,  # mono
        sample_rate,
        sample_rate * 1 * 1,  # byte rate = rate * channels * bytes/sample
        1,  # block align
        8,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
        + (b"\x00" if len(samples) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> dict:
    """Pure-stdlib WAV reader for PCM 8-bit mono: RIFF chunk walk, fmt
    validation, data extraction. Returns {"sample_rate", "n_samples",
    "samples": bytes}."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    (riff_len,) = struct.unpack("<I", payload[4:8])
    if riff_len != len(payload) - 8:
        raise ValueError("RIFF length does not match payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (clen,) = struct.unpack("<I", payload[i + 4 : i + 8])
        chunk = payload[i + 8 : i + 8 + clen]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, channels, rate, _byte_rate, _align, bits = fmt
    if (audio_fmt, channels, bits) != (1, 1, 8):
        raise NotImplementedError(
            "only PCM 8-bit mono WAVs are supported "
            f"(got fmt={audio_fmt} channels={channels} bits={bits})"
        )
    return {"sample_rate": rate, "n_samples": len(data), "samples": data}


def png_encode_gray(pixels: bytes, width: int | None = None) -> bytes:
    """Minimal-but-valid PNG writer: 8-bit grayscale, non-interlaced,
    filter 0 scanlines, one IDAT. stdlib only (zlib + struct). Default
    layout is a single scanline (height 1) so ``pixels`` round-trips
    byte-for-byte through any conformant decoder."""
    import struct
    import zlib

    if not pixels:
        raise ValueError("cannot encode an empty image")
    w = width or len(pixels)
    if len(pixels) % w:
        raise ValueError(f"{len(pixels)} pixels not divisible by width {w}")
    h = len(pixels) // w

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[r * w : (r + 1) * w] for r in range(h)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def png_decode(payload: bytes) -> dict:
    """Pure-stdlib PNG decoder for 8-bit grayscale non-interlaced images:
    chunk walk with CRC verification, zlib inflate of the concatenated
    IDAT stream, and FULL scanline-filter reconstruction (None/Sub/Up/
    Average/Paeth — the decoder handles any conformant encoder's filter
    choices, not just our own filter-0 output; pinned in tests).

    Returns {"width", "height", "pixels": bytes}.
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    idat = b""
    i = 8
    n = len(payload)
    while i + 12 <= n:
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(">I", payload[i + 8 + ln : i + 12 + ln])
        if crc != zlib.crc32(typ + data) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, interlace) != (8, 0, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit grayscale non-interlaced PNGs are supported "
                    f"(got depth={depth} colortype={ctype} interlace={interlace})"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(idat)
    stride = width + 1
    if len(raw) != height * stride:
        raise ValueError("IDAT length does not match dimensions")
    out = bytearray()
    prev = bytearray(width)
    for r in range(height):
        ftype = raw[r * stride]
        row = bytearray(raw[r * stride + 1 : (r + 1) * stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub (bpp = 1 for grayscale)
            for x in range(1, width):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                row[x] = (row[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(width):
                left = row[x - 1] if x else 0
                row[x] = (row[x] + (left + prev[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(width):
                a = row[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out += row
        prev = row
    return {"width": width, "height": height, "pixels": bytes(out)}


def multimodal_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(asset_id, modality, payload binary, meta) synthesized from documents.

    Modality is assigned deterministically. IMAGE payloads are REAL PNG
    files (one grayscale scanline whose pixels are the document's utf-8
    bytes — built by an Arrow kernel running ``png_encode_gray``) and
    AUDIO payloads are REAL WAV files (RIFF/PCM8 containers whose
    samples are the text bytes — ``wav_encode_pcm8``), so the decode
    stage downstream parses genuine media bytes while features stay
    arithmetically predictable for the oracle (decoded pixels/samples ==
    text bytes). Only VIDEO payloads remain the raw text bytes (stand-in
    until an ffmpeg-backed decoder exists).
    """
    d = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    base = d.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("raw"),
        F.struct(
            F.col("lang").alias("lang"), F.col("n_chars").alias("n_chars")
        ).alias("meta"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = {
            "image": lambda r: png_encode_gray(r),
            "audio": lambda r: wav_encode_pcm8(r),
            "video": lambda r: r,
        }
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                enc[m](bytes(r))
                for r, m in zip(pdf["raw"], pdf["modality"])
            ]
            yield pdf[["asset_id", "modality", "payload", "meta"]]

    return base.mapInPandas(
        encode,
        "asset_id bigint, modality string, payload binary, "
        "meta struct<lang: string, n_chars: int>",
    )


def _decode_stub(payload: bytes, modality: str) -> dict:
    """Deterministic byte-level 'decode' for the one modality whose native
    decoder is not in this container (video — frame extraction genuinely
    needs ffmpeg; image and audio are REAL, see decode_real)."""
    import hashlib

    return {
        "n_bytes": len(payload),
        "content_digest": hashlib.md5(payload).hexdigest(),
        "width": None,
        "height": None,
        "n_samples": None,
        "sample_rate": None,
    }


def decode_real(payload: bytes, modality: str) -> dict:
    """Real decoder entry point. image -> the pure-stdlib PNG decoder
    (REAL since round 6); audio -> the pure-stdlib WAV reader (REAL since
    round 6); video -> ffmpeg frame extraction — not in the container, so
    the gate below remains for it (swap-in changes only this function)."""
    import hashlib

    if modality == "image":
        img = png_decode(payload)
        return {
            "n_bytes": len(img["pixels"]),
            "content_digest": hashlib.md5(img["pixels"]).hexdigest(),
            "width": img["width"],
            "height": img["height"],
            "n_samples": None,
            "sample_rate": None,
        }
    if modality == "audio":
        clip = wav_decode(payload)
        return {
            "n_bytes": clip["n_samples"],
            "content_digest": hashlib.md5(clip["samples"]).hexdigest(),
            "width": None,
            "height": None,
            "n_samples": clip["n_samples"],
            "sample_rate": clip["sample_rate"],
        }
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
                decode_real(p, m) if m in ("image", "audio") else _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            cols = {
                "asset_id": pdf["asset_id"],
                "modality": pdf["modality"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "content_digest": [f["content_digest"] for f in feats],
            }
            for c in ("width", "height", "n_samples", "sample_rate"):
                cols[c] = pd.array([f[c] for f in feats], dtype="Int32")
            yield pd.DataFrame(cols)

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

    REAL decode since round 6: the payload is a genuine PNG, so the kernel
    runs the stdlib ``png_decode`` first (inflate + unfilter), then the
    deterministic thumbnail logic over the decoded pixel bytes (== the
    source utf-8 text, keeping the oracle arithmetic). A PIL deployment
    would swap the crop+digest for resize+re-encode in the same loop. The
    Spark shape is what matters: modality filter pushed to the scan,
    narrow Arrow-batched 1:1 transform, typed output schema.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            texts = [
                png_decode(bytes(p))["pixels"].decode("utf-8")
                for p in pdf["payload"]
            ]
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
