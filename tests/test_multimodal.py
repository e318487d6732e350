"""Multimodal pipeline tests — the PNG codec is REAL (round 6): stdlib
encoder/decoder with full scanline-filter reconstruction, exercised both
directly and through the Spark stages."""

import hashlib
import struct
import zlib

import pytest

from pyspark.sql import functions as F

from adk_noui_vectordb_spark.operators.multimodal import (
    _PNG_SIG,
    WAV_SAMPLE_RATE,
    extract_features,
    multimodal_assets,
    png_decode,
    png_encode_gray,
    resize_images,
    sample_frames,
    wav_decode,
    wav_encode_pcm8,
)


def test_png_roundtrip_property():
    """encode -> decode is the identity on pixel bytes, for arbitrary
    byte content and several width/height splits."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=512))
    def run(data):
        img = png_decode(png_encode_gray(data))
        assert (img["width"], img["height"]) == (len(data), 1)
        assert img["pixels"] == data

    run()
    # multi-row layout
    data = bytes(range(256)) * 4
    img = png_decode(png_encode_gray(data, width=64))
    assert (img["width"], img["height"]) == (64, 16)
    assert img["pixels"] == data


def _png_with_filters(width, rows_with_filters):
    """Hand-build a PNG whose scanlines use explicit filter types —
    our encoder only emits filter 0, so this exercises the decoder's
    Sub/Up/Average/Paeth reconstruction against an independent
    forward-filter implementation."""
    height = len(rows_with_filters)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(width)
    for ftype, row in rows_with_filters:
        raw.append(ftype)
        enc = bytearray()
        for x in range(width):
            a = row[x - 1] if x else 0
            b, c = prev[x], (prev[x - 1] if x else 0)
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc.append((row[x] - pred) & 0xFF)
        raw += enc
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decode_reconstructs_all_filter_types():
    width = 9
    rows = [
        (0, bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])),
        (1, bytes([5, 15, 25, 35, 45, 55, 65, 75, 85])),
        (2, bytes([200, 100, 0, 255, 128, 64, 32, 16, 8])),
        (3, bytes([1, 2, 3, 4, 5, 6, 7, 8, 9])),
        (4, bytes([90, 80, 70, 60, 50, 40, 30, 20, 10])),
    ]
    img = png_decode(_png_with_filters(width, rows))
    assert (img["width"], img["height"]) == (width, len(rows))
    expected = b"".join(r for _, r in rows)
    assert img["pixels"] == expected


def test_png_decode_rejects_corruption():
    good = png_encode_gray(b"hello png world")
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"not a png at all")
    # flip one byte inside the IDAT payload -> CRC must catch it
    bad = bytearray(good)
    bad[len(_PNG_SIG) + 12 + 13 + 12] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))


def test_wav_roundtrip_property():
    """encode -> decode is the identity on sample bytes for arbitrary
    content, and the header fields survive."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=512))
    def run(data):
        clip = wav_decode(wav_encode_pcm8(data))
        assert clip["sample_rate"] == WAV_SAMPLE_RATE
        assert clip["n_samples"] == len(data)
        assert clip["samples"] == data

    run()


def test_wav_decode_rejects_corruption():
    good = wav_encode_pcm8(b"hello wav world")
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"not a wav at all!!")
    truncated = good[:-3]
    with pytest.raises(ValueError):
        wav_decode(truncated)
    # stereo/16-bit fmt must hit the documented gate
    bad_fmt = bytearray(good)
    bad_fmt[22] = 2  # channels = 2
    # fix the RIFF itself so only the fmt is wrong
    with pytest.raises(NotImplementedError, match="PCM 8-bit mono"):
        wav_decode(bytes(bad_fmt))


def test_audio_payloads_are_real_wavs(spark, sf_dir):
    rows = (
        multimodal_assets(spark, sf_dir)
        .filter(F.col("modality") == "audio")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        clip = wav_decode(bytes(r["payload"]))
        assert clip["sample_rate"] == WAV_SAMPLE_RATE
        assert clip["n_samples"] == len(clip["samples"])


def test_image_payloads_are_real_pngs(spark, sf_dir):
    rows = (
        multimodal_assets(spark, sf_dir)
        .filter(F.col("modality") == "image")
        .limit(5)
        .collect()
    )
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        assert payload[:8] == _PNG_SIG
        img = png_decode(payload)
        assert img["height"] == 1 and img["width"] == len(img["pixels"])


def test_multimodal_features_real_image_decode(spark, sf_dir):
    """Image rows carry REAL decoded dimensions; digests equal the md5 of
    the decoded pixels (== the source text bytes, the oracle contract)."""
    from adk_noui_vectordb_spark.sources.tables import load_table

    feats = {
        r["asset_id"]: r
        for r in extract_features(multimodal_assets(spark, sf_dir)).collect()
    }
    docs = {r["doc_id"]: r["text"] for r in load_table(spark, sf_dir, "documents").collect()}
    assert set(feats) == set(docs)
    for aid, r in feats.items():
        raw = docs[aid].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["content_digest"] == hashlib.md5(raw).hexdigest()
        if r["modality"] == "image":
            assert (r["width"], r["height"]) == (len(raw), 1)
            assert r["n_samples"] is None and r["sample_rate"] is None
        elif r["modality"] == "audio":
            assert (r["n_samples"], r["sample_rate"]) == (len(raw), 8000)
            assert r["width"] is None and r["height"] is None
        else:
            assert r["width"] is None and r["height"] is None
            assert r["n_samples"] is None and r["sample_rate"] is None


def test_resize_and_frames_still_roundtrip(spark, sf_dir):
    rz = resize_images(spark, sf_dir)
    assert rz.filter(F.col("orig_chars") <= 0).count() == 0
    assert rz.count() > 0
    fr = sample_frames(spark, sf_dir)
    assert fr.select("asset_id").distinct().count() * 4 == fr.count()
