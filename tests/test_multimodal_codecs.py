"""Runtime codec selection in the multimodal layer (round-4, VERDICT #8).

Real media bytes decode through real codecs (built-in netpbm / stdlib
wave here; Pillow slots in transparently where installed); bytes no codec
accepts fall back to the deterministic sha-stub that the SQL oracles
reproduce. Both paths are exercised in this container.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
from pyspark.sql import functions as F

from onetable_spark.functions.multimodal import (
    _decode_audio_impl,
    _decode_image_impl,
    _decode_raster_impl,
    _parse_netpbm,
    decode_audio,
    decode_images,
    resize_images,
    synth_media_table,
)


def _pgm(w: int, h: int, pixels: bytes) -> bytes:
    return f"P5\n# test comment\n{w} {h}\n255\n".encode() + pixels


def _wav(rate: int, samples: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(struct.pack("<h", int(s * 32767)) for s in samples)
        )
    return buf.getvalue()


def test_netpbm_p5_real_decode():
    pixels = bytes(range(16))  # 4x4 gradient
    w, h, feature = _decode_image_impl(_pgm(4, 4, pixels))
    assert (w, h) == (4, 4)
    raster = _parse_netpbm(_pgm(4, 4, pixels))
    assert raster.tolist() == [list(range(i, i + 4)) for i in range(0, 16, 4)]
    # 8 vertical strips of a 4-wide image: strips are columns repeated
    assert len(feature) == 8 and abs(feature[0] - raster[:, 0].mean() / 255.0) < 1e-9


def test_sub_8px_image_features_finite():
    """Images narrower than 8 px must not produce NaN strip means (round-5,
    VERDICT #4): the split is capped at the width and the feature padded by
    repeating the last strip so it stays length-8 and finite."""
    pixels = bytes(range(16))  # 4x4
    w, h, feature = _decode_image_impl(_pgm(4, 4, pixels))
    assert (w, h) == (4, 4)
    assert len(feature) == 8
    assert all(np.isfinite(feature))
    raster = _parse_netpbm(_pgm(4, 4, pixels))
    # 4 real strips (one column each) then the last value repeated
    expected = [raster[:, i].mean() / 255.0 for i in range(4)]
    expected += [expected[-1]] * 4
    assert np.allclose(feature, expected)
    # degenerate 1-px-wide image: single strip repeated 8x
    one = _pgm(1, 3, bytes([100, 110, 120]))
    w1, h1, f1 = _decode_image_impl(one)
    assert (w1, h1) == (1, 3)
    assert np.allclose(f1, [110.0 / 255.0] * 8)


def test_netpbm_p6_collapses_rgb():
    rgb = bytes([30, 60, 90] * 4)  # 2x2, every pixel mean=60
    content = b"P6\n2 2\n255\n" + rgb
    raster = _parse_netpbm(content)
    assert raster.tolist() == [[60, 60], [60, 60]]


def test_real_raster_feeds_real_resize(spark):
    pixels = bytes([10] * 8 + [200] * 8)  # 4x4: top half 10, bottom half 200
    content = _pgm(4, 4, pixels)
    df = spark.createDataFrame([(1, bytearray(content))], "media_id long, content binary")
    row = resize_images(df, width=2, height=2).first()
    # NN gather rows [0,2] cols [0,2] -> values [[10,10],[200,200]]
    assert row["mean_intensity"] == 105.0


def test_wav_real_decode():
    samples = np.full(1600, 0.5)
    rate, feature = _decode_audio_impl(_wav(16000, samples))
    assert rate == 16000
    assert len(feature) == 8
    assert all(abs(f - 0.5) < 1e-3 for f in feature)


def test_wav_through_spark_pipeline(spark):
    content = _wav(22050, np.full(2205, 0.25))
    df = spark.createDataFrame(
        [(7, bytearray(content), (None, None, None, 100))],
        "media_id long, content binary, meta struct<mime:string,width:int,height:int,duration_ms:long>",
    )
    row = decode_audio(df).first()
    assert row["sample_rate"] == 22050
    assert abs(sum(row["feature"]) / 8 - 0.25) < 1e-3


def test_stub_contract_unchanged_for_non_media_bytes(spark):
    """The synthetic corpus (sha-hex payloads, never valid media) must keep
    decoding through the sha-stub — this is the SQL-oracle contract."""
    media = synth_media_table(spark, 30).filter(F.col("kind") == "image")
    rows = decode_images(media).collect()
    for r in rows:
        content = hashlib.sha256(str(r["media_id"]).encode()).hexdigest().encode()
        digest = hashlib.sha256(content).digest()
        assert (r["width"], r["height"]) == (64 + digest[0], 64 + digest[1])
        assert np.allclose(r["feature"], [b / 255.0 for b in digest[2:10]])


def test_stub_raster_unchanged_for_non_media_bytes():
    content = b"definitely not an image"
    digest = hashlib.sha256(content).digest()
    raster = _decode_raster_impl(content)
    assert raster.shape == (64 + digest[1], 64 + digest[0])
    assert raster.flatten()[: len(digest)].tolist() == list(digest)


# ---------------------------------------------------- binaryFile ingestion


def test_media_corpus_roundtrip_through_binary_file_source(spark, tmp_path):
    """write_media_corpus (executor-side) → binaryFile ingest: every file
    comes back with its exact payload, kind from partition discovery,
    media_id from the name, and the glob skips the _staging.tmp decoys."""
    from onetable_spark.functions.multimodal import (
        ingest_media,
        synth_media_table,
        write_media_corpus,
    )

    base = str(tmp_path / "corpus")
    media = synth_media_table(spark, 30)
    write_media_corpus(media, base)

    back = ingest_media(spark, base)
    rows = {r["media_id"]: r for r in back.collect()}
    src = {r["media_id"]: r for r in media.collect()}
    assert set(rows) == set(src)  # 30 files, zero decoys ingested
    for mid, r in rows.items():
        assert r["kind"] == src[mid]["kind"]
        assert bytes(r["content"]) == bytes(src[mid]["content"])
        assert r["file_bytes"] == len(bytes(src[mid]["content"]))


def test_ingest_kind_filter_partition_prunes(spark, tmp_path):
    """A kind filter must prune at file listing (PartitionFilters), never
    scan-and-discard the other kinds' bytes."""
    from onetable_spark.functions.multimodal import (
        ingest_media,
        synth_media_table,
        write_media_corpus,
    )

    base = str(tmp_path / "corpus")
    write_media_corpus(synth_media_table(spark, 30), base)
    plan = (
        ingest_media(spark, base)
        .filter(F.col("kind") == "image")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "kind" in plan.split("PartitionFilters")[1][:80]
