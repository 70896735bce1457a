"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schema, batched Arrow
transfer, partition sizing, UDF signatures. The codec step is selected AT
RUNTIME per record:

- **real decode first**: Pillow when installed; otherwise built-in pure
  decoders that need no external library — netpbm P5/P6 (PGM/PPM) for
  images, stdlib ``wave`` for audio. Real media bytes get real pixels /
  samples, and the downstream math (resize gather, strip features, RMS
  bands) runs on them.
- **deterministic stub fallback**: bytes no available codec can decode
  (including every synthetic test payload) get a sha-derived fake — the
  contract the SQL oracles reproduce, so correctness checks stay exact
  wherever the corpus isn't real media. Swap in torchaudio/pyav the same
  way in production.

Scale design: decode runs in ``mapInPandas`` (Arrow batches, one Python
worker per core); binary payloads never pass through a groupBy — frame
sampling / resizing emit (id, feature) rows and drop the bytes as early
as possible so downstream shuffles carry features, not media.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional — not shipped in this container
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - exercised wherever Pillow exists
    _PIL_Image = None


def _parse_netpbm(content: bytes):
    """Pure-python netpbm decoder (binary PGM ``P5`` / PPM ``P6``): parses
    the whitespace/comment-delimited header then reshapes the raster.
    Returns a grayscale uint8 array (P6 collapses RGB by integer mean)."""
    import numpy as np

    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(content) and not content[i : i + 1].isspace():
            i += 1
        tokens.append(content[start:i])
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if content[:2] == b"P5":
        raster = np.frombuffer(content, dtype=np.uint8, count=h * w, offset=i).reshape(h, w)
        return raster.copy()
    raster = np.frombuffer(content, dtype=np.uint8, count=h * w * 3, offset=i).reshape(h, w, 3)
    return (raster.sum(axis=2, dtype=np.uint32) // 3).astype(np.uint8)


def _try_real_image(content: bytes):
    """Real image decode: Pillow when installed, else the built-in netpbm
    parser for P5/P6 magic bytes. Returns a grayscale uint8 raster, or
    None when the bytes aren't decodable media (→ caller stubs)."""
    if not content:
        return None
    if _PIL_Image is not None:
        try:
            import numpy as np

            with _PIL_Image.open(io.BytesIO(content)) as im:
                return np.asarray(im.convert("L"))
        except Exception:
            pass
    if content[:2] in (b"P5", b"P6"):
        try:
            return _parse_netpbm(content)
        except Exception:
            return None
    return None


def _try_real_audio(content: bytes):
    """Real audio decode via stdlib ``wave`` (RIFF/WAVE PCM). Returns
    (sample_rate, mono float32 samples in [-1, 1]) or None."""
    if not content or content[:4] != b"RIFF":
        return None
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(content), "rb") as wf:
            rate = wf.getframerate()
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            raw = wf.readframes(wf.getnframes())
    except Exception:
        return None
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        return None
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1)
    return rate, samples

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_impl(content: bytes) -> tuple[int, int, list[float]]:
    """Runtime-selected decode: REAL raster when the bytes are decodable
    media (Pillow if installed, else built-in netpbm) — feature = mean
    intensity of 8 vertical strips; otherwise the deterministic sha-stub
    (width/height/feature from the content digest — the contract the SQL
    oracles reproduce for non-media corpora)."""
    raster = _try_real_image(content)
    if raster is not None and raster.size:
        import numpy as np

        h, w = raster.shape
        # images narrower than 8 px would make array_split emit empty
        # strips (mean() → NaN); split into at most w strips and pad by
        # repeating the last value so the feature stays length-8 and finite
        strips = np.array_split(raster, min(8, w), axis=1)
        feature = [float(s.mean()) / 255.0 for s in strips]
        feature += [feature[-1]] * (8 - len(feature))
        return w, h, feature
    digest = hashlib.sha256(content or b"").digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def decode_images(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Distributed image decode + feature extraction via mapInPandas."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "feature": []}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, feat = _decode_image_impl(bytes(content) if content is not None else b"")
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(worker, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_audio_impl(content: bytes) -> tuple[int, list[float]]:
    """Runtime-selected decode: REAL samples for RIFF/WAVE PCM bytes
    (stdlib ``wave``) — feature = RMS energy of 8 equal time slices;
    otherwise the deterministic sha-stub (rate + feature from the content
    digest — the SQL-oracle contract for non-media corpora)."""
    real = _try_real_audio(content)
    if real is not None:
        import numpy as np

        rate, samples = real
        slices = np.array_split(samples, 8) if samples.size else [np.zeros(1)] * 8
        feature = [float(np.sqrt(np.mean(np.square(s)))) if s.size else 0.0 for s in slices]
        return rate, feature
    digest = hashlib.sha256(b"audio:" + (content or b"")).digest()
    sample_rate = (8000, 16000, 22050, 44100)[digest[0] % 4]
    feature = [b / 255.0 for b in digest[1:9]]
    return sample_rate, feature


def decode_audio(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Distributed audio decode + feature extraction via mapInPandas —
    same plumbing contract as ``decode_images``: bytes stay inside the
    Arrow batch, only (id, rate, duration, feature) rows come out."""

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "sample_rate": [], "duration_ms": [], "feature": []}
            for mid, content, dur in zip(pdf[id_col], pdf[content_col], pdf[duration_col]):
                rate, feat = _decode_audio_impl(bytes(content) if content is not None else b"")
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["duration_ms"].append(int(dur) if dur is not None else 0)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    flat = df.select(id_col, content_col, F.col(f"meta.{duration_col}").alias(duration_col))
    return flat.mapInPandas(worker, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    content_col: str = "content",
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp.

    The content bytes cross Arrow ONCE per video — the frame grid is
    generated and the per-frame decode (stubbed) runs *inside* the worker,
    which then emits only (id, ts, feature) rows. (The earlier explode-
    then-decode shape replicated a video's bytes per frame row: a 600-frame
    video shipped 600 copies through Arrow — a scale-killer.)"""
    frame_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )
    base = df.select(
        F.col(id_col).alias("media_id"),
        F.col(content_col).alias("content"),
        F.coalesce(F.col(duration_col), F.lit(0)).alias("duration_ms"),
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            tss: list[int] = []
            feats: list[list[float]] = []
            for mid, content, dur in zip(pdf["media_id"], pdf["content"], pdf["duration_ms"]):
                raw = bytes(content) if content is not None else b""
                for ts in range(0, int(dur) + 1, every_ms):  # inclusive grid
                    # ASCII ts suffix (not to_bytes) keeps the stub's output
                    # reproducible by the SQL oracle (sha256 over text)
                    seed = hashlib.sha256(raw + str(ts).encode()).digest()
                    ids.append(mid)
                    tss.append(ts)
                    feats.append([b / 255.0 for b in seed[:8]])
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss, "feature": feats})

    return base.mapInPandas(worker, frame_schema)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), False),
        T.StructField("out_height", T.IntegerType(), False),
        T.StructField("mean_intensity", T.DoubleType(), True),
    ]
)


def _decode_raster_impl(content: bytes):
    """Runtime-selected decode → grayscale raster: REAL pixels for
    decodable media (Pillow / built-in netpbm), else the deterministic
    stub raster (dimensions from the digest, pixels = the 32 digest bytes
    tiled row-major across h×w — the SQL-oracle contract). Everything
    DOWNSTREAM of this selection is real image math either way."""
    import numpy as np

    raster = _try_real_image(content)
    if raster is not None and raster.size:
        return raster
    digest = hashlib.sha256(content or b"").digest()
    w, h = 64 + digest[0], 64 + digest[1]
    idx = np.arange(h * w, dtype=np.int64) % len(digest)
    return np.frombuffer(digest, dtype=np.uint8)[idx].reshape(h, w)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Distributed nearest-neighbor image resize via mapInPandas.

    The resize itself is REAL vectorized numpy (index-map gather — the
    same math PIL's NEAREST uses); only the codec step is the deterministic
    stub raster. Emits (id, dims, mean intensity) so the bulky pixel
    buffers never leave the worker — at scale you'd write resized bytes to
    object storage from inside the worker rather than shuffling them."""
    import numpy as np

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # precomputed source-index grids are shared across every image in
        # the batch that has the same source dims (cache keyed by (h, w))
        grid_cache: dict = {}
        for pdf in batches:
            out = {"media_id": [], "out_width": [], "out_height": [], "mean_intensity": []}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                raster = _decode_raster_impl(bytes(content) if content is not None else b"")
                h, w = raster.shape
                key = (h, w)
                if key not in grid_cache:
                    rows = (np.arange(height, dtype=np.int64) * h) // height
                    cols = (np.arange(width, dtype=np.int64) * w) // width
                    grid_cache[key] = (rows, cols)
                rows, cols = grid_cache[key]
                resized = raster[np.ix_(rows, cols)]
                out["media_id"].append(mid)
                out["out_width"].append(width)
                out["out_height"].append(height)
                out["mean_intensity"].append(float(resized.mean()))
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(worker, RESIZED_SCHEMA)


def write_media_corpus(media: DataFrame, base_dir: str) -> None:
    """Materialize a media DataFrame as REAL files on disk in hive-style
    partition layout (``kind=image/<media_id>.bin``) — the fixture writer
    for the ``binaryFile`` ingestion path (SURVEY §2.5: a production
    pipeline ingests a directory of media files, not an in-memory table).

    The write runs EXECUTOR-SIDE (foreachPartition): each task writes its
    own partition's files, so a 100 TB corpus writes with full
    parallelism and no driver collect. Deterministic names make the write
    idempotent. A ``_staging.tmp`` decoy per kind dir proves downstream
    globs actually filter."""
    def write_partition(rows) -> None:
        import os as _os

        for row in rows:
            d = _os.path.join(base_dir, f"kind={row['kind']}")
            _os.makedirs(d, exist_ok=True)
            decoy = _os.path.join(d, "_staging.tmp")
            if not _os.path.exists(decoy):  # a file the ingest glob MUST skip
                with open(decoy, "wb") as f:
                    f.write(b"not media")
            tmp = _os.path.join(d, f".{row['media_id']}.bin.tmp")
            with open(tmp, "wb") as f:
                f.write(bytes(row["content"]) if row["content"] is not None else b"")
            _os.replace(tmp, _os.path.join(d, f"{row['media_id']}.bin"))

    media.select("media_id", "kind", "content").foreachPartition(write_partition)


def ingest_media(spark, base_dir: str) -> DataFrame:
    """Directory of media files → DataFrame via Spark's ``binaryFile``
    source: (path, modificationTime, length, content) + hive-partition
    discovery for ``kind``; ``pathGlobFilter`` excludes non-media files
    and ``media_id`` is parsed from the file name. Filters on ``kind``
    partition-prune at the file listing — no decode, no full scan."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(base_dir)
    )
    return raw.select(
        F.regexp_extract(F.element_at(F.split("path", "/"), -1), r"^(\d+)", 1)
        .cast("long")
        .alias("media_id"),
        F.col("kind").cast("string").alias("kind"),
        F.col("length").alias("file_bytes"),
        F.col("content"),
    )


def synth_media_table(spark, n: int = 100) -> DataFrame:
    """Deterministic synthetic media table for tests/demos (binary payloads
    derived from the id — no external data needed).

    Partitioned by the WORK (one slice per ~32 media rows, capped at the
    cluster width) rather than ``spark.range``'s default parallelism —
    a 200-row demo table otherwise fans its mapInPandas decoders out as
    32 near-empty python tasks per stage (r15; same rule as
    session.local_rows_df)."""
    par = spark.sparkContext.defaultParallelism
    return spark.range(n, numPartitions=max(1, min(par, n // 32 + 1))).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image").when(F.col("id") % 3 == 1, "audio").otherwise("video").alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("id") * 1000 % 10000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
