"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

North-star scope (not in the reference, which is text-only): a 100 TB
training pipeline carries media as ``BinaryType`` columns with a typed
metadata struct, and runs decode / feature-extraction / resize /
frame-sampling as Arrow-batched ``mapInPandas`` stages.

The codec boundary has three faces: ``real_decode`` runs an actual
decoder for ALL THREE media kinds — PNG via functions/png.py (zlib
inflate + unfilter; no PIL needed), PCM WAV via functions/wav.py
(RIFF parse + one vectorized frombuffer), animated GIF via
functions/gif.py (LZW + frame compositing — a real multi-frame video
container) — ``decode_stub`` raises ``NotImplementedError`` exactly
where heavyweight codecs (mp4/ffmpeg, absent from this container)
would plug in, and ``fake_decode`` is a deterministic stand-in so the
Spark-side plumbing — schema, batch iteration, partition sizing — is
testable for every kind uniformly (and stays the driver-checked oracle
path).

Scale notes: media rows are fat (MBs); keep
``spark.sql.files.maxPartitionBytes`` small enough that one partition of
binaries fits executor memory, and never collect this column.  The
mapInPandas iterator shape processes one Arrow batch at a time, so peak
memory is one batch of decoded frames, not one partition.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the ``documents`` fixture.

    The container ships no image/audio fixtures, so the text corpus stands
    in: payload = UTF-8 bytes of the text, kind round-robins image/audio/
    video on doc_id, and the typed metadata struct is column math over
    n_chars.  Everything is SQL-expressible, so the plumbing downstream of
    this table is oracle-checkable.
    """
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    is_image = F.col("doc_id") % 3 == 0
    is_av = F.col("doc_id") % 3 != 0
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            mime.alias("mime"),
            F.when(is_image, (F.col("n_chars") % 640 + 64).cast("int")).alias("width"),
            F.when(is_image, (F.col("n_chars") % 480 + 48).cast("int")).alias("height"),
            F.when(is_av, F.col("n_chars").cast("long") * 40).alias("duration_ms"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, mime: str):
    """The codec boundary.  Plug PIL/torchaudio/ffmpeg here in production."""
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment — use fake_decode in tests"
    )


def real_decode(payload: bytes, mime: str):
    """Real-codec dispatch: ``image/png`` decodes with the pure-stdlib
    PNG codec (functions/png.py — zlib inflate + unfilter, no PIL
    needed) and returns the (h, w, ch) uint8 pixel array;
    ``audio/wav`` decodes with the pure-stdlib PCM codec
    (functions/wav.py) and returns ((n, channels) float32 samples,
    sample_rate); every other mime stays the documented
    :func:`decode_stub` plug point."""
    if mime == "image/png":
        from readwise_vector_db_spark.functions.png import decode_png

        return decode_png(payload)
    if mime == "audio/wav":
        from readwise_vector_db_spark.functions.wav import decode_wav

        return decode_wav(payload)
    if mime == "image/gif":
        from readwise_vector_db_spark.functions.gif import decode_gif

        return decode_gif(payload)
    return decode_stub(payload, mime)


def pixel_features(pixels: np.ndarray) -> np.ndarray:
    """Deterministic real feature vector from decoded pixels: a 16-bin
    normalized intensity histogram over the per-pixel channel mean —
    the toy-but-real stand-in for an embedding model at the same
    (pixels → float[FEATURE_DIM]) boundary."""
    intensity = np.asarray(pixels, dtype=np.float32).mean(axis=-1)
    hist, _ = np.histogram(intensity, bins=FEATURE_DIM, range=(0.0, 256.0))
    return (hist / max(1, intensity.size)).astype(np.float32)


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: bytes → pseudo feature vector
    (sha256-seeded), so downstream plumbing is testable end-to-end."""
    if payload is None:
        return None
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:4], "big")
    return np.random.RandomState(seed).standard_normal(FEATURE_DIM).astype(np.float32)


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """media table → (media_id, kind, n_bytes, features[16]) via mapInPandas.

    The iterator-of-batches signature is the scale-safe shape: one Arrow
    batch of binaries in memory at a time.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if payload is None:
                    feats.append(None)
                    nbytes.append(None)
                    continue
                if use_real_codec:
                    # PNG/WAV/GIF payloads run the REAL pure-stdlib
                    # decode → histogram / energy-profile / motion
                    # features; other mimes stay the stub
                    decoded = real_decode(bytes(payload), meta["mime"])
                    if meta["mime"] == "audio/wav":
                        from readwise_vector_db_spark.functions.wav import (
                            audio_features,
                        )

                        arr = audio_features(*decoded, dim=FEATURE_DIM)
                    elif meta["mime"] == "image/gif":
                        from readwise_vector_db_spark.functions.gif import (
                            video_features,
                        )

                        arr = video_features(*decoded, dim=FEATURE_DIM)
                    else:
                        arr = pixel_features(decoded)
                else:
                    arr = fake_decode(bytes(payload))
                feats.append([float(x) for x in arr])
                nbytes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.array(nbytes, dtype="Int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_images(
    media: DataFrame, max_side: int = 256, use_real_codec: bool = False
) -> DataFrame:
    """Image resize stage: images above ``max_side`` are scaled down
    (aspect preserved, integer floor), payload re-encoded.

    The geometry math is real; the pixel work is the stubbed codec
    boundary (``decode_stub``) — in tests a deterministic fake re-encode
    (sha256 of payload + target dims) stands in, so the Spark plumbing
    (schema, filtering to images, batch iteration) is testable without
    PIL.  Scale note: output payloads shrink, so this stage REDUCES
    partition size — never repartition before it, do so after if
    downstream needs balance.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [], "payload": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                w, h = meta["width"], meta["height"]
                if payload is None or w is None or h is None:
                    continue  # nothing to resize (payload is nullable)
                scale = max_side / max(w, h) if max(w, h) > max_side else 1.0
                nw, nh = int(w * scale), int(h * scale)
                if use_real_codec:
                    # real path: decode → nearest-neighbor resample →
                    # re-encode (pure stdlib for PNG; stub otherwise)
                    px = real_decode(bytes(payload), meta["mime"])
                    ys = (np.arange(nh) * px.shape[0] // max(1, nh)).clip(
                        0, px.shape[0] - 1
                    )
                    xs = (np.arange(nw) * px.shape[1] // max(1, nw)).clip(
                        0, px.shape[1] - 1
                    )
                    from readwise_vector_db_spark.functions.png import encode_png

                    blob = encode_png(px[np.ix_(ys, xs)])
                else:
                    blob = hashlib.sha256(
                        bytes(payload) + f"{nw}x{nh}".encode()
                    ).digest()
                out["media_id"].append(mid)
                out["width"].append(nw)
                out["height"].append(nh)
                out["payload"].append(blob)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def frame_features(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """The REAL video frame-sampling stage: decode each GIF payload
    (functions/gif.py — pure-stdlib LZW + compositing), walk the
    per-frame delays, keep the first frame at or after each
    ``every_ms`` tick, and emit that frame's pixel-histogram features —
    (media_id, frame_idx, frame_ms, features[16]), one row per sampled
    frame.  The real counterpart of :func:`sample_frames`'s timestamp
    math, at the same fan-out boundary a production pipeline gives
    ffmpeg — and (round 11) ``video/mp4`` payloads DO go to ffmpeg when
    the binary is present (functions/ffmpeg.py: one subprocess per
    video inside this same Arrow stage, the sampling tick pushed into
    the decoder's ``fps`` filter so unsampled frames never cross the
    process boundary; the filter picks the nearest frame per tick
    where the GIF walk picks first-at-or-after — stated, not hidden).
    With ffmpeg absent, and for every other video mime, the decode
    raises the stub's loud ``NotImplementedError`` — fail loudly,
    never garble.  Plan shape either way: ONE Python stage.

    Per-mime output semantics (r11 ADVICE — the difference is real and
    follows from who does the sampling): on the GIF/stdlib path every
    frame crosses the decoder, so ``frame_idx`` is the SOURCE frame
    index and ``frame_ms`` the frame's actual presentation time; on the
    mp4 path sampling happens INSIDE ffmpeg's fps filter and unsampled
    frames never cross the process boundary, so ``frame_idx`` is the
    sample ORDINAL (0..n-1) and ``frame_ms`` the nominal tick
    ``i*every_ms`` — the source index/timestamp of the filter-selected
    frame is not in the rawvideo stream.  Downstream consumers keyed on
    (media_id, frame_ms) ticks are mime-portable; source-frame
    addressing is GIF-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from readwise_vector_db_spark.functions.ffmpeg import (
            decode_mp4_frames,
        )

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "features": []}
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if payload is None:
                    continue
                if meta["mime"] == "video/mp4":
                    frames, stamps = decode_mp4_frames(
                        bytes(payload), every_ms=every_ms
                    )
                    for i in range(frames.shape[0]):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_ms"].append(stamps[i])
                        out["features"].append(
                            [float(x) for x in pixel_features(frames[i])]
                        )
                    continue
                frames, delays = real_decode(bytes(payload), meta["mime"])
                t, next_tick = 0, 0
                for i in range(frames.shape[0]):
                    if t >= next_tick:
                        out["media_id"].append(mid)
                        out["frame_idx"].append(i)
                        out["frame_ms"].append(t)
                        out["features"].append(
                            [float(x) for x in pixel_features(frames[i])]
                        )
                        next_tick += every_ms
                    t += delays[i] if i < len(delays) else 0
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → frame-timestamp explosion (decode stubbed): one output row per
    sampled frame offset, derived from meta.duration_ms — pure column math,
    demonstrating the fan-out stage of a video pipeline."""
    frames = F.sequence(
        F.lit(0),
        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return (
        media.filter((F.col("kind") == "video") & F.col("meta.duration_ms").isNotNull())
        .withColumn("frame_ms", F.explode(frames))
        .select("media_id", "frame_ms")
    )
