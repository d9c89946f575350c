"""Multimodal (image/audio/video) column plumbing.

Design: media is carried as an opaque ``BINARY`` column plus a typed
metadata struct — the schema, partitioning and Arrow-batched UDF
plumbing are real and tested; only the codec call itself is stubbed
(the image/audio libraries are not in this container).

- ``attach_media``         — wrap a source column into (media BINARY,
  media_meta STRUCT<mime,n_bytes,checksum>)
- ``decode_media``         — mapInPandas decode stage; with
  ``use_real_codec=True`` raises NotImplementedError at the exact
  point a PIL/ffmpeg call belongs; the default deterministic fake
  derives width/height/n_frames from the bytes so the pipeline is
  end-to-end testable and oracle-checkable.
- ``resize_meta``          — pure-metadata resize (aspect-preserving)
- ``sample_frames``        — frame sampling for "video": splits the
  byte payload into fixed-size frame chunks and explodes every k-th —
  the real plumbing shape (one row in, N rows out) with a fake codec.

Scale posture: media bytes never pass through Python row-at-a-time;
mapInPandas moves whole Arrow batches, and all pure-metadata ops are
JVM expressions.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media(df: DataFrame, source_col: str = "text", id_col: str = "doc_id", mime: str = "image/fake") -> DataFrame:
    """Pack a source column into the opaque-binary + typed-metadata shape."""
    media = F.col(source_col).cast("binary")
    return df.select(
        F.col(id_col),
        media.alias("media"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(media).cast("long").alias("n_bytes"),
            F.md5(media).alias("checksum"),
        ).alias("media_meta"),
    )


def fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image/video codec: dimensions
    derived from the payload length.  REPLACE with PIL/ffmpeg when
    available."""
    n = len(payload)
    width = 16 + (n % 320)
    height = 16 + ((n // 7) % 240)
    n_frames = 1 + (n % 8)
    return width, height, n_frames


def decode_media(df: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched decode stage over (doc_id, media) — the mapInPandas
    signature a real codec plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_codec:
                # OPTIONAL-DEPENDENCY real decode: used when pillow is
                # installed, NotImplementedError at this marked seam
                # when it isn't (this container ships no PIL/ffmpeg) —
                # the contract test passes either way.
                try:
                    from PIL import Image  # noqa: PLC0415
                except ImportError as exc:
                    raise NotImplementedError(
                        "real media codecs unavailable; install pillow "
                        "(images) / ffmpeg (video) to enable this path"
                    ) from exc
                import io

                def real_decode(b) -> tuple:
                    with Image.open(io.BytesIO(bytes(b))) as im:
                        return im.size[0], im.size[1], getattr(im, "n_frames", 1)

                decoded = pdf["media"].map(real_decode)
            else:
                decoded = pdf["media"].map(lambda b: fake_decode(bytes(b)))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )
            yield out

    return df.select("doc_id", "media").mapInPandas(batches, schema=DECODED_SCHEMA)


def resize_meta(decoded: DataFrame, max_side: int = 64) -> DataFrame:
    """Aspect-preserving resize as pure metadata arithmetic (JVM-side)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.lit(1), F.floor(F.col("width") * scale)).cast("int").alias("out_width"),
        F.greatest(F.lit(1), F.floor(F.col("height") * scale)).cast("int").alias("out_height"),
    )


def sample_frames(df: DataFrame, frame_bytes: int = 64, every_k: int = 4) -> DataFrame:
    """Treat the payload as a frame sequence; emit every k-th frame chunk.
    One row in → N rows out via posexplode — the real frame-sampling
    plan shape (narrow, no shuffle)."""
    n_frames = F.ceil(F.octet_length("media") / F.lit(frame_bytes)).cast("int")
    frame_idx = F.filter(
        F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
        lambda i: i % every_k == 0,
    )
    return (
        df.select("doc_id", "media", F.posexplode(frame_idx).alias("pos", "frame_no"))
        .select(
            "doc_id",
            "frame_no",
            F.substring(F.col("media"), F.col("frame_no") * frame_bytes + 1, frame_bytes).alias("frame"),
        )
        .withColumn("frame_bytes", F.octet_length("frame"))
    )


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.LongType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16, use_real_model: bool = False) -> DataFrame:
    """Feature-extraction stage: (doc_id, media) → (doc_id, features
    ARRAY<BIGINT>[dim]) through the same Arrow-batched mapInPandas
    plumbing a real vision/audio embedding model plugs into.

    The default fake model is deterministic from the payload bytes
    (length + md5 prefix, quantized to [0, 1000)) so the full pipeline
    — decode → features → ANN index — is end-to-end testable and
    oracle-checkable; ``use_real_model=True`` raises at the marked
    integration point (no torch/onnx in this container).

    Scale posture: whole Arrow record batches cross the Python
    boundary once; downstream consumers (knn_join, ivf_knn_join)
    treat the output as any other embedding column.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_model:
                # integration point for a real embedding model (torch /
                # onnxruntime not available in this container)
                raise NotImplementedError(
                    "real feature extractors unavailable; load the model and embed here"
                )
            feats = []
            for b in pdf["media"]:
                raw = bytes(b)
                n = len(raw)
                h = int(hashlib.md5(raw).hexdigest()[:8], 16)
                feats.append([(n * (2 * i + 1) + h * (i + 1)) % 1000 for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "media").mapInPandas(batches, schema=FEATURES_SCHEMA)


def shared_frame_pairs(
    df: DataFrame,
    frame_bytes: int = 64,
    max_frame_df: int | None = None,
) -> DataFrame:
    """Exact frame-level copy detection across media payloads — the
    video/audio analog of content-hash dedup: chunk every payload into
    ``frame_bytes`` frames (:func:`sample_frames` with every frame),
    md5 each frame, and report (doc_a, doc_b, n_shared_frames) for
    every pair sharing at least one identical frame — copied segments,
    re-posted clips, shared intros.  Pairs expand ONLY through the
    frame-hash equi-join (never all-pairs), exactly the banded-LSH
    posture of the text dedup stack; ``max_frame_df`` optionally drops
    ubiquitous frames (black frames, silence) the way the shingle-df
    caps do, trading those pairs for a bounded join fan-out at corpus
    scale.  Zero-length payloads emit no frames (an empty frame is not
    shared content)."""
    fr = (
        sample_frames(df, frame_bytes=frame_bytes, every_k=1)
        .filter(F.col("frame_bytes") > 0)
        .select("doc_id", F.md5(F.col("frame")).alias("fh"))
        .distinct()
    )
    if max_frame_df is not None:
        ok = fr.groupBy("fh").agg(F.count(F.lit(1)).alias("_df")).filter(
            F.col("_df") <= max_frame_df
        )
        fr = fr.join(ok.select("fh"), "fh")
    a = fr.alias("a")
    b = fr.alias("b")
    return (
        a.join(b, "fh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
    )
