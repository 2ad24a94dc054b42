"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

The training-data pipeline pattern at 100 TB: media lives in parquet as
``binary`` columns (or object-store pointers) beside typed metadata; every
decode/feature step is an Arrow-batched ``mapInPandas`` so bytes stream
through Python in columnar batches, never row-at-a-time. Partitioning rule:
media tables are bucketed by content id and processed with
``spark.sql.files.maxPartitionBytes`` tuned down (big rows!), so one Arrow
batch fits executor memory.

The decode kernels themselves (PIL/ffmpeg/soundfile) are NOT available in
this environment — they are STUBBED behind ``_decode_image_stub`` /
``_extract_audio_features_stub`` with deterministic fake outputs, keeping the
Spark-side plumbing (schemas, batch shapes, UDF signatures, partitioning)
real and tested. Swap the stub body for the real library call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),      # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, n_channels int, "
    "payload_sha256 string, embedding array<float>"
)


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rng_bytes = [
                hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8 for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": np.where(ids % 3 == 0, "image",
                                     np.where(ids % 3 == 1, "audio", "video")),
                    "mime": np.where(ids % 3 == 0, "image/png",
                                     np.where(ids % 3 == 1, "audio/wav", "video/mp4")),
                    "payload": rng_bytes,
                    "meta": [{"source": f"s{int(i) % 4}"} for i in ids],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB — stands in for PIL.Image.open(...).size; deterministic from
    payload bytes so tests are stable. Replace with a real decoder."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def extract_image_features(media: DataFrame, embed_dim: int = 16) -> DataFrame:
    """Arrow-batched image feature extraction: one pandas batch in, one out.
    Decode is stubbed; the batch shape, schema, and vectorized hashing are
    the real plumbing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            dims = [_decode_image_stub(p) for p in b["payload"]]
            shas = [hashlib.sha256(p).hexdigest() for p in b["payload"]]
            # deterministic fake embedding: first embed_dim bytes of the sha
            embs = [
                (np.frombuffer(bytes.fromhex(s[: embed_dim * 2]), dtype=np.uint8)
                 .astype(np.float32) / 255.0)
                for s in shas
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_channels": [d[2] for d in dims],
                    "payload_sha256": shas,
                    "embedding": embs,
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n_sec: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into (media_id,
    frame_ts) sample points using metadata duration — pure JVM explode; the
    actual frame grab would be a mapInPandas over this plan joined back to
    payload. Duration here derives from payload size (stub: 1s per KiB)."""
    v = media.where(F.col("kind") == "video").select(
        "media_id",
        (F.length(F.col("payload")) / 1024).cast("int").alias("duration_s"),
    )
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_s") - 1, F.lit(0)),
                       F.lit(every_n_sec))
        ).alias("frame_ts"),
    )


def media_dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact media dedup on payload hash — JVM-side sha2 over binary, no
    Python round-trip."""
    return (
        media.select("media_id", F.sha2(F.col("payload"), 256).alias("payload_sha256"))
        .groupBy("payload_sha256")
        .agg(F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )
