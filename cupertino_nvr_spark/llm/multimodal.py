"""Multimodal column conventions: opaque binary payloads + typed metadata.

Media travel as ``binary`` columns with a typed metadata struct
(``schemas.MEDIA_SCHEMA``); transforms run as Arrow-batched pandas
iterators over ``mapInPandas`` so payload bytes never round-trip through
Python row objects. Decode-to-pixels/samples requires codec libraries that
are absent in this container, so the decode kernel is STUBBED with a
deterministic byte-level fake — the Spark-side plumbing (schema, batch
iteration, partitioning) is real and tested; swap ``_decode_stub`` for a
real PIL/ffmpeg call in production.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:  # pandas only inside the UDF at runtime
    import pandas as pd

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("byte_checksum", T.LongType(), True),
    ]
)


def _decode_stub(payload: bytes | None) -> dict:
    """Deterministic fake 'decode': byte-level features standing in for a
    real image/audio decoder (NotImplemented in this container). This is
    the row-at-a-time SPEC; ``decode_features``'s kernel is its vectorized
    equivalent (asserted equal in tests/test_multimodal_kernel.py)."""
    if payload is None:
        return {"payload_bytes": None, "first_byte": None, "byte_checksum": None}
    return {
        "payload_bytes": len(payload),
        "first_byte": payload[0] if payload else None,
        "byte_checksum": sum(payload) % 1_000_003,
    }


def decode_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps each partition a stream of pandas batches —
    payloads stay in Arrow buffers until the kernel touches them, and the
    output schema is fixed so downstream plans don't depend on the kernel.
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            # vectorized byte features: the batch's payloads become ONE
            # concatenated buffer, features come from reduceat over the
            # offsets — C-speed per batch, no per-row Python loop (the
            # shape a real decode kernel should follow: batch in, batch out)
            lens = payloads.map(lambda b: len(b) if b is not None else -1).to_numpy(
                dtype=np.int64
            )
            valid = lens >= 0
            nonempty = lens > 0

            first = np.full(len(pdf), -1, dtype=np.int64)
            sums = np.zeros(len(pdf), dtype=np.int64)
            if nonempty.any():
                buf = np.frombuffer(
                    b"".join(payloads[nonempty]), dtype=np.uint8
                ).astype(np.int64)
                offsets = np.zeros(int(nonempty.sum()), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=offsets[1:])
                first[nonempty] = buf[offsets]
                sums[nonempty] = np.add.reduceat(buf, offsets)

            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload_bytes": pd.array(lens, dtype="Int64"),
                    "first_byte": pd.array(first, dtype="Int64"),
                    "byte_checksum": pd.array(sums % 1_000_003, dtype="Int64"),
                }
            )
            out.loc[~valid, ["payload_bytes", "byte_checksum"]] = pd.NA
            out.loc[first < 0, "first_byte"] = pd.NA
            yield out[[f.name for f in FEATURE_SCHEMA.fields]]

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: float = 1000.0) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one row per frame to
    sample, computed from metadata only (no decode): JVM-side sequence/
    explode, so the expensive decode fans out across executors with the
    sampled frame list already partitioned."""
    n_frames = F.greatest(
        F.ceil(F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        )
        .withColumn("sample_at_ms", F.col("frame_idx") * F.lit(every_ms))
    )


def resize_letterbox_plan(media: DataFrame, target: int = 224) -> DataFrame:
    """Letterbox-resize *plan* for image payloads: aspect-preserving scale
    into a ``target`` x ``target`` canvas plus centering pads, computed
    from metadata only (no decode) — the planning half of a ViT-style
    preprocessing stage, with the pixel work left to the decode kernels.
    The scale is rounded to 6 before the dimension arithmetic so every
    derived integer (dst dims, pads) is bit-identical across engines.
    """
    t = F.lit(float(target))
    scale = F.round(
        F.least(t / F.col("width"), t / F.col("height")), 6
    )
    dst_w = F.floor(F.col("width") * scale).cast("int")
    dst_h = F.floor(F.col("height") * scale).cast("int")
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        F.col("width").alias("src_w"),
        F.col("height").alias("src_h"),
        scale.alias("scale"),
        dst_w.alias("dst_w"),
        dst_h.alias("dst_h"),
        F.floor((F.lit(target) - dst_w) / 2).cast("int").alias("pad_left"),
        F.floor((F.lit(target) - dst_h) / 2).cast("int").alias("pad_top"),
    )
