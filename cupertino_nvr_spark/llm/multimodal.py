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


# ---------------------------------------------------------------------------
# Decoded-pixel perceptual hash (pHash, Zauner 2010 formulation): decode to
# a 32x32 grayscale raster, 2-D DCT-II, keep the top-left 8x8 low-frequency
# block, threshold each coefficient against the block's lower median -> 64
# bits. The decode here is the container's deterministic synthetic stand-in
# (code points sampled at length-proportional character positions — swap in
# a real `PIL.Image.open(...).convert('L').resize((32, 32))` in production);
# everything AFTER decode is the real pHash pipeline, run in exact integer
# arithmetic (a fixed-point DCT basis) so a SQL oracle can replay the hash
# bit-for-bit.

PHASH_RASTER = 32  # decode target: 32x32 grayscale
PHASH_BLOCK = 8  # low-frequency DCT block kept: 8x8 = 64 bits
PHASH_DCT_SCALE = 10_000  # fixed-point basis scale (exact int64 end-to-end)


def _dct_basis_int() -> list[list[int]]:
    """PHASH_BLOCK x PHASH_RASTER fixed-point DCT-II basis:
    C[k][n] = round(cos(pi * (2n+1) * k / (2 * RASTER)) * SCALE).
    Computed once per process and baked into BOTH the Arrow kernel and the
    generated oracle SQL as integer literals, so the two engines replay the
    identical integer transform."""
    import math

    return [
        [
            round(
                math.cos(math.pi * (2 * n + 1) * k / (2 * PHASH_RASTER))
                * PHASH_DCT_SCALE
            )
            for n in range(PHASH_RASTER)
        ]
        for k in range(PHASH_BLOCK)
    ]


DCT_BASIS_INT = _dct_basis_int()

PHASH_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType(), False)]
    + [T.StructField(f"band{b}", T.LongType(), True) for b in range(4)]
)


def phash_pixel_spec(payload: str | None) -> tuple[int, int, int, int]:
    """Row-at-a-time SPEC of the decoded-pixel pHash (the vectorized
    kernel in ``phash_pixel_hashes`` is asserted equal in
    tests/test_multimodal_kernel.py): synthetic decode -> integer DCT ->
    median threshold -> 4 x 16-bit bands."""
    n = PHASH_RASTER * PHASH_RASTER
    length = len(payload) if payload else 0
    pix = [
        (ord(payload[(i * max(length - 1, 0)) // (n - 1)]) if length else 0)
        for i in range(n)
    ]
    c = DCT_BASIS_INT
    u = [
        [
            sum(
                c[k][r] * pix[r * PHASH_RASTER + col]
                for r in range(PHASH_RASTER)
            )
            for col in range(PHASH_RASTER)
        ]
        for k in range(PHASH_BLOCK)
    ]
    t = [
        [
            sum(c[kk][col] * u[k][col] for col in range(PHASH_RASTER))
            for kk in range(PHASH_BLOCK)
        ]
        for k in range(PHASH_BLOCK)
    ]
    flat = [t[k][kk] for k in range(PHASH_BLOCK) for kk in range(PHASH_BLOCK)]
    med = sorted(flat)[31]  # lower median of the 64 coefficients
    bits = [1 if x > med else 0 for x in flat]
    return tuple(
        sum(bits[b * 16 + j] << j for j in range(16)) for b in range(4)
    )


def phash_pixel_hashes(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> (media_id, band0..band3): the decoded-pixel
    pHash as ONE Arrow-batched ``mapInPandas`` stage.

    Per batch the kernel is pure numpy int64: every payload's code points
    land in one concatenated buffer, a fancy-index gather builds the
    (n, 32, 32) raster stack, and the DCT is two integer matmuls
    (C @ P @ C^T, only the 8 low-frequency rows of C — the 32x32
    coefficient matrix never materializes). No per-row Python loop; the
    hash is embarrassingly parallel and the expensive banded-join half of
    near-dup stays JVM-side downstream.
    """

    def kernel(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        c8 = np.asarray(DCT_BASIS_INT, dtype=np.int64)
        n = PHASH_RASTER * PHASH_RASTER
        idx = np.arange(n, dtype=np.int64)
        pow16 = (1 << np.arange(16, dtype=np.int64)).astype(np.int64)

        for pdf in batches:
            payloads = pdf["payload"].fillna("")
            lens = payloads.str.len().to_numpy(dtype=np.int64)
            joined = "".join(payloads)
            codes = (
                np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
                .astype(np.int64)
                if joined
                else np.zeros(0, dtype=np.int64)
            )
            offsets = np.zeros(len(pdf), dtype=np.int64)
            np.cumsum(lens[:-1], out=offsets[1:])
            # per-row sample positions: i-th pixel reads the character at
            # floor(i * (len-1) / (n-1)) — identical to the oracle's
            # substr arithmetic; empty payloads raster to all-zero
            span = np.maximum(lens - 1, 0)
            if len(codes) == 0:  # whole batch empty/null: all-zero rasters
                pix = np.zeros(
                    (len(pdf), PHASH_RASTER, PHASH_RASTER), dtype=np.int64
                )
            else:
                pos = offsets[:, None] + (idx[None, :] * span[:, None]) // (
                    n - 1
                )
                pix = np.where(
                    (lens > 0)[:, None],
                    codes[np.minimum(pos, len(codes) - 1)],
                    0,
                ).reshape(len(pdf), PHASH_RASTER, PHASH_RASTER)
            u = np.matmul(c8, pix)  # (n, 8, 32) int64
            t = np.matmul(u, c8.T)  # (n, 8, 8) int64
            flat = t.reshape(len(pdf), 64)
            med = np.sort(flat, axis=1)[:, 31]
            bits = (flat > med[:, None]).astype(np.int64)
            out = {"media_id": pdf["media_id"].values}
            for b in range(4):
                out[f"band{b}"] = bits[:, b * 16 : (b + 1) * 16] @ pow16
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, PHASH_SCHEMA)


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
