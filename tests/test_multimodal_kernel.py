"""The vectorized decode kernel must agree with the scalar spec
(_decode_stub) on every edge: None payload, empty payload, 1-byte, long.
Same contract for the decoded-pixel pHash: the numpy-matmul Arrow kernel
must agree with the scalar integer-DCT spec on every edge."""

from __future__ import annotations

from cupertino_nvr_spark.llm.multimodal import (
    _decode_stub,
    decode_features,
    phash_pixel_hashes,
    phash_pixel_spec,
)


def test_kernel_matches_scalar_spec(spark):
    rows = [
        (1, "image", b"hello world", None, None, None, None),
        (2, "audio", b"", None, None, None, None),
        (3, "video", None, None, None, None, None),
        (4, "image", b"\x00", None, None, None, None),
        (5, "image", bytes(range(256)) * 40, None, None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms double",
    )
    got = {r["media_id"]: r.asDict() for r in decode_features(media).collect()}
    for media_id, _kind, payload, *_ in rows:
        want = _decode_stub(payload)
        g = got[media_id]
        assert g["payload_bytes"] == want["payload_bytes"], media_id
        assert g["first_byte"] == want["first_byte"], media_id
        assert g["byte_checksum"] == want["byte_checksum"], media_id


def test_phash_pixel_kernel_matches_scalar_spec(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 8),
        (2, ""),  # empty payload: all-zero raster, all coefficients equal
        (3, None),  # null payload treated as empty
        (4, "x"),  # 1-char: constant raster
        (5, "ab"),
        (6, "Üñïçödé çhàracters beyond ASCII 中文 " * 30),
        (7, "the quick brown fox jumps over the lazy dog " * 8),  # dup of 1
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload string")
    got = {r["media_id"]: r for r in phash_pixel_hashes(media).collect()}
    for media_id, payload in rows:
        want = phash_pixel_spec(payload)
        g = got[media_id]
        assert tuple(g[f"band{b}"] for b in range(4)) == want, media_id
    # identical payloads -> identical 64-bit hash (Hamming 0 downstream)
    assert all(got[1][f"band{b}"] == got[7][f"band{b}"] for b in range(4))


def test_phash_pixel_locality(spark):
    """Perceptual property the byte-surrogate lacks: a small localized
    edit flips only near-median bits — far fewer than half of 64 — while
    an unrelated payload lands near the 32-bit expectation."""
    base = "the quick brown fox jumps over the lazy dog " * 10
    edited = "The Quick" + base[9:]  # small cased edit at the front
    unrelated = "completely different payload with other words entirely " * 9
    hb = phash_pixel_spec(base)
    he = phash_pixel_spec(edited)
    hu = phash_pixel_spec(unrelated)

    def hamming(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    assert hamming(hb, he) <= 10, hamming(hb, he)
    assert hamming(hb, hu) >= 16, hamming(hb, hu)
