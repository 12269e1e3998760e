"""The vectorized decode kernel must agree with the scalar spec
(_decode_stub) on every edge: None payload, empty payload, 1-byte, long."""

from __future__ import annotations

from cupertino_nvr_spark.llm.multimodal import _decode_stub, decode_features


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
