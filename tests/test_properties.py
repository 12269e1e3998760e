"""Property-based tests (hypothesis) for the pure column functions.

The reference pins these semantics with example tables
(``tests/unit/test_events.py:141-165``, ``test_supervision_integration.py:
24-56``); properties generalize them: round-trips hold for ALL inputs, not
just the listed ones. Columns are exercised through Spark itself (one
createDataFrame per property batch, not per example) so the thing tested
is the real expression, not a Python re-implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cupertino_nvr_spark.functions.geometry import bbox_corners
from cupertino_nvr_spark.functions.protocol import parse_source_id, topic_for_source

SLOW = settings(
    max_examples=8,  # each example costs a Spark job; batch width inside
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SLOW
@given(ids=st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=50))
def test_topic_roundtrip_is_identity(spark, ids):
    """parse(topic_for(id)) == id for every non-negative int32 id
    (protocol.py:11-55 inverse pair)."""
    df = spark.createDataFrame([(i,) for i in ids], "source_id int")
    out = df.select(
        "source_id", parse_source_id(topic_for_source(F.col("source_id"))).alias("back")
    )
    assert out.filter(F.col("back") != F.col("source_id")).count() == 0


@SLOW
@given(
    suffix=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="/"),
        min_size=1,
        max_size=20,
    )
)
def test_topic_parse_non_numeric_yields_null(spark, suffix):
    """Non-integer last segment -> NULL, never an error (protocol.py:49-55)."""
    if suffix.strip().lstrip("+-").isdigit():
        return  # numeric-looking suffixes are the happy path
    df = spark.createDataFrame([(f"nvr/detections/{suffix}",)], "topic string")
    row = df.select(parse_source_id(F.col("topic")).alias("sid")).first()
    assert row["sid"] is None


@SLOW
@given(
    boxes=st.lists(
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(0, 1e6, allow_nan=False),
            st.floats(0, 1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_bbox_corners_invariants(spark, boxes):
    """Corner transform (renderer.py:119-124): width/height recoverable,
    center preserved, x1<=x2, y1<=y2 — for all finite boxes."""
    df = spark.createDataFrame(
        [((x, y, w, h),) for x, y, w, h in boxes],
        "bbox struct<x:double,y:double,width:double,height:double>",
    )
    c = df.select("bbox", bbox_corners(F.col("bbox")).alias("c"))
    bad = c.filter(
        (F.col("c.x2") < F.col("c.x1"))
        | (F.col("c.y2") < F.col("c.y1"))
        # center preservation: w/2 is exact (power-of-two divide) but the
        # adds can round, so compare with a small absolute tolerance
        | (F.abs((F.col("c.x1") + F.col("c.x2")) - 2 * F.col("bbox.x")) > 1e-6)
        | (F.abs((F.col("c.y1") + F.col("c.y2")) - 2 * F.col("bbox.y")) > 1e-6)
    )
    assert bad.count() == 0


@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=0, max_size=300),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=6),
)
def test_misra_gries_invariants(stream, capacity, n_batches):
    """The classical Misra-Gries guarantees must hold for ANY stream,
    capacity, and batching (the batch boundaries are where the mergeable
    reduction runs, so they must not affect the bounds):

    - at most `capacity` counters survive;
    - no estimate exceeds the true count;
    - every estimate is within n/capacity of the true count;
    - any item with true count > n/capacity is retained.
    """
    from collections import Counter

    from cupertino_nvr_spark.streaming.heavy_hitters import mg_merge

    # cut the stream into n_batches contiguous chunks
    size = max(1, len(stream) // n_batches)
    summary: dict[int, int] = {}
    for i in range(0, len(stream), size):
        batch = stream[i : i + size]
        summary = mg_merge(summary, dict(Counter(batch)), capacity)

    true = Counter(stream)
    n = len(stream)
    err = n / capacity
    assert len(summary) <= capacity
    for item, est in summary.items():
        assert est <= true[item]
        assert est >= true[item] - err
    for item, count in true.items():
        if count > err:
            assert item in summary, f"heavy item {item} (count {count}) evicted"


@SLOW
@given(
    toks=st.lists(
        st.integers(min_value=0, max_value=2000), min_size=1, max_size=60
    ),
    seq_len=st.sampled_from([64, 512, 1024]),
)
def test_sequence_packing_invariants(spark, toks, seq_len):
    """The packing plan is a dense concatenation: for ANY token-count
    sequence, (a) offsets are the exact prefix sums mod seq_len (no gaps,
    no overlaps), (b) spans are ceil-consistent with the doc's start and
    length, (c) the final sequence id accounts for every token."""
    from pyspark.sql import Window

    rows = [(i, 0, t) for i, t in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, shard long, n_tok long")
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = df.withColumn("tok_before", F.sum("n_tok").over(w) - F.col("n_tok"))
    out = c.select(
        "doc_id",
        "n_tok",
        "tok_before",
        F.expr(f"tok_before div {seq_len}").alias("seq_id"),
        (F.col("tok_before") % seq_len).alias("seq_offset"),
        (
            F.expr(f"(tok_before + n_tok - 1) div {seq_len}")
            - F.expr(f"tok_before div {seq_len}")
            + F.lit(1)
        ).alias("n_seqs_spanned"),
    ).collect()
    out.sort(key=lambda r: r.doc_id)
    prefix = 0
    for r in out:
        assert r.tok_before == prefix
        assert r.seq_id == prefix // seq_len
        assert r.seq_offset == prefix % seq_len
        if r.n_tok > 0:
            expect_span = (prefix + r.n_tok - 1) // seq_len - prefix // seq_len + 1
            assert r.n_seqs_spanned == expect_span
        prefix += r.n_tok
    assert prefix == sum(toks)
