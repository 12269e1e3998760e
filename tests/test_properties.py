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


# pure Python kernels backing the Arrow-batched iterative operators —
# no Spark session needed, so these run at full hypothesis width


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_mmr_select_is_greedy_optimal_each_round(data):
    """Every pick must be the argmax of lam*rel - (1-lam)*max-sim over
    the remaining candidates (ties to the smallest id), verified
    directly against the definition for random candidate sets."""
    from cupertino_nvr_spark.plans.llm import mmr_select

    n = data.draw(st.integers(min_value=1, max_value=10))
    ids = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=10**6),
            min_size=n, max_size=n, unique=True,
        )
    )
    sim6 = st.floats(
        min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
    ).map(lambda x: round(x, 6))
    rel = {i: data.draw(sim6) for i in ids}
    psim = {}
    for a in ids:
        for b in ids:
            if a < b:
                p = data.draw(sim6)
                psim[(a, b)] = p
                psim[(b, a)] = p
    out = mmr_select(rel, psim, lam=0.7, k=5)
    assert len(out) == min(5, n)
    assert [r for *_, r in out] == list(range(1, len(out) + 1))
    picked: list[int] = []
    for cid, r, score, rank in out:
        assert r == rel[cid]
        best = None
        for c in sorted(rel):
            if c in picked:
                continue
            ms = max((psim[(c, s)] for s in picked), default=None)
            sc = 0.7 * rel[c] if ms is None else 0.7 * rel[c] - 0.3 * ms
            if best is None or sc > best[1]:
                best = (c, sc)
        assert (cid, score) == best, (rank, picked)
        picked.append(cid)


@settings(max_examples=200, deadline=None)
@given(data=st.data())
def test_markov_absorb_conserves_mass_and_conv_monotone(data):
    """For any row-stochastic chain with absorbing __conv__/__null__:
    total mass stays 1 within the 12-dp rounding drift, the __conv__
    mass is non-decreasing in rounds (absorbing), and masses are
    non-negative."""
    from cupertino_nvr_spark.plans.temporal import markov_absorb

    states = ["__start__"] + data.draw(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1, max_size=5, unique=True,
        )
    )
    targets = states[1:] + ["__conv__", "__null__"]
    edges: list[tuple[str, str, float]] = []
    for f in states:
        # random positive weights -> normalized row-stochastic row
        w = [
            data.draw(st.integers(min_value=0, max_value=100))
            for _ in targets
        ]
        if sum(w) == 0:
            w[-1] = 1
        tot = sum(w)
        for t, wi in zip(targets, w):
            if wi:
                edges.append((f, t, round(wi / tot, 9)))
    edges.append(("__conv__", "__conv__", 1.0))
    edges.append(("__null__", "__null__", 1.0))
    prev_conv = 0.0
    for rounds in (1, 4, 8, 16):
        mass = markov_absorb(edges, rounds=rounds)
        assert all(m >= 0.0 for m in mass.values())
        # per-round drift: <= #edges * 1e-12 rounding + row-sum rounding
        tol = rounds * (len(edges) + 20) * 1e-9
        assert abs(sum(mass.values()) - 1.0) <= tol
        conv = mass.get("__conv__", 0.0)
        assert conv >= prev_conv - 1e-12
        prev_conv = conv


@settings(max_examples=200, deadline=None)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=10**6), min_size=10, max_size=10),
    ref=st.lists(st.integers(min_value=0, max_value=10**6), min_size=10, max_size=10),
)
def test_psi_rows_nonneg_and_total_is_sum(counts, ref):
    """PSI contributions are individually non-negative for ANY count
    vectors (the (p-q) and ln(p/q) factors share sign), the total is
    their sum, and counts echo the inputs."""
    from cupertino_nvr_spark.streaming.drift import _psi_rows

    rows = _psi_rows("t", [float(i) for i in range(9)], ref, sum(ref), counts)
    assert len(rows) == 10
    assert [r[3] for r in rows] == counts
    assert [r[2] for r in rows] == ref
    assert all(r[6] >= 0.0 for r in rows)
    total = {r[7] for r in rows}
    assert len(total) == 1
    assert abs(total.pop() - round(sum(r[6] for r in rows), 6)) <= 1e-5
