"""Documents shorter than the shingle width must yield an EMPTY shingle set,
not an ArrayIndexOutOfBoundsException.

Regression for the unguarded ``F.sequence(1, n-(k-1))``, which auto-reverses
to a descending [1, 0] when n < k and makes the shingle lambda index past
the token array (reference near-dup semantics imply zero shingles, matching
the DuckDB oracle's empty range())."""

from __future__ import annotations

from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.dedup import (
    minhash_signature,
    ngram_jaccard_pairs,
    shingle_rows,
    word_shingles,
)

SHORT_DOCS = [
    (1, "", "en"),
    (2, "one", "en"),
    (3, "two words", "en"),
    (4, "exactly three tokens", "en"),
    (5, "four whitespace separated tokens", "en"),
    (6, "   ", "en"),  # whitespace-only
]


def _docs(spark):
    return spark.createDataFrame(SHORT_DOCS, ["doc_id", "text", "lang"])


def test_word_shingles_short_docs(spark):
    rows = (
        _docs(spark)
        .select("doc_id", F.size(word_shingles(F.col("text"), k=3)).alias("n"))
        .collect()
    )
    got = {r["doc_id"]: r["n"] for r in rows}
    # n_shingles = max(n_tokens - 2, 0); distinct can only shrink it
    assert got[1] == 0 and got[2] == 0 and got[3] == 0 and got[6] == 0
    assert got[4] == 1 and got[5] == 2


def test_shingle_rows_short_docs(spark):
    rows = shingle_rows(_docs(spark), shingle_k=3).collect()
    by_doc: dict[int, list[str]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert set(by_doc) == {4, 5}
    assert by_doc[4] == ["exactly three tokens"]
    assert sorted(by_doc[5]) == [
        "four whitespace separated",
        "whitespace separated tokens",
    ]


def test_minhash_and_jaccard_skip_short_docs(spark):
    docs = _docs(spark)
    sigs = minhash_signature(docs, num_hashes=4)
    assert {r["doc_id"] for r in sigs.collect()} == {4, 5}
    # jaccard must run (not crash) and produce no pairs among shingle-less docs
    pairs = ngram_jaccard_pairs(docs, block_col="lang", threshold=0.1).collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert ids <= {4, 5}


def test_aug_offsets_encode_variant_kind():
    """The +1M/+2M/+3M/+4M augmentation strides both encode the variant
    kind and are inverted as doc_id % 1e6 (docs_source_quality_report's
    re-crawl attribution, docs_cluster_bcubed's gold ids): that only
    works while base doc_ids stay under the stride. Pin the invariant on
    the driver's data at every shipped SF so a generator change breaks
    here, loudly, instead of silently mis-joining the attribution."""
    import duckdb

    for sf in ("0.001", "0.01", "0.1"):
        (mx,) = duckdb.sql(
            f"SELECT max(doc_id) FROM '/root/testdata/sf{sf}/documents.parquet'"
        ).fetchone()
        assert mx < 1_000_000, f"sf{sf}: max base doc_id {mx} breaks the aug stride"
