"""Exact-substring dedup EXCISION — the action half of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better"): every
k-token window duplicated across documents is removed from every
document containing it, by merging each doc's duplicated windows into
maximal excision islands (interval union) and cutting those islands out
of the token stream.

This module is the single source for the chain: the registered plans
(``docs_substring_excise_plan``, ``docs_substring_excised_stats``) and
the materializer (``excise_materialize``) all build from
``excision_islands`` / ``apply_excision``, so the plan a user inspects
and the corpus the writer produces can never drift.

Scale shape: detection is the gram-digest groupBy + semi join (map-side
combined, digest-partitioned — O(k * total_tokens) rows, no all-pairs
stage); the interval-union window is partitioned per doc over its
duplicated windows only; excision itself is a per-row higher-order
filter over the token array (zero shuffles). One excision pass can
create NEW cross-doc duplicates (removing a span joins its flanks), so
``excise_materialize`` iterates detect→excise to the Lee et al.
fixpoint — each round costs one detection chain over the shrinking
corpus, and real corpora converge in 1-2 rounds.

Reference analog: none (north-star §2.11 dedup family; detection twin
``docs_substring_dup_spans`` in plans/llm.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cupertino_nvr_spark.llm.text import ws_tokens


def _dup_windows(
    toks: DataFrame, id_col: str, k: int, seed: int = 11
) -> DataFrame:
    """(id, toks[lowered]) -> the (id, s, e) duplicated k-token windows:
    every window whose gram digest occurs in >1 distinct doc."""
    from cupertino_nvr_spark.llm.dedup import md5_int

    spans = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    from cupertino_nvr_spark.operators.checkpoint import reliable_checkpoint

    # r14: the gram table feeds BOTH the duplicated-digest aggregate and
    # the left side of the semi join, and Spark cannot CSE across the
    # two arms — the explode + per-window md5 (the detection chain's
    # dominant CPU) ran twice per detection. Materialize it once
    # (~24 bytes per window — the same order as the token stream, the
    # structure an exact-substring dedup materializes anyway per Lee et
    # al.'s suffix-array formulation); both consumers then read the
    # checkpointed rows.
    grams = reliable_checkpoint(
        toks.select(id_col, F.explode(spans).alias("pos"), "toks").select(
            id_col,
            "pos",
            md5_int(
                F.array_join(F.slice("toks", F.col("pos"), k), " "), seed=seed
            ).alias("gram"),
        )
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gram")
    )
    return grams.join(dup, "gram", "left_semi").select(
        id_col, F.col("pos").alias("s"), (F.col("pos") + k - 1).alias("e")
    )


def excision_islands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Maximal excision islands per doc: duplicated k-token windows merged
    by interval union (overlapping or adjacent windows coalesce) via the
    classic sorted running-max-end window — a window starting past
    (previous max end + 1) opens a new island. Detection tokenizes
    lower(trim(text)) on whitespace; positions are 1-based token indices
    (identical for the original-case token stream, since lowering never
    moves a whitespace boundary).

    Output: (id_col, island_idx, start_tok, end_tok, island_len,
    n_windows)."""
    toks = docs.select(
        id_col, ws_tokens(F.lower(F.trim(F.col(text_col)))).alias("toks")
    )
    iv = _dup_windows(toks, id_col, k)
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        id_col,
        "s",
        "e",
        F.when(F.max("e").over(wprev) >= F.col("s") - 1, F.lit(0))
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    wrun = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    isl = flagged.select(
        id_col, "s", "e", F.sum("new_island").over(wrun).alias("island_idx")
    )
    return isl.groupBy(
        id_col, F.col("island_idx").cast("int").alias("island_idx")
    ).agg(
        F.min("s").cast("bigint").alias("start_tok"),
        F.max("e").cast("bigint").alias("end_tok"),
        (F.max("e") - F.min("s") + 1).cast("bigint").alias("island_len"),
        F.count("*").alias("n_windows"),
    )


def apply_excision(
    docs: DataFrame,
    islands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut each doc's excision islands out of its token stream. Tokens are
    the original-case whitespace tokens (positions align with the
    lowered detection tokenization); the excised text re-joins the kept
    tokens with single spaces, so whitespace runs are normalized — the
    standard loss of a token-level dedup pass, documented rather than
    hidden.

    Output: every input doc (islands or not) with (id_col, text_col
    [excised], n_tokens_before, n_removed, n_tokens_after) plus every
    other input column untouched."""
    cuts = islands.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("start_tok").alias("s"), F.col("end_tok").alias("e"))
        ).alias("cuts")
    )
    other_cols = [c for c in docs.columns if c not in (id_col, text_col)]
    toks = F.col("_toks")
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (i + 1 >= c["s"]) & (i + 1 <= c["e"]),
        ),
    )
    return (
        docs.join(cuts, id_col, "left")
        .select(
            id_col,
            *other_cols,
            ws_tokens(F.trim(F.col(text_col))).alias("_toks"),
            F.coalesce(
                F.col("cuts"),
                F.array().cast("array<struct<s:bigint,e:bigint>>"),
            ).alias("_cuts"),
        )
        .select(
            id_col,
            *other_cols,
            F.col("_toks").alias("_toks"),
            kept.alias("_kept"),
        )
        .select(
            id_col,
            F.array_join("_kept", " ").alias(text_col),
            *other_cols,
            F.size("_toks").cast("bigint").alias("n_tokens_before"),
            (F.size("_toks") - F.size("_kept"))
            .cast("bigint")
            .alias("n_removed"),
            F.size("_kept").cast("bigint").alias("n_tokens_after"),
        )
    )


def excise_materialize(
    docs: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    fmt: str = "parquet",
    max_rounds: int = 5,
) -> list[dict]:
    """Iterate detect→excise to the Lee et al. fixpoint (no k-token window
    in the written corpus is duplicated across docs — one pass is NOT
    enough in general, because removing a span joins its flanks into
    windows that may match elsewhere), then write the excised corpus.

    Returns the per-round log: [{round, n_docs_cut, n_islands,
    n_tokens_removed}, ...] — empty when the input was already
    duplicate-free. Each round checkpoints the shrunken corpus so round
    r+1's detection reads a materialized frame instead of replaying the
    whole excision lineage. ``max_rounds`` counts EXCISION passes, so
    convergence takes up to ``max_rounds + 1`` detections — the final
    detection credits a corpus that converged on the last allowed cut
    (r10 advisor note). Raises RuntimeError if the corpus still holds
    duplicated windows after ``max_rounds`` cuts — a loud failure beats
    silently shipping a corpus that still contains duplicated spans."""
    from cupertino_nvr_spark.operators.checkpoint import reliable_checkpoint

    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    corpus = docs
    rounds: list[dict] = []
    # max_rounds + 1 detections bracket max_rounds excisions: detect,
    # cut if dirty, and let the NEXT detection judge the cut — including
    # the max_rounds-th one
    for rnd in range(1, max_rounds + 2):
        islands = excision_islands(corpus, id_col, text_col, k)
        agg = islands.agg(
            F.count("*").alias("n_islands"),
            F.count_distinct(id_col).alias("n_docs_cut"),
            F.sum("island_len").alias("n_tokens_removed"),
        ).collect()[0]
        if not agg["n_islands"]:
            corpus.write.format(fmt).mode("overwrite").save(out_dir)
            return rounds
        if rnd > max_rounds:
            break
        rounds.append(
            {
                "round": rnd,
                "n_docs_cut": int(agg["n_docs_cut"]),
                "n_islands": int(agg["n_islands"]),
                "n_tokens_removed": int(agg["n_tokens_removed"]),
            }
        )
        corpus = reliable_checkpoint(
            apply_excision(corpus, islands, id_col, text_col).drop(
                "n_tokens_before", "n_removed", "n_tokens_after"
            )
        )
    raise RuntimeError(
        f"excise_materialize: no fixpoint after {max_rounds} rounds"
    )


__all__ = [
    "excision_islands",
    "apply_excision",
    "excise_materialize",
]
