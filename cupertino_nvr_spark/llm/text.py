"""Text-analysis operators for LLM data pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — no Python
UDFs in any hot path. Each operator is a Column builder so callers compose
them into one projection; the registered queries in ``plans/llm.py`` pair
them with DuckDB oracles.

Operators: tokenization (whitespace + BPE-ish regex), token/char stats,
stopword-based language ID, quality scoring, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deterministic and SQL-expressible; at 100 TB this would be a
# broadcast dimension of (lang, stopword) instead of literals.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ein"],
    "fr": ["le", "la", "et", "un", "des"],
    "es": ["el", "la", "los", "y", "un"],
    "zh": ["de", "le", "shi", "he", "zai"],
}

# BPE-ish token pattern: letter runs, digit runs, or single punctuation.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization (collapses runs; no empty tokens)."""
    return F.split(F.trim(text), r"\s+")


def regex_tokens(text: Column) -> Column:
    """BPE-ish tokenization: letters / digits / punctuation split."""
    return F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0)


def token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def stopword_count(text: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(
        F.filter(ws_tokens(text), lambda t: F.lower(t).isin(*words))
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {lang: stopword_count(text, lang) for lang in STOPWORDS}


def predict_lang(text: Column) -> Column:
    """argmax over per-language stopword hits; deterministic tiebreak by
    language code, 'und' (undetermined) when no stopwords hit at all."""
    scores = lang_scores(text)
    best = None
    for lang in sorted(scores):  # ties resolve to lexicographically-first
        cond = F.lit(True)
        for other in sorted(scores):
            if other < lang:
                cond = cond & (scores[lang] > scores[other])
            elif other > lang:
                cond = cond & (scores[lang] >= scores[other])
        this = F.when((scores[lang] > 0) & cond, F.lit(lang))
        best = this if best is None else F.coalesce(best, this)
    return F.coalesce(best, F.lit("und"))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation-ish (non-alnum, non-space)."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.length(text)


def upper_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[^A-Z]", "")
    return F.length(stripped) / F.length(text)


def avg_token_len(text: Column) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total / F.size(toks)


def quality_score(text: Column, lang: Column) -> Column:
    """Heuristic document-quality score in [0, 1]:
    length factor x stopword presence x (1 - punctuation noise).

    Mirrors the usual pretraining-filter recipe (length/punct/stopword
    ratios); every term is exact integer arithmetic over counts except the
    final double products, which are IEEE-deterministic.
    """
    n_tok = token_count(text)
    len_factor = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    sw_en = stopword_count(text, "en")
    sw_factor = F.least(sw_en / F.lit(5.0), F.lit(1.0))
    noise = punct_ratio(text)
    return len_factor * sw_factor * (1.0 - noise)


def fingerprint(text: Column) -> Column:
    """Canonical document fingerprint: md5 of lowercased,
    whitespace-collapsed text."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)


def chunk_spans(toks: Column, stride: int) -> Column:
    """Token start offsets of the overlapping chunk windows covering a
    tokenized document: 0, stride, 2*stride, … while the start lands
    inside the document. Every token belongs to at least one chunk;
    consecutive chunks of size > stride share ``size - stride`` tokens
    of overlap."""
    return F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
    )


def max_token_run_frac(t: Column) -> Column:
    """Most-frequent-token fraction via one sort + run-length pass.

    Max token multiplicity = longest equal-run in the SORTED token array:
    O(n log n) per doc, vs the naive per-distinct-token rescan whose
    O(n·|vocab|) dominates on long low-diversity docs. Shared by the
    repetition-quality query and the curation report so the gate can't
    drift between them.
    """
    return (
        F.aggregate(
            F.array_sort(t),
            F.struct(
                F.lit(0).alias("best"),
                F.lit(0).alias("run"),
                F.lit(None).cast("string").alias("prev"),
            ),
            lambda acc, x: F.struct(
                F.greatest(
                    acc.best,
                    F.when(x.eqNullSafe(acc.prev), acc.run + 1).otherwise(F.lit(1)),
                ).alias("best"),
                F.when(x.eqNullSafe(acc.prev), acc.run + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                x.alias("prev"),
            ),
            lambda acc: acc.best,
        )
        / F.size(t)
    )


def repetition_gate(t: Column, g2: Column) -> Column:
    """The Gopher-style repetition pass/fail gate: distinct-token ratio
    >= 0.2, top-token fraction <= 0.2, duplicate-2-gram ratio <= 0.6."""
    distinct_ratio = F.size(F.array_distinct(t)) / F.size(t)
    dup2 = F.when(F.size(g2) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(g2)) / F.size(g2)
    )
    return (
        (distinct_ratio >= 0.2) & (max_token_run_frac(t) <= 0.2) & (dup2 <= 0.6)
    )
