"""Skew mitigation: salted equi-join (SURVEY §7.4, 100 TB posture).

A shuffled equi-join puts every row of a hot key on one reducer; at 100 TB
a single viral ``source_id``/``user_id`` stalls the stage. AQE's skew-join
splitting (on in ``session.get_spark``) handles sort-merge cases at
runtime; explicit salting is the declarative fallback that also covers
aggregate-free hash joins and pre-AQE engines:

- fact side: append ``_salt = pmod(hash(<salt source>), n)`` — the hot key
  spreads over ``n`` reducers
- dim side: explode ``n`` copies, one per salt value
- join on (key, _salt) — same answer, ``n``-way parallel hot keys, dim side
  inflated by ``n`` (only viable when dim ≪ fact, the skew case by
  definition)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, salt_from: list[str] | None = None) -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of ``salt_from`` columns
    (default: all columns — unique-ish rows spread uniformly)."""
    cols = [F.col(c) for c in (salt_from or df.columns)]
    return df.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int"))


def explode_salt(df: DataFrame, n_salts: int) -> DataFrame:
    """Dim-side replication: one copy of every row per salt value."""
    # sequence of int literals explodes directly to int; a cast around a
    # generator is unsupported (UNSUPPORTED_GENERATOR.NESTED_IN_EXPRESSIONS)
    return df.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join spread over ``n_salts`` reducers per key.

    Result is identical to ``fact.join(dim, on, how)`` for inner/left joins
    (each fact row carries exactly one salt and meets exactly one replica
    of its dim row).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    f = with_salt(fact, n_salts, salt_from)
    d = explode_salt(dim, n_salts)
    return f.join(d, on=[*on, "_salt"], how=how).drop("_salt")


__all__ = ["with_salt", "explode_salt", "salted_join"]
