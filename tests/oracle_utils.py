"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and values
order-insensitively (columns sorted by name, rows sorted by all columns).
Floats compare exactly by default — the driver hashes values — with the
max observed delta reported so precision-sensitive queries can be rounded
at the source instead of loosened here.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, str) else v,
                na_action="ignore",
            )
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, kind="mergesort", na_position="last").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, float_ulp_report: bool = True) -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(oracle_pdf)
    assert list(got.columns) == list(exp.columns), f"columns differ: {list(got.columns)} vs {list(exp.columns)}"
    assert len(got) == len(exp), f"row count differs: {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        g_num = pd.api.types.is_numeric_dtype(g) and not pd.api.types.is_bool_dtype(g)
        e_num = pd.api.types.is_numeric_dtype(e) and not pd.api.types.is_bool_dtype(e)
        if g_num and e_num and (
            pd.api.types.is_float_dtype(g) != pd.api.types.is_float_dtype(e)
        ):
            # The driver hashes value representations, so a Spark bigint
            # against a DuckDB HUGEINT (surfaced as float64 by pandas, e.g.
            # un-cast SUM(CASE...)) fails its gate even when the values are
            # numerically identical. Be at least as strict here: require
            # int-kind vs float-kind parity, forcing explicit CASTs in the
            # oracle SQL instead of silently coercing.
            raise AssertionError(
                f"column {c!r}: dtype-kind mismatch — spark={g.dtype} vs "
                f"oracle={e.dtype}; cast the oracle output (e.g. "
                f"CAST(SUM(...) AS BIGINT)) or the Spark side so both agree"
            )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            g = pd.to_numeric(g, errors="coerce").astype(float)
            e = pd.to_numeric(e, errors="coerce").astype(float)
            both_nan = g.isna() & e.isna()
            diff = (g - e).abs()
            bad = ~both_nan & ~(g == e)
            if bad.any():
                md = float(diff[bad].max()) if not diff[bad].isna().all() else math.nan
                raise AssertionError(
                    f"column {c!r}: {int(bad.sum())} float mismatches, max abs diff {md!r}; "
                    f"first: got={g[bad].iloc[0]!r} exp={e[bad].iloc[0]!r}"
                )
        else:
            g = g.astype(str)
            e = e.astype(str)
            bad = g != e
            if bad.any():
                idx = bad[bad].index[0]
                raise AssertionError(
                    f"column {c!r}: {int(bad.sum())} mismatches; first at row {idx}: "
                    f"got={g[idx]!r} exp={e[idx]!r}"
                )
