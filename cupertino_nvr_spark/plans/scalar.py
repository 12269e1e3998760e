"""Scalar-function surface queries (SURVEY §2.8) + JSON + conditional/null.

Exercises the string / math / JSON / conditional functions the reference
uses, as Catalyst column expressions over the test tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cupertino_nvr_spark.plans.registry import register
from cupertino_nvr_spark.sources.tables import load_table


@register(
    "string_functions",
    """
    SELECT doc_id,
           upper(substr(text, 1, 20)) AS head_upper,
           length(text) AS text_len,
           len(string_split(text, ' ')) AS n_tokens,
           replace(substr(text, 1, 30), ' ', '_') AS snake_head,
           concat_ws('|', lang, source) AS lang_source,
           lpad(CAST(n_chars AS VARCHAR), 6, '0') AS padded_len,
           trim(substr(text, 1, 10)) AS trimmed_head
    FROM documents WHERE doc_id % 5 = 0
    """,
    doc="§2.8 string surface: upper/substr/length/split/replace/concat_ws/lpad/trim",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).filter(F.col("doc_id") % 5 == 0)
    return docs.select(
        "doc_id",
        F.upper(F.substring("text", 1, 20)).alias("head_upper"),
        F.length("text").alias("text_len"),
        F.size(F.split(F.col("text"), " ", -1)).alias("n_tokens"),
        F.replace(
            F.substring("text", 1, 30), F.lit(" "), F.lit("_")
        ).alias("snake_head"),
        F.concat_ws("|", "lang", "source").alias("lang_source"),
        F.lpad(F.col("n_chars").cast("string"), 6, "0").alias("padded_len"),
        F.trim(F.substring("text", 1, 10)).alias("trimmed_head"),
    )


@register(
    "json_props_extract",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(json_extract_string(props, '$.missing') AS INT) AS missing_val
    FROM events WHERE event_id % 3 = 0
    """,
    doc="§2.8 JSON: get_json_object path extraction with NULL on absent key",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 3 == 0)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.get_json_object("props", "$.missing").cast("int").alias("missing_val"),
    )


@register(
    "conditional_bucketing",
    """
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS value_band,
           coalesce(nullif(event_type, 'error'), '(err)') AS safe_type,
           CASE WHEN value >= 100 THEN value ELSE NULL END AS big_value,
           least(value, 100.0) AS capped,
           greatest(value, 10.0) AS floored
    FROM events WHERE event_id % 2 = 0
    """,
    doc="§2.8 conditional/null surface: CASE, coalesce, nullif, least/greatest",
)
def conditional_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_id") % 2 == 0)
    return ev.select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("value_band"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("(err)")).alias(
            "safe_type"
        ),
        F.when(F.col("value") >= 100, F.col("value")).alias("big_value"),
        F.least("value", F.lit(100.0)).alias("capped"),
        F.greatest("value", F.lit(10.0)).alias("floored"),
    )


@register(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.001, 2) AS price_k,
           round(l_quantity / 2, 2) AS half_qty,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_bucket,
           abs(l_discount - 0.05) AS disc_dist,
           CAST(l_quantity AS INT) AS qty_int
    FROM lineitem WHERE l_orderkey % 13 = 0
    """,
    doc="§2.8 math surface: round/floor/ceil/abs/cast-truncate (x1000 scaling etc.)",
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_orderkey") % 13 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.001, 2).alias("price_k"),
        F.round(F.col("l_quantity") / 2, 2).alias("half_qty"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
        F.ceil(F.col("l_quantity") / 7).cast("bigint").alias("qty_bucket"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


@register(
    "customers_fuzzy_match",
    """
    WITH dirty AS (
      SELECT c_custkey AS dirty_id,
             substr(c_name, 1, 9) || 'O' || substr(c_name, 11) AS dirty_name,
             right(c_name, 5) AS bk
      FROM customer
    ),
    cand AS (
      SELECT d.dirty_id, c.c_custkey,
             levenshtein(d.dirty_name, c.c_name) AS edit_distance
      FROM dirty d JOIN customer c ON right(c.c_name, 5) = d.bk
    ),
    best AS (
      SELECT dirty_id, c_custkey AS matched_custkey, edit_distance,
             ROW_NUMBER() OVER (PARTITION BY dirty_id
                                ORDER BY edit_distance, c_custkey) AS r
      FROM cand WHERE edit_distance <= 2
    )
    SELECT dirty_id, matched_custkey, edit_distance FROM best WHERE r = 1
    """,
    doc="entity resolution / fuzzy matching: a deterministically corrupted "
    "name register (one character substituted) is matched back to the "
    "clean customer table by BLOCKED levenshtein — candidates come from "
    "an equi-join on a suffix blocking key, so edit distance is computed "
    "only within blocks (the standard ER discipline: never all-pairs; at "
    "scale the blocking key's cardinality, here the name suffix, bounds "
    "block sizes). Best match per dirty record by (distance, custkey) — "
    "the id tie-break makes collided blocks deterministic in both "
    "engines.",
)
def customers_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, "customer", sf_dir)
    dirty = cust.select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.substring("c_name", 1, 9),
            F.lit("O"),
            F.expr("substr(c_name, 11)"),
        ).alias("dirty_name"),
        F.expr("right(c_name, 5)").alias("bk"),
    )
    clean = cust.select(
        "c_custkey", "c_name", F.expr("right(c_name, 5)").alias("bk")
    )
    cand = dirty.join(clean, "bk").select(
        "dirty_id",
        "c_custkey",
        F.levenshtein("dirty_name", "c_name").alias("edit_distance"),
    )
    w = Window.partitionBy("dirty_id").orderBy("edit_distance", "c_custkey")
    return (
        cand.filter(F.col("edit_distance") <= 2)
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            "dirty_id",
            F.col("c_custkey").alias("matched_custkey"),
            "edit_distance",
        )
    )


@register(
    "event_value_median_udaf",
    """
    SELECT event_type,
           round(median(value), 6) AS median_value,
           COUNT(value) AS n_values
    FROM events GROUP BY event_type
    """,
    doc="§2.10 UDAF surface: a custom grouped aggregate via a GROUPED_AGG "
    "pandas UDF (Arrow-batched numpy median per group), the third leg of "
    "the UDF/UDAF/UDTF extension triple. The exact median is the right "
    "demonstration aggregate because it is an order statistic — "
    "(a+b)/2 of the two middle elements, one IEEE op — so the Python "
    "path hash-matches DuckDB's interpolated median exactly, with none "
    "of the float-summation-order caveats that keep the mean-style "
    "kernels rows-only. Nulls are skipped on both sides. Scale note: a "
    "GROUPED_AGG UDAF materializes each group in memory (no partial "
    "aggregation), so groups must be bounded — #event_types here; "
    "unbounded-group exact medians belong to the sort-based percentile "
    "path (order_price_stats).",
)
def event_value_median_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _median(v) -> float:
        return float(v.dropna().median())

    def _n_values(v) -> int:
        # Spark disallows mixing GROUPED_AGG pandas UDFs with built-in
        # aggregates in one agg (INVALID_PANDAS_UDF_PLACEMENT), so the
        # count rides the same extension point
        return int(v.notna().sum())

    _median.__annotations__ = {"v": pd.Series, "return": float}
    _n_values.__annotations__ = {"v": pd.Series, "return": int}
    median_udaf = pandas_udf(_median, "double")
    count_udaf = pandas_udf(_n_values, "long")

    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(median_udaf(F.col("value")), 6).alias("median_value"),
        count_udaf(F.col("value")).alias("n_values"),
    )
