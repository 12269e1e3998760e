"""cupertino_nvr_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query / data-processing capabilities of
the reference NVR system (``e7canasta/cupertino-nvr``, studied read-only) as
an idiomatic Apache Spark engine:

- batch relational operators on the TPC-H-ish star schema (DataFrame/SQL,
  Catalyst-optimized),
- the reference's event-stream semantics (detection-event schema, topic
  protocol, as-of/TTL joins, windowed metrics) as DataFrame programs and
  Structured Streaming queries,
- LLM-data-pipeline operators (dedup, similarity search, text analysis,
  multimodal column plumbing) designed for 100 TB scale.

Nothing here is a translation of the reference's execution engine; the
reference defines *what* to compute (see SURVEY.md), Spark decides *how*.
"""

__version__ = "0.1.0"

from cupertino_nvr_spark.session import get_spark  # noqa: F401
