from cupertino_nvr_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
