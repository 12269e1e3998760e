from cupertino_nvr_spark.operators.joins import asof_join, latest_per_key  # noqa: F401
from cupertino_nvr_spark.operators.checkpoint import reliable_checkpoint  # noqa: F401
