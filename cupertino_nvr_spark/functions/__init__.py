from cupertino_nvr_spark.functions.protocol import topic_for_source, parse_source_id  # noqa: F401
from cupertino_nvr_spark.functions.geometry import bbox_corners  # noqa: F401
from cupertino_nvr_spark.functions.labels import detection_label  # noqa: F401
