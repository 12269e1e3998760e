"""Overlay label synthesis.

Reference (``cupertino_nvr/wall/renderer.py:142-158``): label is
``"{class_name} {confidence:.2f}"`` with an optional ``" #{tracker_id}"``
suffix when a real tracker id is present. ``format_string`` + ``concat`` —
no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def detection_label(class_name: Column, confidence: Column, tracker_id: Column) -> Column:
    base = F.format_string("%s %.2f", class_name, confidence)
    return F.when(
        tracker_id.isNotNull(), F.concat(base, F.format_string(" #%d", tracker_id))
    ).otherwise(base)
