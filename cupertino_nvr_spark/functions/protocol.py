"""Topic protocol: partition-key encode/decode as column expressions.

Reference semantics (``cupertino_nvr/events/protocol.py:11-55``): the event
stream's partition key (``source_id``) is encoded into the transport address
``{prefix}/{source_id}`` and decoded back by taking the last ``/`` segment;
a non-integer segment yields None (``protocol.py:49-55``, tested at
``tests/unit/test_events.py:160-165``). Pure column expressions — JVM-side,
codegen'd, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_PREFIX = "nvr/detections"


def topic_for_source(source_id: Column, prefix: str = DEFAULT_PREFIX) -> Column:
    """``topic_for_source(5, 'nvr/detections') -> 'nvr/detections/5'``."""
    return F.concat_ws("/", F.lit(prefix), source_id.cast("string"))


def parse_source_id(topic: Column) -> Column:
    """Last path segment as int; NULL when not an integer (try_cast matches
    the reference's catch-ValueError→None; plain cast throws under ANSI)."""
    return F.element_at(F.split(topic, "/"), -1).try_cast("int")
