"""Bounding-box geometry as vectorized column arithmetic.

Reference formula (``cupertino_nvr/wall/renderer.py:119-124``): bbox is
stored center+size; rendering needs corners:
``x1=x-w/2, y1=y-h/2, x2=x+w/2, y2=y+h/2``. Golden vector: center
(100,150) size (80,200) -> (60,50,140,250)
(``tests/unit/test_supervision_integration.py:52-56``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bbox_corners(bbox: Column) -> Column:
    """Struct<x,y,width,height> (center+size) -> struct<x1,y1,x2,y2>."""
    half_w = bbox["width"] / 2
    half_h = bbox["height"] / 2
    return F.struct(
        (bbox["x"] - half_w).alias("x1"),
        (bbox["y"] - half_h).alias("y1"),
        (bbox["x"] + half_w).alias("x2"),
        (bbox["y"] + half_h).alias("y2"),
    )
