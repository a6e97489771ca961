"""Geospatial string parsing.

The reference's ExifTool metadata carries GPS coordinates as DMS
strings (`"38 deg 55' 58.80\" N"`, analysis/preview_data.ipynb cell 8
output) and filters on key presence
(code/data_processing_scripts/ID_matching_metadata.py:32-39) but never
parses them; `dms_to_decimal` is the engine-added scalar (SURVEY F15).
Pure regexp_extract + arithmetic — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DMS_RE = r"""(\d+)\s*deg\s*(\d+)'\s*([0-9.]+)"\s*([NSEW])"""


def dms_to_decimal(col: Column | str) -> Column:
    """Parse `38 deg 55' 58.80" N` → signed decimal degrees (double).

    South/West are negative. Unparseable input → NULL (regexp_extract
    yields '' which casts to NULL through the nullif guard).
    """
    c = F.col(col) if isinstance(col, str) else col
    deg = F.nullif(F.regexp_extract(c, _DMS_RE, 1), F.lit("")).cast("double")
    mins = F.nullif(F.regexp_extract(c, _DMS_RE, 2), F.lit("")).cast("double")
    secs = F.nullif(F.regexp_extract(c, _DMS_RE, 3), F.lit("")).cast("double")
    hemi = F.regexp_extract(c, _DMS_RE, 4)
    magnitude = deg + mins / F.lit(60.0) + secs / F.lit(3600.0)
    return F.when(hemi.isin("S", "W"), -magnitude).otherwise(magnitude)
