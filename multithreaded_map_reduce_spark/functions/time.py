"""Timezone-free time arithmetic.

The fixture parquet stores NAIVE timestamps (isAdjustedToUTC=false), so
Spark reads them as TIMESTAMP_NTZ (the driver's session keeps the
default ``spark.sql.parquet.inferTimestampNTZ.enabled=true``) and the
DuckDB oracle reads the same bytes as its (naive) TIMESTAMP. Staying
NTZ end-to-end keeps every value identical on both sides with no
session-timezone coupling.

``unix_micros``/``unix_timestamp`` only accept TIMESTAMP_LTZ, so the
micros-since-epoch used by the as-of join, bucketed range join and
RANGE window frames is computed with ``timestamp_diff`` against an NTZ
epoch literal — defined once here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def epoch_micros(col: Column | str) -> Column:
    """Microseconds since epoch of a naive timestamp (BIGINT).

    LTZ inputs are first cast to NTZ (wall-clock in the session
    timezone — the catalog pins UTC), so the result is stable whether a
    caller session read the parquet as NTZ (default) or LTZ
    (``inferTimestampNTZ=false``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff("MICROSECOND", F.expr(_EPOCH_NTZ), c.cast("timestamp_ntz"))
