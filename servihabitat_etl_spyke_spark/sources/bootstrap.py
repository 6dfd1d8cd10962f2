"""S12: idempotent initial-data load.

The reference seeds a fresh DB from ``initialData`` JSON exactly once,
guarded by a marker file (``db.ts:608-673``). Spark twin: CREATE TABLE AS
SELECT if-and-only-if the table doesn't exist yet — the parquet output
directory itself is the marker.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def init_table(spark: SparkSession, path: str,
               initial_rows: Sequence[tuple], schema: str) -> tuple[DataFrame, bool]:
    """Seed ``path`` with ``initial_rows`` once; later calls are no-ops.

    Returns (table, seeded_now). Idempotency is re-entrant at the storage
    layer: an existing non-empty dataset is never rewritten, matching the
    reference's ``initialized`` marker semantics.
    """
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        # overwrite, not ignore: a crash mid-seed leaves the directory
        # existing WITHOUT the marker, and mode('ignore') would then skip
        # the write forever while reporting seeded_now=True — the torn
        # partial table could never self-heal
        df = spark.createDataFrame(list(initial_rows), schema)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path), True
    return spark.read.parquet(path), False
