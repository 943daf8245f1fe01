"""Driver-side parquet writes for metadata-sized tables.

A 1-row `spark.createDataFrame(...).coalesce(1).write.parquet(...)`
costs a full Spark job — measured 4-5s each at local[32] (scheduler +
session overhead, nothing to do with the data). Stats and lineage
tables are a handful of rows the driver already holds in memory, so
they are written directly with pyarrow; `spark.read.parquet` reads the
result identically. (The analog at cluster scale: metadata goes through
the metastore/manifest commit, never through an executor job.)
"""

from __future__ import annotations

import os
import shutil


def write_meta_parquet(path: str, rows: list[dict]) -> None:
    """Overwrite `path` (a parquet directory) with one driver-written
    file holding `rows`. Column types follow pyarrow inference, which
    matches Spark's for the int64/string fields used here."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        pa.Table.from_pylist(rows),
        os.path.join(path, "part-00000.parquet"),
    )
