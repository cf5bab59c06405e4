"""Driver-side parquet writer for tiny local artifacts.

Codebooks, centroid/params oracle tables, and stem dictionaries are a
few KB of data that already live on the driver as Python lists.
Routing them through a Spark write
(``createDataFrame(...).repartition(1).write``) costs 2-3 SECONDS each
on local[32] — a 32-slice local relation, a shuffle, a task launch, and
a committer round-trip for 128 rows (measured while decomposing the
r7 ``build:ivf_pq_index`` bench entry, where these fixed costs were
~40% of the build). Writing the same bytes with pyarrow on the driver
is milliseconds, and both Spark (directory scan) and the DuckDB oracle
(``<dir>/*.parquet`` glob) read the result identically.

Use ONLY for data that is already small and driver-resident by
construction — never to collect distributed data.
"""

from __future__ import annotations

import os


def write_local_parquet(path: str, columns: dict) -> None:
    """Overwrite ``path`` (a directory) with one parquet file holding
    ``columns`` ({name: list-of-values}; lists of floats become
    list<double>, ints int64 — matching what a Spark write of the same
    python values produces)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    table = pa.table(columns)
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet") or f.startswith("_"):
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass
    papq.write_table(table, os.path.join(path, "part-00000.parquet"))
