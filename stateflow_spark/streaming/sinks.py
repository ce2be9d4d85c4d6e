"""Incremental materialized-aggregate sink: foreachBatch upsert into a
key-addressed parquet table.

At 100 TB you do not recompute `events_hourly` from scratch per refresh —
the stream MAINTAINS the aggregate table: each micro-batch emits only the
(window, key) groups it changed (UPDATE output mode), and the sink merges
them into the stored table by key (delete-then-insert). The table is
always exactly the batch aggregate of everything ingested so far, at the
cost of touching only changed groups per trigger.

Spark's built-in file sink is append-only (no upsert), so the merge runs
through ``foreachBatch`` — the standard OSS pattern (Delta's MERGE is the
managed version of this; plain parquet + swap keeps the engine dependency-
free). The swap is write-to-temp + atomic directory rename: overwriting a
parquet directory that the merge plan is concurrently reading from is the
classic self-overwrite corruption, and "persist + count first" merely
narrows that race — the rename removes it.

Scale note: the merge anti-join is keyed on the aggregate's GROUP BY
columns, so its cost is O(stored groups + changed groups) per trigger —
independent of raw event volume. For very large aggregate tables the
stored side would be partitioned by a window-date column so the anti-join
prunes to the partitions the batch actually touches (storage.py's
write_partitioned posture); the windows in a batch are watermark-bounded,
so that's a handful of partitions regardless of table size.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable, Sequence

from pyspark.sql import DataFrame


def recover_parquet_dir(path: str) -> None:
    """Crash recovery for swap_parquet_dir tables: if a prior swap died
    between its two renames, the table exists only at `path`+'.old' —
    rename it back so readers see the pre-crash history instead of
    silently treating the table as absent. Stateful callers (SCD-2
    merge, upsert sink) MUST call this before checking/reading `path`:
    their read happens before the swap, so recovery inside the swap
    alone would be too late (round-6 ADVICE)."""
    old = path + ".old"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)


def swap_parquet_dir(df: DataFrame, path: str, prefix: str = ".swap-") -> None:
    """Write `df` next to `path` and atomically swap it in — the shared
    crash-safe replace used by the upsert sink, storage.compact and the
    streaming SCD-2 merge (one implementation so the round-5 ENOTEMPTY
    fix cannot drift between copies).

    Crash recovery (round-6 ADVICE): a crash between the two renames
    leaves the table ONLY at `path`+'.old' — for stateful callers (the
    SCD-2 merge, the upsert sink) that copy is the sole merged history,
    and replaying the batch cannot rebuild it. So on entry, if `path` is
    missing but `.old` exists, the `.old` copy is RESTORED (renamed
    back), never deleted; `.old` is only cleared when `path` itself
    exists (then it is a fully superseded leftover, and clearing it
    first keeps the round-5 ENOTEMPTY fix). The brief table-less window
    between the renames is inherent to dir-swap without
    renameat2(RENAME_EXCHANGE); with this recovery the window is also
    self-healing."""
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    old = path + ".old"
    recover_parquet_dir(path)

    tmp = _tempfile.mkdtemp(prefix=prefix, dir=_os.path.dirname(path) or ".")
    out = _os.path.join(tmp, "data")
    df.write.mode("overwrite").parquet(out)
    if _os.path.isdir(path):
        _shutil.rmtree(old, ignore_errors=True)
        _os.rename(path, old)
    _os.rename(out, path)
    _shutil.rmtree(old, ignore_errors=True)
    _shutil.rmtree(tmp, ignore_errors=True)


def upsert_parquet_sink(
    path: str, keys: Sequence[str]
) -> Callable[[DataFrame, int], None]:
    """Build a foreachBatch function that upserts each micro-batch into the
    parquet table at `path` by `keys` (batch rows replace stored rows with
    the same key)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        from stateflow_spark.storage import unpersist_local_checkpoint

        spark = batch_df.sparkSession
        recover_parquet_dir(path)  # crash-left .old is the sole history
        batch_df = batch_df.localCheckpoint()  # freeze: inputs may vanish
        if os.path.isdir(path):
            stored = spark.read.parquet(path)
            merged = stored.join(
                batch_df.select(*keys).distinct(), list(keys), "left_anti"
            ).unionByName(batch_df)
        else:
            merged = batch_df
        swap_parquet_dir(merged, path, prefix=".upsert-")
        # the table is on disk now — release the frozen batch's blocks so
        # executor storage stays O(1) in trigger count
        unpersist_local_checkpoint(batch_df)

    return merge
