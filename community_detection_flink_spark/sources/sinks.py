"""Sinks (SURVEY.md S5) — phase dumps and result writers.

The reference writes every phase's intermediate state as CSV
(``DistributedWCC.scala:50-57,79,98,147,268``; ``CSVGraph.scala:100``)
to hard-coded paths.  The engine keeps the capability as an explicit,
off-by-default debug tap plus ordinary parquet/CSV result sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, header: bool = False) -> None:
    """CSV sink, overwrite mode (``writeAsCsv(..., OVERWRITE)``)."""
    df.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Columnar result sink; ``partition_by`` for downstream partition
    pruning (e.g. community id buckets)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


class PhaseTap:
    """Opt-in per-phase dump, mirroring the reference's CSV taps.

    ``PhaseTap(dir)`` writes each named phase under ``dir/<name>``;
    ``PhaseTap(None)`` (default in the engine) is a no-op.
    """

    def __init__(self, base_dir: str | None = None):
        self.base = base_dir

    def __call__(self, df: DataFrame, name: str) -> DataFrame:
        if self.base:
            write_csv(df, os.path.join(self.base, name))
        return df


def compact_parquet(
    spark,
    path: str,
    target_file_mb: int = 128,
    min_files_to_compact: int = 2,
) -> dict:
    """Small-file compaction for a parquet directory — the lake
    maintenance pass (Delta OPTIMIZE / Iceberg rewrite_data_files
    shape) that keeps scan task counts sane after many incremental
    appends: thousands of KB-sized files turn a 100 TB scan into a
    scheduler stress test.

    Reads the directory, computes the output file count from the
    ACTUAL on-disk byte size (ceil(bytes / target)), rewrites with
    ``coalesce`` (no shuffle — compaction is a repacking, not a
    repartitioning) through a temp directory, then swaps via two
    renames.  The swap is NOT atomic (ADVICE r4): a crash between the
    renames leaves the dataset only under ``<path>.compact-old`` — the
    next call (or ``load``) recovers it, because entry starts by
    renaming a stranded ``.compact-old`` back into place and removing
    stale ``.compact-tmp`` leftovers.
    Returns ``{"files_before", "files_after", "bytes"}``.  No-op (and
    no rewrite) when the directory already has < ``min_files_to_compact``
    data files.  Row-level equality under compaction is pinned in
    ``tests/test_sinks_and_misc.py``.
    """
    import math
    import shutil

    def _data_files(p):
        out = []
        for root, _dirs, files in os.walk(p):
            out += [
                os.path.join(root, f)
                for f in files
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
        return out

    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    # crash recovery from a previous interrupted swap: a stranded
    # .compact-old with no live dataset IS the dataset — restore it;
    # leftovers next to a live dataset are garbage from a completed or
    # abandoned run — remove them so this run starts clean.
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    before = _data_files(path)
    if len(before) < min_files_to_compact:
        return {
            "files_before": len(before),
            "files_after": len(before),
            "bytes": sum(os.path.getsize(f) for f in before),
        }
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    spark.read.parquet(path).coalesce(n_out).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
    after = _data_files(path)
    return {
        "files_before": len(before),
        "files_after": len(after),
        "bytes": total_bytes,
    }
