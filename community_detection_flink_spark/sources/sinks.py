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
