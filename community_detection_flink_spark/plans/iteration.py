"""Iteration-state materialization (the engine's checkpoint discipline).

Why not ``localCheckpoint``: since Spark 3.4, ``Dataset.checkpoint``
preserves the origin plan's ESTIMATED statistics on the resulting
``LogicalRDD`` (``originStats``).  In an iterative algorithm each
round's join-size estimate is a product of the previous round's
estimate, so the ``sizeInBytes`` BigInteger's bit-length grows
~10× per round — measured here: 23 → 189 → 396 → 1766 → 3552 bits in
two rounds — until Catalyst spends minutes multiplying BigIntegers
(observed: round 4 = 14 s, round 5 = 351 s on a 25k-edge graph).
There is no SQLConf to disable the propagation.

A parquet round-trip is the scale-correct alternative: executors write
and read in parallel (never the driver), the re-read plan is a fresh
scan whose stats are the ACTUAL file sizes, lineage depth stays O(1)
forever, and on a real cluster the directory can point at HDFS/S3
(``CDFS_CHECKPOINT_DIR``).  The reference has no equivalent discipline
— it recomputes lineage and forces ``count()``s
(``DistributedWCC.scala:317``, commented-out unpersists at 313,318).
"""

from __future__ import annotations

import os
import shutil
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, MapType, StructField, StructType


def _as_nullable(dt):
    """Recursively nullable-normalize a datatype — exactly what parquet
    schema inference reports (Spark converts all parquet columns to
    nullable on read), so the explicit-schema fast path below is
    bit-identical to the inferred one."""
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _as_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_as_nullable(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_as_nullable(dt.keyType), _as_nullable(dt.valueType), True)
    return dt


@contextmanager
def no_aqe(spark):
    """Disable adaptive query execution for queries COMPILED inside
    the block (physical planning only — results are unchanged).

    AQE earns its keep by discovering runtime sizes of big scans; in
    the engine's fixed-point loops every input is either a
    Materializer-landed parquet (TRUE file-size stats, the exact
    information AQE exists to recover) or a persisted loop temporary,
    and the per-round state is small.  There AQE only splits each tiny
    landing into one Spark job per query stage — measured on the
    incremental path: ~200 driver-blocking jobs per micro-batch, ~2×
    the non-adaptive count — so the scheduling floor, not the data,
    dominates per-round cost.  Scope this tightly: batch-scale scans
    (triangle enumeration, bulk joins) keep AQE.
    """
    key = "spark.sql.adaptive.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try:
        yield
    finally:
        spark.conf.set(key, old)


@contextmanager
def scoped_shuffle_partitions(spark, n: int):
    """Scope ``spark.sql.shuffle.partitions`` for queries COMPILED
    inside the block — the loop-state sibling of :func:`no_aqe`.

    Fixed-point loops shuffle small, KNOWN-size state every round; the
    session's shuffle width is sized for batch scans and over-splits
    that state into task-launch overhead (measured on the sf0.1
    refinement loop: 32 → 8 partitions = 74.7 → 62.9 s for identical
    results).  Callers clamp ``n`` at the session value so batch-scale
    and cluster behavior never change — this only ever SHRINKS the
    width for a scoped loop.
    """
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(key, old)


class Materializer:
    """Write-then-read parquet materializer for loop state.

    Usage::

        mat = Materializer(spark)
        state = mat(state, "vertices")   # truncated plan, real stats
        ...
        mat.cleanup()                    # optional; keeps the last rounds
    """

    def __init__(self, spark, base_dir: str | None = None):
        self.spark = spark
        self.base = (
            base_dir
            or os.environ.get("CDFS_CHECKPOINT_DIR")
            or tempfile.mkdtemp(prefix="cdfs-ckpt-")
        )
        self._i = 0
        self._ephemeral: list[DataFrame] = []
        # df -> backing path, keyed by id() WITH a strong reference to
        # the df (prevents id reuse after GC) so drop() can delete the
        # files of a superseded state
        self._by_df: dict[int, tuple[DataFrame, str]] = {}

    def __call__(
        self, df: DataFrame, name: str = "state", light: bool = False
    ) -> DataFrame:
        if light and not os.environ.get("CDFS_AB_NO_LIGHT_LANDING"):
            # LIGHT landing (r13): ``localCheckpoint(eager=True)`` —
            # one job, no file write/commit/read-back, plan truncated
            # to a LogicalRDD exactly like a parquet scan truncates it.
            # The trade (why ``light`` is opt-in, per loop round, never
            # the default):
            #   * the LogicalRDD carries the origin plan's ESTIMATED
            #     stats, and those compound round-over-round (measured
            #     on 4.1: sizeInBytes bit-length ~2x/round) — callers
            #     MUST re-land on parquet every few rounds (the loops
            #     use a short cadence) so estimates never drift far
            #     from the 64MB broadcast threshold's truth;
            #   * blocks live in executor memory/disk with lineage cut,
            #     so an executor loss mid-loop is unrecoverable — fine
            #     for loop state a restart recomputes, wrong for
            #     carried/returned state (those stay parquet).
            # CDFS_AB_NO_LIGHT_LANDING restores parquet-every-round for
            # tools/ab_refine.py same-session A/Bs.
            out = df.localCheckpoint(eager=True)
            self._by_df[id(out)] = (out, None)
            return out
        path = os.path.join(self.base, f"{name}-{self._i:04d}")
        self._i += 1
        df.write.mode("overwrite").parquet(path)
        # read back with the KNOWN schema (r12): schema inference runs a
        # 1-task footer-read job per landing — pure driver latency that
        # the loops pay hundreds of times per pipeline.  The writer's
        # schema IS the reader's schema (same df), so nothing changes
        # except the job disappearing.  CDFS_AB_INFER_LANDING_SCHEMA
        # restores the pre-r12 inferred read so tools/ab_refine.py can
        # measure the two variants in one session (results identical —
        # _as_nullable mirrors what inference reports).
        if os.environ.get("CDFS_AB_INFER_LANDING_SCHEMA"):
            out = self.spark.read.parquet(path)
        else:
            out = self.spark.read.schema(_as_nullable(df.schema)).parquet(path)
        self._by_df[id(out)] = (out, path)
        return out

    def drop(self, df: DataFrame) -> None:
        """Delete the parquet files (or unpersist the localCheckpoint
        blocks) backing a SUPERSEDED materialized state (loop callers
        invoke this once a replacement state is live, so checkpoint
        storage stays O(live states) instead of O(rounds) — unbounded
        for long streaming sessions otherwise).  No-op for DataFrames
        this materializer didn't produce."""
        entry = self._by_df.pop(id(df), None)
        if entry is None:
            return
        if entry[1] is None:
            # light landing: free the checkpoint blocks now instead of
            # waiting for the ContextCleaner's GC sweep (the dropped
            # state is superseded — nothing reads it again)
            try:
                entry[0]._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass  # best-effort, like the rmtree below
            return
        if entry[1].startswith("/") and os.path.isdir(entry[1]):
            shutil.rmtree(entry[1], ignore_errors=True)

    def is_landed(self, df: DataFrame) -> bool:
        """True iff ``df`` is a PARQUET landing this materializer
        produced — loop entries skip re-landing such inputs."""
        entry = self._by_df.get(id(df))
        return entry is not None and entry[1] is not None

    def is_light(self, df: DataFrame) -> bool:
        """True iff ``df`` is a LIGHT landing this materializer produced
        (localCheckpoint-backed — see ``__call__``); loop exits re-land
        such state on parquet before returning it to callers."""
        entry = self._by_df.get(id(df))
        return entry is not None and entry[1] is None

    def cache(self, df: DataFrame, name: str = "tmp", force: bool = True) -> DataFrame:
        """In-memory materialization for WITHIN-round temporaries.

        Cheaper than the parquet round-trip and safe against the stats
        compounding: an ``InMemoryRelation``'s statistics are the
        actual cached sizes, and the entry is dropped at the next
        ``release()`` (call it once per loop round, after the round's
        state has been parquet-materialized).

        ``force=False`` skips the count job: the cache fills lazily
        inside the first consumer's job.  Use it when the first
        consumer runs before any plan decision that needs the cached
        size (a forced count exists to hand Catalyst REAL stats for
        downstream join planning — keep the default where that
        matters).
        """
        df = df.persist()
        if force:
            df.count()
        self._ephemeral.append(df)
        return df

    def release(self) -> None:
        """Unpersist all ephemeral caches registered since the last call."""
        for df in self._ephemeral:
            df.unpersist(False)
        self._ephemeral.clear()

    def cleanup(self) -> None:
        """Best-effort removal of the checkpoint dir (local paths only)."""
        if self.base.startswith(("/", "file:")) and os.path.isdir(self.base):
            shutil.rmtree(self.base, ignore_errors=True)
