"""MERGE INTO / upsert semantics (engine extension).

The lakehouse write-path primitive: apply a change set (inserts,
updates, deletes keyed by primary key) to a target table in one
relational pass — ``WHEN MATCHED THEN UPDATE / DELETE, WHEN NOT
MATCHED THEN INSERT``.  Spark SQL only accepts ``MERGE INTO`` against
v2 catalogs, so the engine exposes the same semantics as a composable
DataFrame operator.

Plan shape: ONE equi-join of target against the non-insert changes on
the key (sort-merge at scale, broadcast when the change batch is
small — the common CDC case, which is why the operator broadcasts it
by default) + a union with the inserts.  Nothing is rewritten in
place: at 100 TB this is the copy-on-write MERGE of Delta/Iceberg,
where the join output lands as new files and the touched partitions
swap atomically; engines with deletion vectors skip even that.  The
operator is the arithmetic of that rewrite, so its output is exactly
the post-MERGE table and hash-certifiable against a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    payload_cols: list[str],
    broadcast_changes: bool = True,
    check_unique_keys: bool = False,
) -> DataFrame:
    """Apply ``changes`` (columns: ``key``, ``op`` ∈ {'I','U','D'},
    ``payload_cols``) to ``target``; returns the merged table with an
    ``action`` audit column ('K' kept, 'U' updated, 'I' inserted —
    deleted rows are absent).

    Unmatched-by-changes rows pass through ('K'); matched 'U' rows
    take the change payload; matched 'D' rows drop; 'I' rows append
    (standard MERGE contract: an 'I' whose key already exists in the
    target is the caller's constraint violation — this operator, like
    SQL MERGE, does not silently dedupe it).

    CONTRACT (all ops): at most ONE change row per key.  A second
    'U'/'D' row for the same key fans the left join out — the matched
    target row would emit once per change row, silently duplicating
    output (ANSI MERGE raises for exactly this reason).  Pass
    ``check_unique_keys=True`` to enforce it eagerly: one tiny
    aggregate over the change batch (it is broadcast-sized in the CDC
    case), raising ``ValueError`` before any output is produced.
    """
    if check_unique_keys:
        dup = changes.groupBy(key).count().where(F.col("count") > 1).limit(1).collect()
        if dup:
            raise ValueError(
                f"merge_upsert: duplicate change key {dup[0][0]!r} — "
                "MERGE requires at most one change row per key"
            )
    # changes are routinely derived from the target's own lineage
    # (CDC replay, self-tests) — explicit aliases keep the join
    # unambiguous regardless of shared attribute ids
    mods = changes.where(F.col("op") != "I").alias("_chg")
    if broadcast_changes:
        mods = F.broadcast(mods)
    tgt = target.alias("_tgt")
    is_upd = F.col("_chg.op") == "U"
    sel = [F.col(f"_tgt.{key}").alias(key)]
    for c in payload_cols:
        sel.append(
            F.when(is_upd, F.col(f"_chg.{c}"))
            .otherwise(F.col(f"_tgt.{c}"))
            .alias(c)
        )
    sel.append(F.when(is_upd, F.lit("U")).otherwise(F.lit("K")).alias("action"))
    survivors = (
        tgt.join(mods, F.col(f"_tgt.{key}") == F.col(f"_chg.{key}"), "left")
        .where(F.col("_chg.op").isNull() | is_upd)
        .select(*sel)
    )
    inserts = changes.where(F.col("op") == "I").select(
        F.col(key), *[F.col(c) for c in payload_cols], F.lit("I").alias("action")
    )
    return survivors.unionByName(inserts)
