"""Record-linkage fuzzy matching (SURVEY.md §2.10 engine extension).

Blocked edit-distance self-join — the classic entity-resolution /
catalog-dedup primitive: candidate pairs form ONLY inside equality
blocks (brand, size, …) plus a length band, and the expensive
``levenshtein`` evaluates only on survivors.  Both Spark and DuckDB
implement the identical unit-cost Wagner–Fischer edit distance, so
the match set is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join_blocked(
    df: DataFrame,
    key_col: str,
    text_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """All pairs within an equality block whose ``text_col`` values
    are within ``max_dist`` edits, keys ordered ``a < b``.

    Scale shape: the join keys are the block columns, so candidate
    generation is ONE hash-shuffle on the block key and the quadratic
    step is per-block only (record-linkage "blocking"); the length
    band ``|len(a)−len(b)| ≤ max_dist`` — a NECESSARY condition for
    edit distance ≤ ``max_dist`` — is a cheap integer filter that
    prunes before the O(len²) ``levenshtein`` DP runs.  At 100 TB the
    block key choice bounds the worst block: TPC-H (brand, size) caps
    blocks at |parts|/1250; skewed natural blocks (surname, city)
    would add a salt/cap the same way the dedup operators do.

    Output: ``(key_a, key_b, <block cols>, dist)``, dist ≤
    ``max_dist``, every value integer/string — hash-exact across
    engines (both sides run unit-cost Levenshtein).
    """
    a, b = df.alias("a"), df.alias("b")
    cond = (F.col(f"a.{key_col}") < F.col(f"b.{key_col}"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (
        F.abs(
            F.length(F.col(f"a.{text_col}")) - F.length(F.col(f"b.{text_col}"))
        )
        <= int(max_dist)
    )
    dist = F.levenshtein(F.col(f"a.{text_col}"), F.col(f"b.{text_col}"))
    return (
        a.join(b, cond)
        .where(dist <= int(max_dist))
        .select(
            F.col(f"a.{key_col}").alias("key_a"),
            F.col(f"b.{key_col}").alias("key_b"),
            *[F.col(f"a.{c}").alias(c) for c in block_cols],
            dist.cast("long").alias("dist"),
        )
    )
