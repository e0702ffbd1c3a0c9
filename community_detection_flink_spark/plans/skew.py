"""Skew- and shuffle-shaping utilities (100 TB plan surface).

The reference runs a 25k-edge graph and never meets skew; at the
engine's design scale (1000-executor cluster, ~100 TB) the two
standard mitigations below are load-bearing.  AQE's skew-join split
(``spark.sql.adaptive.skewJoin``, on by default in ``session.py``)
handles sort-merge-join skew at runtime; these cover the cases AQE
cannot:

* ``salted_agg`` — two-phase aggregation for a skewed groupBy key
  (AQE never splits a hash-aggregate key).  Phase 1 aggregates on
  (key, salt) — the hot key's rows spread over ``n_salt`` reducers —
  phase 2 combines the ``n_salt`` partials.  Correct for algebraic
  aggregates (sum/count/min/max and anything composed from them).
* ``salted_join`` — explicit salted equi-join for engines/paths where
  AQE is unavailable (streaming micro-batch joins disable AQE) or the
  skewed side is produced by an exchange AQE won't re-split.  The big
  side gets a deterministic content-derived salt; the small side is
  replicated ``n_salt``× (explode — bounded, explicit); the join key
  becomes (key, salt).  Row-identical to the plain join for
  inner/left joins.

Both keep the salt DETERMINISTIC (hash of row content, not ``rand()``)
so task retries and speculative execution reproduce the same rows —
``rand()``-salted shuffles are a classic source of silent duplicate /
lost rows under retry.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_cdfs_salt"


def _salt_col(df: DataFrame, n_salt: int) -> Column:
    # content-derived: stable under retries; all columns participate so
    # identical rows of a hot key still spread (xxhash64 of the full row)
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs``: output column → (input column, fn) with fn in
    {sum, count, min, max}.  count composes as sum of partial counts.
    """
    partial_exprs, final_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(out))
            final_exprs.append(F.sum(out).cast("long").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(out))
            final_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(out))
            final_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(out))
            final_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate: {fn}")
    partial = (
        df.withColumn(_SALT, _salt_col(df, n_salt))
        .groupBy(*keys, _SALT)
        .agg(*partial_exprs)
    )
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: spread each hot key of ``big`` across
    ``n_salt`` reducers by replicating ``small`` (explode factor
    exactly ``n_salt`` — the explicit, bounded cost).

    ``how`` ∈ {inner, left}: the salt preserves exactly the matches of
    the plain join (every big row meets every small row of its key in
    exactly one salted partition).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    big_s = big.withColumn(_SALT, _salt_col(big, n_salt))
    small_s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    return big_s.join(small_s, on + [_SALT], how).drop(_SALT)
