"""PySpark-native community-detection (WCC) analytics engine.

A from-scratch re-expression of the capabilities of
jiahezhu0312/community-detection-flink (Flink 1.13 DataSet + Gelly, Scala)
as an idiomatic PySpark DataFrame engine, plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal
columns, event-time windows).

Public API (stable):

    from community_detection_flink_spark import (
        get_spark, load_edges_csv, symmetrize_edges, run_wcc,
    )

Everything is DataFrame-first: logical plans are declared with the
DataFrame API and Catalyst/Tungsten pick the physical strategy.  The only
driver-side loops are the two genuinely iterative algorithms (center
election and WCC refinement), which follow the iterative-Spark discipline
of a ``Materializer`` parquet round-trip per round — truncating lineage
AND resetting Catalyst's compounding size statistics (see
``plans/iteration.py`` for why ``localCheckpoint`` is pathological here).
"""

from community_detection_flink_spark.session import get_spark
from community_detection_flink_spark.sources.edges import (
    load_edges_csv,
    symmetrize_edges,
    vertices_of,
    co_purchase_edges,
)
from community_detection_flink_spark.operators.refinement import run_wcc
from community_detection_flink_spark.operators.incremental import (
    WCCState,
    incremental_delete,
    incremental_update,
    load_state,
    prepare,
    save_state,
)
from community_detection_flink_spark.operators.components import (
    connected_components,
    dedup_groups,
)
from community_detection_flink_spark.plans.iteration import Materializer
from community_detection_flink_spark.plans.skew import salted_agg, salted_join
from community_detection_flink_spark.sources.bucketed import (
    bucket_count,
    read_bucketed,
    write_bucketed,
)

__all__ = [
    "get_spark",
    "load_edges_csv",
    "symmetrize_edges",
    "vertices_of",
    "co_purchase_edges",
    "run_wcc",
    "WCCState",
    "incremental_update",
    "incremental_delete",
    "save_state",
    "load_state",
    "prepare",
    "connected_components",
    "dedup_groups",
    "Materializer",
    "salted_agg",
    "salted_join",
    "bucket_count",
    "read_bucketed",
    "write_bucketed",
]
