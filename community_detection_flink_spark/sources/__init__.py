from community_detection_flink_spark.sources.edges import (
    load_edges_csv,
    symmetrize_edges,
    vertices_of,
    co_purchase_edges,
)
from community_detection_flink_spark.sources.tables import load_table, load_star_schema

__all__ = [
    "load_edges_csv",
    "symmetrize_edges",
    "vertices_of",
    "co_purchase_edges",
    "load_table",
    "load_star_schema",
]
