from community_detection_flink_spark.operators.triangles import (
    degrees,
    adjacency_lists,
    triangles,
    triangle_counts,
    triangle_edges,
)
from community_detection_flink_spark.operators.preprocess import preprocess
from community_detection_flink_spark.operators.partition import initial_partition
from community_detection_flink_spark.operators.community import (
    community_stats,
    edges_with_communities,
    intra_triangle_counts,
    vertex_community_degrees,
    global_wcc,
    best_movement,
)
from community_detection_flink_spark.operators.refinement import run_wcc

__all__ = [
    "degrees",
    "adjacency_lists",
    "triangles",
    "triangle_counts",
    "triangle_edges",
    "preprocess",
    "initial_partition",
    "community_stats",
    "edges_with_communities",
    "intra_triangle_counts",
    "vertex_community_degrees",
    "global_wcc",
    "best_movement",
    "run_wcc",
]
