from community_detection_flink_spark.functions import wcc_metric

__all__ = ["wcc_metric"]
