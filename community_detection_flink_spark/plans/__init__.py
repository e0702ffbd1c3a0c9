from community_detection_flink_spark.plans.iteration import Materializer

__all__ = ["Materializer"]
