from syscol_spark.streaming.pipeline import build_pipeline, serialized_value  # noqa: F401
from syscol_spark.streaming.control import CollectorManager  # noqa: F401
