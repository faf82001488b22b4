from syscol_spark.streaming.analytics import (  # noqa: F401
    dedup_stream,
    interval_join_streams,
    long_view,
    parse_serialized_stream,
    stateful_host_counters,
    windowed_metric_rates,
)
from syscol_spark.streaming.control import CollectorManager  # noqa: F401
from syscol_spark.streaming.http_control import ControlServer  # noqa: F401
from syscol_spark.streaming.pipeline import build_pipeline, enriched_stream, serialized_value  # noqa: F401
