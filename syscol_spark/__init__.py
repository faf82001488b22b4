"""syscol_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of elodina/syscol, rebuilt Spark-first.

The reference (/root/reference, Go) is a Mesos metrics-collection pipeline:
poll node metrics -> envelope -> JSON/Confluent-Avro -> Kafka. This engine
re-expresses that pipeline as Structured Streaming (sources/, streaming/,
functions/) and adds the full analytics surface the pipeline exists to serve
(plans/, operators/): aggregations, event-time windows, joins (incl. as-of and
range), dedup families, similarity search, text analysis — all designed for
100 TB scale on a real cluster (broadcast joins, partial aggregation,
AQE-friendly shuffles, no driver-side loops).
"""

__version__ = "0.1.0"

from syscol_spark.session import get_session  # noqa: F401
