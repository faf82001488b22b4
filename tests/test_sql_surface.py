"""SQL-string surface + envelope long-view tests.

The reference has NO SQL surface (SURVEY.md §2.10); the engine adds one via
registered views — any spark.sql() query over the catalog tables works.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from syscol_spark.functions.envelope import ENVELOPE_SCHEMA, explode_envelope
from syscol_spark.sources.tables import register_views


def test_spark_sql_over_views(spark, sf_dir):
    register_views(spark, sf_dir)
    rows = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(rows) == 3
    assert rows[0]["n"] >= rows[1]["n"] >= rows[2]["n"]


def test_sql_over_events_derived_columns(spark, sf_dir):
    register_views(spark, sf_dir)
    [row] = spark.sql(
        "SELECT COUNT(*) AS n, MIN(ts_us) AS lo FROM events WHERE ts_ns div 1000 = ts_us"
    ).collect()
    assert row["n"] > 0  # ns→µs derivation consistent for every row


def test_explode_envelope_long_view(spark):
    df = spark.createDataFrame(
        [("S1", "h1", 5051, "ns", 1704067798778549829, {"m/a": 1.5, "m/b": 2.0})],
        ENVELOPE_SCHEMA,
    )
    env_df = df.select(
        F.struct(*[F.col(c) for c in df.columns]).alias("envelope")
    )
    long_view = explode_envelope(env_df)
    rows = {r["metric"]: r for r in long_view.collect()}
    assert set(rows) == {"m/a", "m/b"}
    r = rows["m/a"]
    assert r["value"] == 1.5
    assert r["slave_id"] == "S1" and r["hostname"] == "h1"
    assert r["ts_ns"] == 1704067798778549829
    # µs truncation contract
    assert r["ts"].microsecond == (1704067798778549829 // 1000) % 1_000_000
