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


def test_ewma_matches_python_recurrence(spark, sf_dir):
    """q_ev_ewma vs an independent driver-side fold: s_k = 0.5*s + 0.5*x over
    each user's last-16 frame (both IEEE doubles, so equality is exact)."""
    from syscol_spark.plans.catalog import query_catalog
    from syscol_spark.sources.tables import load_table

    got = {
        r["event_id"]: r["ewma"]
        for r in query_catalog()["q_ev_ewma"](spark, sf_dir).collect()
    }
    ev = sorted(
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts_us", F.col("value").cast("double"))
        .collect(),
        key=lambda r: (r["user_id"], r["ts_us"], r["event_id"]),
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for rows in by_user.values():
        for i, r in enumerate(rows):
            frame = [x["value"] for x in rows[max(0, i - 15) : i + 1]]
            s = frame[0]
            for x in frame[1:]:
                s = s * 0.5 + x * 0.5
            assert got[r["event_id"]] == s, (r["event_id"], got[r["event_id"]], s)
            checked += 1
    assert checked == len(got) > 0
