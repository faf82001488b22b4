"""Watermark-bounded KEYED state evidence at the 10x (sf1) scale.

STREAM_SCALE.json's first entry proved the easy bound: streaming_cms keeps
a FIXED 768-cell state no matter what flows through. The interesting
production bound is the watermark one — state O(active keys in the
eviction horizon), NOT O(total distinct keys) and NOT O(events) — and this
probe measures it on streaming_capped_sessions
(streaming/analytics.py: applyInPandasWithState, EventTimeTimeout), the
keyed twin with real per-user session state.

Setup: the sf1 events table (1M events, 15k distinct users, 30 days of
event time) is re-staged into 30 one-day time-ordered chunks written
SEQUENTIALLY (strictly increasing mod-times, so the file source replays
them in event-time order — the arrival contract a real stream satisfies;
the as-generated part files each span all 30 days and would advance the
watermark to the end in one batch). Each micro-batch is one day. With
gap=600 s, grace=3600 s, watermark=1 h, a user is evicted once the
watermark passes last_event + ~70 min, so post-batch state must hover at
the users active in the last ~2 h of event time (~2-3k) while ~13k
distinct users are touched per batch — the plateau/sawtooth the claim
predicts. A stateful operator whose state grew with keys would climb
toward 15k and stay there.

Conservation check (exactly-once across the keyed state): the time-ordered
staging means NO event is ever behind the watermark, so the latest
snapshot per (user, session_start, sub_session) must account for every
one of the 1,000,000 input events: SUM(max n_events) == 1e6.

Merges a second entry into STREAM_SCALE.json (existing CMS entry becomes
probes.cms_sf1). Run ALONE (bench discipline):
    python scripts/streaming_keyed_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from syscol_spark.session import get_session  # noqa: E402
from syscol_spark.streaming.analytics import streaming_capped_sessions  # noqa: E402

SF1_EVENTS = os.path.join(REPO, ".localdata", "sf1", "events.parquet")
N_CHUNKS = 30
GAP_US = 600_000_000
GRACE_MS = 3_600_000
WATERMARK = "1 hour"


def stage_time_ordered(spark, staging: str) -> int:
    """Write the events as N_CHUNKS range-partitioned files, one WRITE per
    chunk so mod-times strictly increase (the parquet file source orders
    its backlog by mod-time; a single parallel write could tie)."""
    # Spark 4.1 reads the ns-timestamp parquet as timestamp_ntz; cast to a
    # session-tz timestamp (UTC session) for the watermark clock — the
    # staged copy is then a plain µs timestamp both engines read the same
    ev = spark.read.parquet(SF1_EVENTS).select(
        F.col("ts").cast("timestamp").alias("event_time"), "user_id", "event_id"
    )
    bounds = ev.select(
        F.min("event_time").alias("lo"), F.max("event_time").alias("hi")
    ).collect()[0]
    lo, hi = bounds["lo"], bounds["hi"]
    span = (hi - lo).total_seconds() + 1
    chunked = ev.withColumn(
        "chunk",
        F.least(
            F.lit(N_CHUNKS - 1),
            ((F.unix_micros("event_time") - F.lit(int(lo.timestamp() * 1e6)))
             / F.lit(span * 1e6 / N_CHUNKS)).cast("int"),
        ),
    ).localCheckpoint()
    n = 0
    for c in range(N_CHUNKS):
        (
            chunked.filter(F.col("chunk") == c)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(os.path.join(staging, f"chunk-{c:03d}"))
        )
        n += 1
        # one fsync-visible write per chunk; mod-time ordering == time order
    return n


def main() -> int:
    spark = get_session("streaming_keyed_scale")
    staging = tempfile.mkdtemp(prefix="keyed_scale_events_")
    ckpt = tempfile.mkdtemp(prefix="keyed_scale_ckpt_")
    try:
        stage_time_ordered(spark, staging)
        t0 = time.time()
        stream = (
            spark.readStream.schema("event_time timestamp, user_id long, event_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{staging}/chunk-*/part-*.parquet")
        )
        q = (
            streaming_capped_sessions(
                stream,
                gap_us=GAP_US,
                evict_grace_ms=GRACE_MS,
                watermark=WATERMARK,
            )
            .writeStream.format("memory")
            .queryName("sess_sf1")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        progress = [json.loads(p.json) for p in q.recentProgress]
        q.stop()

        batches = []
        for p in progress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            batches.append(
                {
                    "batch_id": p["batchId"],
                    "input_rows": p["numInputRows"],
                    "state_rows_total": ops[0]["numRowsTotal"],
                    "state_rows_updated": ops[0]["numRowsUpdated"],
                    "state_rows_removed": ops[0]["numRowsRemoved"],
                    "state_memory_bytes": ops[0]["memoryUsedBytes"],
                    "late_rows_dropped": ops[0].get("numRowsDroppedByWatermark", 0),
                }
            )
        wall = round(time.time() - t0, 1)

        final = spark.sql(
            """
            SELECT CAST(SUM(n) AS BIGINT) AS accounted,
                   CAST(COUNT(*) AS BIGINT) AS n_subsessions
            FROM (
              SELECT user_id, session_start_us, sub_session,
                     max(n_events) AS n
              FROM sess_sf1 GROUP BY 1, 2, 3
            )
            """
        ).collect()[0]
        ev = spark.read.parquet(SF1_EVENTS)
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()

        mid = [b for b in batches if b["batch_id"] >= 3]
        peak = max(b["state_rows_total"] for b in mid)
        late = sum(b["late_rows_dropped"] for b in batches)
        entry = {
            "metric": "streaming_capped_sessions_state_bound_sf1",
            "operator": "streaming_capped_sessions (applyInPandasWithState, EventTimeTimeout)",
            "sf_dir": SF1_EVENTS,
            "n_events": n_events,
            "n_distinct_keys": n_users,
            "n_batches": len(batches),
            "events_per_sec": round(n_events / wall, 0),
            "wall_s": wall,
            "gap_us": GAP_US,
            "evict_grace_ms": GRACE_MS,
            "watermark": WATERMARK,
            "peak_state_rows_after_warmup": peak,
            "state_bounded_below_keyspace": peak < n_users // 2,
            "late_rows_dropped": late,
            "conservation_ok": int(final["accounted"]) == n_events and late == 0,
            "events_accounted": int(final["accounted"]),
            "n_final_subsessions": int(final["n_subsessions"]),
            "batches": batches,
            "note": (
                "state_rows_total per batch is the POST-EVICTION active-user"
                " count: it must plateau at the users whose last event is"
                " within watermark-delay + gap + grace (~2h of event time)"
                " of the frontier — not climb toward the 15k keyspace. The"
                " conservation row proves eviction never dropped an open"
                " session early: every input event is in exactly one final"
                " sub-session snapshot."
            ),
        }

        path = os.path.join(REPO, "STREAM_SCALE.json")
        with open(path) as fh:
            existing = json.load(fh)
        if "probes" not in existing:
            existing = {"probes": {"cms_sf1": existing}}
        existing["probes"]["capped_sessions_sf1"] = entry
        with open(path, "w") as fh:
            json.dump(existing, fh, indent=1, sort_keys=True)
            fh.write("\n")
        ok = entry["conservation_ok"] and entry["state_bounded_below_keyspace"]
        print(json.dumps({k: v for k, v in entry.items() if k != "batches"}, indent=1))
        print("OK" if ok else "FAILED BOUND/CONSERVATION")
        return 0 if ok else 1
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
