"""Watermark-bounded KEYED state evidence at the 10x (sf1) scale.

STREAM_SCALE.json's first entry proved the easy bound: streaming_cms keeps
a FIXED 768-cell state no matter what flows through. The interesting
production bound is the watermark one — state O(keys active inside the
eviction horizon), NOT O(distinct keys ever seen) and NOT O(events) — and
this probe measures it on streaming_capped_sessions
(streaming/analytics.py: applyInPandasWithState, EventTimeTimeout), the
keyed twin with real per-user session state.

Setup: the sf1 events table (1M events, 15k distinct users, 30 days of
event time) is sorted by event time in the driver and re-staged as ~720
one-HOUR parquet chunks with artificially increasing mod-times (the file
source replays its backlog in mod-time order, one chunk per micro-batch —
the arrival contract a real stream satisfies; the as-generated part files
each span all 30 days and a first cut with DAY chunks showed why
granularity matters: ~89% of users emit every day, so day batches keep the
whole keyspace legitimately active and post-batch state == keyspace).
With hour batches, gap=600 s, grace=3600 s, watermark=1 h, a user is
evicted once the watermark passes last_event + ~70 min, so post-batch
state must plateau at the users active in the trailing ~3 h of event time
(~4k) while the cumulative touched keyspace (recorded per batch) climbs
to 15k within days — the O(active)-vs-O(ever-seen) divergence is the
claim, visible directly in the two curves.

Conservation check (exactly-once through the keyed state): time-ordered
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
CHUNK_SECONDS = 3600
GAP_US = 600_000_000
GRACE_MS = 3_600_000
WATERMARK = "1 hour"
WARMUP_BATCHES = 80  # ~3.3 days: past both watermark spin-up and keyspace ramp


def stage_time_ordered(spark, staging: str) -> list[dict]:
    """Driver-side pyarrow staging: sort the 1M events by time once, slice
    into one-hour chunks, write each as one parquet file with an explicitly
    increasing mod-time (os.utime) so the streaming file source's
    mod-time-ordered backlog replays them in event-time order. Returns
    per-chunk rows incl. the cumulative-distinct-user curve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Spark 4.1 reads the ns-timestamp parquet as timestamp_ntz; go through
    # unix micros so the staged copy is a plain µs timestamp (UTC)
    pdf = (
        spark.read.parquet(SF1_EVENTS)
        .select(
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "user_id",
            "event_id",
        )
        .toPandas()
        .sort_values(["ts_us", "event_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    t_lo = int(pdf["ts_us"].iloc[0])
    chunk_ids = ((pdf["ts_us"] - t_lo) // (CHUNK_SECONDS * 1_000_000)).astype(int)
    seen: set[int] = set()
    rows = []
    base_mtime = time.time() - 1e6
    for i, c in enumerate(sorted(chunk_ids.unique())):
        part = pdf[chunk_ids == c]
        tbl = pa.table(
            {
                "event_time": pa.Array.from_pandas(part["ts_us"]).cast(
                    pa.timestamp("us", tz="UTC")
                ),
                "user_id": pa.Array.from_pandas(part["user_id"]),
                "event_id": pa.Array.from_pandas(part["event_id"]),
            }
        )
        path = os.path.join(staging, f"chunk-{i:04d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (base_mtime + i, base_mtime + i))
        seen.update(int(u) for u in part["user_id"].unique())
        rows.append(
            {"batch_id": i, "chunk_events": len(part), "cum_distinct_keys": len(seen)}
        )
    return rows


def main() -> int:
    spark = get_session("streaming_keyed_scale")
    spark.conf.set("spark.sql.shuffle.partitions", "8")  # 720 tiny batches
    staging = tempfile.mkdtemp(prefix="keyed_scale_events_")
    ckpt = tempfile.mkdtemp(prefix="keyed_scale_ckpt_")
    try:
        chunks = stage_time_ordered(spark, staging)
        n_chunks = len(chunks)

        # capture ALL progress events (recentProgress keeps ~100)
        from pyspark.sql.streaming import StreamingQueryListener

        progress: list[dict] = []

        class Capture(StreamingQueryListener):
            def onQueryStarted(self, event):
                pass

            def onQueryProgress(self, event):
                progress.append(json.loads(event.progress.json))

            def onQueryIdle(self, event):
                pass

            def onQueryTerminated(self, event):
                pass

        spark.streams.addListener(Capture())

        t0 = time.time()
        stream = (
            spark.readStream.schema("event_time timestamp, user_id long, event_id long")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{staging}/chunk-*.parquet")
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
        q.awaitTermination(3000)
        q.stop()
        time.sleep(2)  # listener drain

        by_batch = {c["batch_id"]: c for c in chunks}
        batches = []
        for p in progress:
            ops = p.get("stateOperators") or []
            if not ops:
                continue
            b = {
                "batch_id": p["batchId"],
                "input_rows": p["numInputRows"],
                "state_rows_total": ops[0]["numRowsTotal"],
                "state_rows_removed": ops[0]["numRowsRemoved"],
                "late_rows_dropped": ops[0].get("numRowsDroppedByWatermark", 0),
                "cum_distinct_keys": by_batch.get(p["batchId"], {}).get(
                    "cum_distinct_keys"
                ),
            }
            batches.append(b)
        batches.sort(key=lambda b: b["batch_id"])
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

        steady = [b for b in batches if b["batch_id"] >= WARMUP_BATCHES]
        peak = max(b["state_rows_total"] for b in steady)
        evicted = sum(b["state_rows_removed"] for b in batches)
        late = sum(b["late_rows_dropped"] for b in batches)
        entry = {
            "metric": "streaming_capped_sessions_state_bound_sf1",
            "operator": "streaming_capped_sessions (applyInPandasWithState, EventTimeTimeout)",
            "sf_dir": SF1_EVENTS,
            "n_events": n_events,
            "n_distinct_keys": n_users,
            "n_batches": len(batches),
            "batch_granularity": f"{CHUNK_SECONDS}s of event time per micro-batch",
            "events_per_sec": round(n_events / wall, 0),
            "wall_s": wall,
            "gap_us": GAP_US,
            "evict_grace_ms": GRACE_MS,
            "watermark": WATERMARK,
            "peak_state_rows_steady_state": peak,
            "steady_from_batch": WARMUP_BATCHES,
            "state_bounded_below_keyspace": peak < n_users // 2,
            "total_evictions": evicted,
            "late_rows_dropped": late,
            "conservation_ok": int(final["accounted"]) == n_events and late == 0,
            "events_accounted": int(final["accounted"]),
            "n_final_subsessions": int(final["n_subsessions"]),
            "batches": batches,
            "note": (
                "state_rows_total per batch is the POST-EVICTION active-user"
                " count; cum_distinct_keys is the keyspace ever touched. The"
                " claim is the divergence: the keyspace curve climbs to 15k"
                " within days while state plateaus at the users whose last"
                " event is inside the eviction horizon (watermark delay +"
                " gap + grace ~= trailing 3h of event time). The"
                " conservation row proves eviction never dropped an open"
                " session early: every input event lands in exactly one"
                " final sub-session snapshot. A first cut used 1-DAY"
                " batches and measured state == keyspace (13.8k) — not an"
                " operator bug but the fixture's granularity: ~89% of users"
                " emit every day, so nothing was ever idle for a day."
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
        print(
            json.dumps(
                {k: v for k, v in entry.items() if k != "batches"}, indent=1
            )
        )
        curve = [
            (b["batch_id"], b["state_rows_total"], b["cum_distinct_keys"])
            for b in batches
            if b["batch_id"] % 60 == 0
        ]
        print("curve (batch, state, cum_keys):", curve)
        print("OK" if ok else "FAILED BOUND/CONSERVATION")
        return 0 if ok else 1
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
