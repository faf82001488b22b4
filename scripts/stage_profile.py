"""Stage-level attribution for one catalog query (round 14).

Runs builder + noop once in a session with the JSON event log enabled,
then reports per-stage: wall, summed executor task time, shuffle read/write
bytes, input bytes, and the first line of the stage's callsite — the
offline equivalent of the Spark UI's Stages tab (guide §7.1) for a box
with spark.ui disabled.

Usage: python scripts/stage_profile.py <query> [sf_dir] [reps]
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

LOGDIR = "/tmp/spark-events-profile"


def main():
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    shutil.rmtree(LOGDIR, ignore_errors=True)
    os.makedirs(LOGDIR)
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F
    from syscol_spark.session import default_parallelism, get_session
    from syscol_spark.plans.catalog import QUERIES, _ensure_loaded
    _ensure_loaded()
    # create the session FIRST with the event log on (get_session's
    # getOrCreate then reuses it — builder configs are ignored on reuse)
    cores = default_parallelism()
    (SparkSession.builder.appName("stageprof")
     .master(f"local[{cores}]")
     .config("spark.sql.shuffle.partitions", str(cores))
     .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
     .config("spark.ui.enabled", "false")
     .config("spark.eventLog.enabled", "true")
     .config("spark.eventLog.dir", LOGDIR)
     .config("spark.eventLog.compress", "false")
     .config("spark.eventLog.rolling.enabled", "false")
     .getOrCreate())
    spark = get_session("stageprof")
    # warmup
    li = spark.read.parquet(f"{sf}/lineitem.parquet").limit(10000)
    li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s")).write.format(
        "noop").mode("overwrite").save()
    sc = spark.sparkContext
    marks = []
    for r in range(reps):
        t0 = time.time()
        df = QUERIES[name].builder(spark, sf)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        marks.append((t0, t1, t2))
        print(f"# rep{r}: build {t1-t0:.2f}s noop {t2-t1:.2f}s", file=sys.stderr)
        import gc
        gc.collect()
        for jrdd in list(sc._jsc.getPersistentRDDs().values()):
            jrdd.unpersist()
    spark.stop()
    time.sleep(1)
    # parse event log
    logs = [os.path.join(LOGDIR, f) for f in os.listdir(LOGDIR) if not f.endswith(".inprogress")]
    if not logs:
        logs = [os.path.join(LOGDIR, f) for f in os.listdir(LOGDIR)]
    stages = {}
    for path in logs:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except Exception:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    stages[sid] = {
                        "wall": (com - sub) / 1000.0 if sub and com else None,
                        "sub": sub,
                        "tasks": si.get("Number of Tasks"),
                        "name": si.get("Stage Name", "")[:80],
                        "details": (si.get("Details") or "").split("\n")[0][:100],
                        "task_time": 0.0, "sr": 0, "sw": 0, "inp": 0, "pyt": 0.0,
                    }
                elif ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    if sid not in stages:
                        stages[sid] = {"wall": None, "sub": None, "tasks": None, "name": "?",
                                       "details": "", "task_time": 0.0, "sr": 0, "sw": 0, "inp": 0, "pyt": 0.0}
                    tm = ev.get("Task Metrics") or {}
                    st = stages[sid]
                    st["task_time"] += (tm.get("Executor Run Time") or 0) / 1000.0
                    st["sr"] += ((tm.get("Shuffle Read Metrics") or {}).get("Remote Bytes Read") or 0) + \
                                ((tm.get("Shuffle Read Metrics") or {}).get("Local Bytes Read") or 0)
                    st["sw"] += ((tm.get("Shuffle Write Metrics") or {}).get("Shuffle Bytes Written") or 0)
                    st["inp"] += ((tm.get("Input Metrics") or {}).get("Bytes Read") or 0)
    # assign stages to reps by submission time
    def rep_of(sub):
        if sub is None:
            return "?"
        t = sub / 1000.0
        for i, (t0, t1, t2) in enumerate(marks):
            if t0 <= t <= t2 + 0.5:
                return f"{i}{'b' if t <= t1 else 'n'}"
        return "w"
    rows = sorted(stages.items())
    print(f"{'sid':>4} {'rep':>3} {'wall':>7} {'ttime':>8} {'tasks':>5} {'shr':>9} {'shw':>9} {'input':>9}  name")
    for sid, st in rows:
        if st["wall"] is None:
            continue
        print(f"{sid:>4} {rep_of(st['sub']):>3} {st['wall']:7.2f} {st['task_time']:8.2f} "
              f"{st['tasks']:>5} {st['sr']:>9} {st['sw']:>9} {st['inp']:>9}  {st['name'][:60]}")


if __name__ == "__main__":
    main()
