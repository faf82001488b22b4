"""Benchmark harness: runs every catalog query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (computes every output
column, no collect/driver materialization), timed wall-clock after a warmup
of the input file listing.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # noqa: F401 - module-level so pandas_udf hints resolve

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import default_parallelism, get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = default_parallelism()
    _ensure_loaded()
    spark = get_session("bench")
    # warm up the JVM/codegen and file listing so the first query's number
    # reflects the query, not session startup: one pass that touches the
    # machinery every query shares (scan, hash agg over decimals, window,
    # shuffle join) on a tiny slice.
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # warmups are best-effort: a broken warmup must never zero the artifact
    # (the r3 lesson — one unguarded step cost the whole round's numbers)
    try:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        small = li.limit(10_000)
        (
            small.groupBy("l_returnflag")
            .agg(F.sum(F.col("l_quantity").cast("decimal(27,6)")).alias("s"))
            .join(small.groupBy("l_returnflag").count(), "l_returnflag")
            .select("*", F.row_number().over(Window.partitionBy("l_returnflag").orderBy("s")).alias("r"))
            .write.format("noop").mode("overwrite").save()
        )
        # also warm the documents scan + Arrow/pandas-UDF lane (the Python
        # worker pool, Arrow serde, and string-explode codegen), which the
        # text/embedding query families hit first — measured ~7 s of
        # first-touch latency landing on whichever of them ran first
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _plen(s: pd.Series) -> pd.Series:
            return s.str.len()

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2_000)
        (
            docs.select(F.explode(F.split("text", r"\s+")).alias("t"), _plen("text").alias("n"))
            .groupBy("t").agg(F.sum("n").alias("s"))
            .write.format("noop").mode("overwrite").save()
        )
        # ... and the mapInPandas lane, which is a SEPARATE Python-worker
        # path from ArrowEvalPython: without this, the first mapInPandas
        # query in the sweep (q_multimodal_features) paid ~7-10 s of
        # worker-pool + Arrow-stream first-touch that belongs to the session
        def _ident(it):
            yield from it

        docs.limit(200).select("doc_id").mapInPandas(_ident, schema="doc_id long").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception as exc:  # noqa: BLE001 - harness boundary
        print(f"# warmup: ERROR {type(exc).__name__}: {exc}", file=sys.stderr)

    # ---- degraded-window calibration guard (round-9 verdict ask #1a) ----
    # This box has externally noisy windows (r9's committed artifact was
    # +21% like-for-like vs r8 with zero code changes on the inflated
    # paths; /proc/stat shows nonzero steal time, so drift is invisible to
    # loadavg). Time two pinned reference queries (one JVM lane, one Arrow
    # lane) min-of-3 against their best committed clean-window values and
    # embed the ratios in the artifact.
    #
    # Round-15 contract change (r14 verdict ask #1): a degraded calibration
    # NO LONGER suppresses the timings by default. In round 14 the guard
    # aborted the driver's 32-core sweep at cal ratio 1.101 vs a 10%
    # tolerance and the round lost its only same-core ground truth; degraded
    # windows produced no record while lucky windows did. The sweep now runs
    # regardless and the one-line JSON carries window_guard.degraded plus
    # the cal ratios, so a consumer can discount the absolute numbers
    # instead of receiving none. Modes (SPARK_GRAFT_BENCH_GUARD):
    #   on (default) - calibrate, annotate, ALWAYS emit timings
    #   abort        - legacy behavior: refuse to emit on a degraded window
    #   off          - skip calibration entirely (saves ~1-2 min in a window
    #                  the operator already decided to measure; r10 advice)
    # Best-effort throughout: a broken guard must never zero the artifact
    # (the r3 warmup lesson).
    guard_mode = os.environ.get("SPARK_GRAFT_BENCH_GUARD", "on")
    if guard_mode == "off":
        guard_info: dict = {"skipped": "SPARK_GRAFT_BENCH_GUARD=off", "degraded": False}
    else:
        guard_info = _window_guard(spark, sf_dir)
    if _should_abort(guard_info, guard_mode):
        line = {
            "metric": "degraded_window_abort",
            "value": -1,
            "unit": "sec",
            "sf": sf,
            "error": (
                "calibration query exceeded tolerance vs committed clean-window"
                " reference; refusing to record weather as regression"
                " (SPARK_GRAFT_BENCH_GUARD=abort was set)"
            ),
            **guard_info,
        }
        _write_abort_record(line)
        print(json.dumps(line))
        return
    if guard_info.get("degraded"):
        print(
            "# window guard: DEGRADED window (cal ratio"
            f" {guard_info.get('cal_ratio')}) — timings will be emitted with"
            " window_guard.degraded=true; compare with care",
            file=sys.stderr,
        )

    # Per-query fault isolation: one broken builder must not zero the whole
    # artifact — record the error string, keep timing the rest, exit 0.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name, spec in QUERIES.items():
        t0 = time.time()
        try:
            df = spec.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 - harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: ERROR {errors[name]}", file=sys.stderr)
            continue
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)
        _release_cached(spark)

    # Re-time EVERY query up to twice more and keep the min-of-3:
    # back-to-back JVM sharing contaminates single-shot numbers (measured
    # 2.8 -> 18.5 s swings from concurrent GC/codegen pressure, plus
    # externally noisy windows on this box — r5 recorded q_ann_pq_adc at
    # 10.74 s shared vs 1.42 s solo), so round-over-round deltas are only
    # signal if each number is a min over repeats taken after the full
    # sweep. Coverage is budget-bounded (SPARK_GRAFT_BENCH_BUDGET_SEC,
    # default 1500 s wall for the whole harness) with repeats ordered
    # most-expensive-first, so if the box is having a pathological day the
    # noisiest numbers still get cleaned before the budget trips.
    t_start = time.time() - total
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "1500"))
    n_reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    rep_times: dict[str, list[float]] = {n: [t] for n, t in timings.items()}
    by_cost_order = sorted(timings, key=lambda n: -timings[n])
    for rep in range(1, n_reps):
        for name in by_cost_order:
            if time.time() - t_start > budget:
                break
            t0 = time.time()
            try:
                df = QUERIES[name].builder(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            except Exception:  # noqa: BLE001 - already recorded in pass 1
                continue
            rep_times[name].append(round(time.time() - t0, 3))
            _release_cached(spark)
        else:
            continue
        break
    solo_min = {n: round(min(ts), 3) for n, ts in rep_times.items()}
    reps_done = {n: len(ts) for n, ts in rep_times.items()}
    fully_repped = sum(1 for v in reps_done.values() if v >= n_reps)
    print(
        f"# min-of-{n_reps}: {fully_repped}/{len(timings)} queries fully repped "
        f"within {budget:.0f}s budget",
        file=sys.stderr,
    )

    # Ingest-pipeline throughput vs the reference's operational ceiling
    # (BASELINE.md: ~1000 msg/s for a 1000-node fleet): synthesize envelopes,
    # run the full enrich → JSON-serialize path, measure records/sec.
    try:
        ingest_rps = _ingest_throughput(spark)
    except Exception as exc:  # noqa: BLE001
        errors["_ingest"] = f"{type(exc).__name__}: {exc}"[:500]
        ingest_rps = -1

    # Noise-resistant numbers: `queries` now carries the min-of-N per query
    # (full catalog coverage — the r5 top-15-only map under the misnamed
    # `top10_min_of_3` key is retired), `total_best_known` sums it, and the
    # single-pass sweep stays available as `value`/`queries_single_pass`
    # for continuity with r1-r5 artifacts. Compare rounds on
    # `total_best_known` / `queries`; the box has externally noisy windows
    # (433 s vs 162 s sweeps with zero changes), so the shared-sweep total
    # is weather, not signal.
    # min AND median per query: the min is the best-known (cross-round
    # comparable) number; the median exposes the measured per-query jitter
    # so round-over-round deltas can be read against it instead of the
    # prose ±5%/±20% rule (round-6 verdict ask #7).
    import statistics

    queries_spread = {
        n: {"min": solo_min[n], "median": round(statistics.median(ts), 3)}
        for n, ts in rep_times.items()
    }
    # Like-for-like reconciliation vs the committed reference artifact
    # (r10 verdict ask #5): common-query totals, the delta pct, and the
    # top movers — embedded so a round-over-round comparison never needs
    # to be reconstructed by hand from two artifacts. The reference is
    # per-core-count (r14 verdict ask #1: the driver's 8-core run clobbered
    # the 32-core rolling reference because both lived at one path).
    vs_ref = _vs_reference(solo_min, cpus)

    full = {
        "metric": "catalog_total_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "timing": f"queries = min of {n_reps} serial reps (budget-bounded)",
        "queries": solo_min,
        "queries_spread": queries_spread,
        "sf": sf,
        "cpus": cpus,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "errors": errors,
        "ingest_envelopes_per_sec": ingest_rps,
        "n_reps": n_reps,
        "reps_done": reps_done,
        "queries_single_pass": timings,
        "total_best_known": round(sum(solo_min.values()), 3),
        "total_median": round(
            sum(v["median"] for v in queries_spread.values()), 3
        ),
        "window_guard": guard_info,
        "vs_reference": vs_ref,
        "loadavg_end": _loadavg(),
    }
    # Complete per-query artifact for the judge (the stdout line below is
    # size-capped and may omit the fastest queries). The path encodes the
    # core count so runs at different SPARK_GRAFT_CPUS never overwrite each
    # other's artifact; BENCH_FULL.json stays as the legacy rolling name at
    # the 32-core contract count only.
    full_name = _full_artifact_name(cpus)
    with open(os.path.join(_ARTIFACT_DIR, full_name), "w") as fh:
        json.dump(full, fh, indent=1)
    if cpus == 32:
        with open(os.path.join(_ARTIFACT_DIR, "BENCH_FULL.json"), "w") as fh:
            json.dump(full, fh, indent=1)

    # The driver captures only the LAST 2000 chars of stdout and parses the
    # JSON line out of that tail; with 114 catalog queries the full per-query
    # map blew past the window and rounds 2-4 recorded parsed=null. Emit a
    # final line capped at ~1900 chars: headline numbers + the slowest
    # queries that fit, with a pointer at the complete artifact. The
    # window_guard block is compacted to its verdict + per-lane ratios so a
    # degraded flag always survives the cap (full diagnostics in the
    # artifact file).
    line = dict(full)
    line["errors"] = {k: v[:80] for k, v in list(errors.items())[:3]}
    line.pop("reps_done", None)
    line.pop("queries_single_pass", None)
    line.pop("queries_spread", None)  # full per-query {min, median}: see full_results
    line["window_guard"] = _compact_guard(guard_info)
    line["full_results"] = full_name
    by_cost = sorted(solo_min, key=lambda n: -solo_min[n])
    for keep in range(len(by_cost), -1, -1):
        line["queries"] = {n: solo_min[n] for n in by_cost[:keep]}
        line["queries_omitted"] = len(solo_min) - keep
        out = json.dumps(line)
        if len(out) <= 1900:
            break
    print(out)


# Best demonstrated clean-window min-of-3 for the calibration queries.
# History: clean rounds r5-r8 spanned 1.03-1.20 s for q01 (r8: 1.159);
# from round 9 onward the box settled into a persistently slower state —
# four independent solo sessions across two days all measure q01 at
# 1.25-1.43 s and the 202-query min-of-3 total at 230-248 s (vs r8's
# 199 s), with JVM-side queries +8-13% and Arrow-lane queries +30-60% on
# code-identical paths (see ARCHITECTURE.md round-10 autopsy). That is a
# stack/host shift, not weather, so the references pin the CURRENT
# demonstrated-stable clean values (BENCH_r10, guard-passed window:
# q01 1.223, q_tfidf 1.805); the guard's job is to catch windows degraded
# relative to them (r9's worst window measured q01 at 2.1 s — still
# cleanly outside the band).
#
# TWO lanes, because the r10 autopsy shows they degrade INDEPENDENTLY
# (JVM +8-13% while Arrow +30-60%): a guard keyed only to a JVM query can
# pass while the Python-worker lane is inflated, and vice versa.
#   - q01_pricing_summary: pure JVM whole-stage-codegen agg (untouched
#     since round 2) — catches JVM/GC/host degradation.
#   - q_tfidf: pandas-UDF tokenize + shuffle over documents — catches
#     Python-worker-pool / Arrow-serde degradation.
# Round-15 re-pin (r14 verdict ask #1):
#   - q01: 1.25 was the r10 value; four independent recent sessions
#     (r14 driver 32c window: 1.376/1.384; driver 8c: 1.325; builder
#     windows: 1.35+) converge on ~1.33-1.39, so 1.40 is the current
#     demonstrated-stable clean value. (The old 1.25 ref aborted the r14
#     driver sweep at ratio 1.101 — weather read as regression.)
#   - q_tfidf: its batch-3 r14 optimization moved the clean min from 1.805
#     to ~1.6 (driver window 1.596); the stale 2.0 ref made the Arrow lane
#     dead weight (a 37%-degraded window still calibrated green). Re-pinned
#     to 1.70, slightly above the post-optimization min because the Arrow
#     lane is intrinsically jumpier.
# Since round 15 a degraded verdict annotates rather than suppresses (see
# main()), so a tripped guard costs nothing but honesty.
_CAL_QUERIES: dict[str, float] = {
    "q01_pricing_summary": 1.40,
    "q_tfidf": 1.70,
}


# The committed read-only reference for like-for-like deltas, per core
# count. bench.py NEVER writes these paths: r11's abort and r14's 8-core
# driver run both clobbered the old single-path rolling reference
# (BENCH_FULL.json), so reference and output are now separate files.
def _ref_bench_name(cpus: int) -> str:
    return f"BENCH_REF_c{cpus}.json"


def _full_artifact_name(cpus: int) -> str:
    return f"BENCH_FULL_c{cpus}.json"


def _compact_guard(guard_info: dict) -> dict:
    """The stdout line is size-capped; keep the guard verdict + per-lane
    ratios so 'degraded' always survives, and point at the artifact for
    the full diagnostics."""
    out = {"degraded": guard_info.get("degraded", False)}
    if "skipped" in guard_info:
        out["skipped"] = guard_info["skipped"]
    if "degraded_reason" in guard_info:
        out["degraded_reason"] = guard_info["degraded_reason"]
    lanes = guard_info.get("cal_queries")
    if isinstance(lanes, dict):
        out["cal_ratios"] = {
            n: e.get("ratio") for n, e in lanes.items() if isinstance(e, dict)
        }
    return out


# Degraded-window aborts (legacy SPARK_GRAFT_BENCH_GUARD=abort mode) are
# recorded HERE, never in a reference or rolling artifact.
_ABORT_RECORD = "BENCH_ABORT.json"

# Where bench artifacts land; module-level so tests can point it at a tmp dir
# without monkeypatching os.path internals.
_ARTIFACT_DIR = os.path.dirname(os.path.abspath(__file__))


def _should_abort(guard_info: dict, guard_mode: str) -> bool:
    """A degraded window suppresses timings ONLY under the explicit
    legacy opt-in (SPARK_GRAFT_BENCH_GUARD=abort). Default mode always
    emits — the r14 driver sweep must never again be lost to weather."""
    return bool(guard_info.get("degraded")) and guard_mode == "abort"


def _write_abort_record(line: dict) -> None:
    with open(os.path.join(_ARTIFACT_DIR, _ABORT_RECORD), "w") as fh:
        json.dump(line, fh, indent=1)


def _vs_reference(solo_min: dict[str, float], cpus: int = 32) -> dict:
    """Per-query reconciliation vs the committed read-only reference for
    this core count: common-query min-of-N totals, delta pct, and the top
    movers in each direction (>=20% and >=0.3 s). Never raises."""
    ref_name = _ref_bench_name(cpus)
    try:
        with open(os.path.join(_ARTIFACT_DIR, ref_name)) as fh:
            data = json.load(fh)
        ref = {k: float(v) for k, v in (data.get("queries") or {}).items()}
        common = sorted(set(ref) & set(solo_min))
        if not common:
            return {"reference": ref_name, "error": "no common queries"}
        s_ref = sum(ref[q] for q in common)
        s_new = sum(solo_min[q] for q in common)
        movers = sorted(
            (
                (round(100.0 * (solo_min[q] - ref[q]) / max(ref[q], 0.05), 1), q)
                for q in common
                if abs(solo_min[q] - ref[q]) >= 0.3
                and abs(solo_min[q] - ref[q]) / max(ref[q], 0.05) >= 0.2
            ),
            reverse=True,
        )
        return {
            "reference": ref_name,
            "n_common": len(common),
            "ref_total_sec": round(s_ref, 3),
            "new_total_sec": round(s_new, 3),
            "delta_pct": round(100.0 * (s_new - s_ref) / s_ref, 1),
            "regressions": [{"query": q, "pct": p} for p, q in movers if p > 0][:5],
            "improvements": [{"query": q, "pct": p} for p, q in reversed(movers) if p < 0][:5],
        }
    except Exception as exc:  # noqa: BLE001 - diagnostics only
        return {"reference": ref_name, "error": f"{type(exc).__name__}: {exc}"[:200]}


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as fh:
            return [float(x) for x in fh.read().split()[:3]]
    except Exception:  # noqa: BLE001 - diagnostics only
        return []


def _mem_available_gb() -> float:
    try:
        with open("/proc/meminfo") as fh:
            for ln in fh:
                if ln.startswith("MemAvailable:"):
                    return round(int(ln.split()[1]) / 1024 / 1024, 1)
    except Exception:  # noqa: BLE001 - diagnostics only
        pass
    return -1.0


def _await_idle_window() -> dict:
    """Refuse to calibrate on a busy box: sleep-retry (bounded) until the
    1-min loadavg drops under the threshold. Min-of-3 calibration
    demonstrably does NOT catch a draining box (r12 rank_fusion/bm25,
    r13's five >30% phantom rows both calibrated green at loadavg 6-12 and
    inflated first-rep-heavy queries); the load gate is the cheap check
    that would have rejected both windows. Returns diagnostics; "passed"
    False means the box never drained within the wait budget."""
    threshold = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_LOADAVG", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_IDLE_WAIT_SEC", "600"))
    poll = 20.0
    gate: dict = {"threshold_1min": threshold, "max_wait_sec": max_wait, "samples": []}
    waited = 0.0
    while True:
        la = _loadavg()
        gate["samples"].append({"waited_sec": round(waited, 1), "loadavg": la})
        # empty loadavg (unreadable /proc) => pass open: the gate is an
        # extra tripwire, not a new single point of failure
        if not la or la[0] <= threshold:
            gate["passed"] = True
            break
        if waited >= max_wait:
            gate["passed"] = False
            break
        print(
            f"# idle gate: 1-min loadavg {la[0]:.2f} > {threshold:.1f},"
            f" sleeping {poll:.0f}s ({waited:.0f}/{max_wait:.0f}s waited)",
            file=sys.stderr,
        )
        time.sleep(poll)
        waited += poll
    gate["waited_sec"] = round(waited, 1)
    return gate


def _window_guard(spark, sf_dir: str) -> dict:
    """Min-of-3 each pinned calibration query (one JVM lane, one Arrow lane)
    and compare against the best committed clean-window values. Returns
    diagnostics; sets "degraded" only when some lane stays past tolerance
    across every attempt — or when the idle-window load gate never clears.
    Never raises."""
    tol = float(os.environ.get("SPARK_GRAFT_BENCH_GUARD_PCT", "10")) / 100.0
    attempts = int(os.environ.get("SPARK_GRAFT_BENCH_GUARD_ATTEMPTS", "3"))
    info: dict = {
        "cal_queries": {
            name: {"ref_sec": ref, "attempts": []} for name, ref in _CAL_QUERIES.items()
        },
        "cal_tolerance_pct": round(tol * 100, 1),
        "loadavg_start": _loadavg(),
        "mem_available_gb": _mem_available_gb(),
        "degraded": False,
    }
    try:
        info["idle_gate"] = _await_idle_window()
        if not info["idle_gate"]["passed"]:
            info["degraded"] = True
            info["degraded_reason"] = "idle gate: loadavg never drained"
            return info
        _ensure_loaded()  # self-sufficient: callable outside main()'s preamble

        def _lane_ok(name: str) -> bool:
            entry = info["cal_queries"][name]
            return min(entry["attempts"]) <= entry["ref_sec"] * (1 + tol)

        for attempt in range(attempts):
            for name, ref in _CAL_QUERIES.items():
                entry = info["cal_queries"][name]
                # don't re-burn a lane that already measured clean
                if entry["attempts"] and _lane_ok(name):
                    continue
                spec = QUERIES[name]
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    spec.builder(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    ts.append(time.time() - t0)
                    _release_cached(spark)
                entry["attempts"].append(round(min(ts), 3))
                print(
                    f"# window guard attempt {attempt + 1}: {name}"
                    f" min-of-3 {entry['attempts'][-1]:.3f}s (ref {ref:.3f}s,"
                    f" loadavg {_loadavg()})",
                    file=sys.stderr,
                )
            if all(_lane_ok(n) for n in _CAL_QUERIES):
                break
            if attempt < attempts - 1:
                time.sleep(30)  # give a transient co-tenant time to drain
        degraded_lanes = []
        for name in _CAL_QUERIES:
            entry = info["cal_queries"][name]
            entry["min_sec"] = min(entry["attempts"])
            entry["ratio"] = round(entry["min_sec"] / entry["ref_sec"], 3)
            entry["degraded"] = not _lane_ok(name)
            if entry["degraded"]:
                degraded_lanes.append(name)
        info["degraded"] = bool(degraded_lanes)
        # summary fields (continuity with r10's single-query artifacts):
        # keyed to the WORST lane by ratio
        worst = max(_CAL_QUERIES, key=lambda n: info["cal_queries"][n]["ratio"])
        info["cal_query"] = worst
        info["cal_ref_sec"] = info["cal_queries"][worst]["ref_sec"]
        info["cal_min_sec"] = info["cal_queries"][worst]["min_sec"]
        info["cal_attempts"] = info["cal_queries"][worst]["attempts"]
        info["cal_ratio"] = info["cal_queries"][worst]["ratio"]
    except Exception as exc:  # noqa: BLE001 - guard must not zero the artifact
        info["guard_error"] = f"{type(exc).__name__}: {exc}"[:200]
    return info


def _release_cached(spark) -> None:
    """Drop persisted/localCheckpointed blocks left behind by the previous
    query. Iterative operators materialize intermediates (edge lists,
    signatures); across 107 back-to-back queries those blocks otherwise pile
    up in executor memory until the async ContextCleaner catches up, and the
    resulting GC pressure showed up as 2-3x run-to-run swings on later
    queries. Queries are self-contained, so dropping everything is safe."""
    import gc

    gc.collect()  # let py4j release DataFrame handles first
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:  # noqa: BLE001 - cleanup is best-effort
        pass


def _ingest_throughput(spark, n_records: int = 1_000_000, n_metrics: int = 100) -> int:
    """Records/sec through the reference-parity ingest path (P1 enrich +
    P2 JSON serialization) on synthetic envelopes with ~100 metrics each —
    the reference's record shape (BASELINE.md: 100-300 doubles)."""
    import pyspark.sql.functions as F

    from syscol_spark.functions.envelope import enrich_envelope, envelope_to_json

    metrics = F.map_from_arrays(
        F.array(*[F.lit(f"slave/metric_{i}") for i in range(n_metrics)]),
        F.array(*[(F.col("id") * 31 + i).cast("double") for i in range(n_metrics)]),
    )

    def pipeline(n: int):
        base = spark.range(n).select(
            F.col("id"),
            metrics.alias("m"),
        )
        env = enrich_envelope(
            F.col("m"),
            slave_id=F.concat(F.lit("slave-"), F.col("id").cast("string")),
            hostname=F.concat(F.lit("host-"), F.pmod(F.col("id"), F.lit(1000)).cast("string")),
            port=5051,
            namespace="bench",
            timestamp_ns=F.col("id") * 1_000_000 + F.lit(1_700_000_000_000_000_000),
        )
        return base.select(envelope_to_json(env).alias("value"))

    # Warm the codegen/JIT for THIS plan shape before measuring: the first
    # execution pays whole-stage-codegen compilation + JIT of the large
    # serialization expression (measured 54k rec/s cold vs 470k warm — the
    # cold number reflects compiler latency, not pipeline throughput).
    # Best-of-2 measured reps: the ingest measurement runs LAST, after the
    # 112-query sweep plus the min-of-3 re-runs, and a single rep under
    # end-of-sweep GC pressure understated a solo-measured ~500k rec/s by
    # 5x once; one retry recovers the real number.
    pipeline(20_000).write.format("noop").mode("overwrite").save()
    best = 0
    for _ in range(2):
        _release_cached(spark)
        t0 = time.time()
        pipeline(n_records).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = max(best, int(n_records / dt))
    return best


if __name__ == "__main__":
    main()
