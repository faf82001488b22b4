"""Dev-loop oracle parity checker — mirrors the driver's compare.

Runs every catalog query on Spark and its DuckDB oracle on the same parquet,
sorts columns by name, sorts rows, and compares values (exact for
ints/strings, tiny epsilon for floats to absorb rounding-boundary noise the
driver's hash would also see — treat any eps hit as a red flag).

Usage: python scripts/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from syscol_spark.plans.catalog import QUERIES, _ensure_loaded  # noqa: E402
from syscol_spark.session import get_session  # noqa: E402
from syscol_spark.sources.tables import TABLE_NAMES  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return a == b or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.001"
    only = [a for a in sys.argv[1:] if "/" not in a]
    _ensure_loaded()
    spark = get_session("parity")
    con = duck_connection(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.builder(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok*   {name}: rows-only, {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(spec.oracle)
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        scols_l = [c.lower() for c in scols]
        if sorted(scols_l) != sorted(ocols):
            print(f"FAIL  {name}: column mismatch spark={sorted(scols_l)} oracle={sorted(ocols)}")
            failures += 1
            continue
        sn = normalize(srows, scols_l)
        on = normalize(orows, ocols)
        if len(sn) != len(on):
            print(f"FAIL  {name}: row count spark={len(sn)} oracle={len(on)}")
            failures += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(sn, on)):
            if not all(values_equal(x, y) for x, y in zip(sr, orow)):
                bad = (i, sr, orow)
                break
        if bad:
            print(f"FAIL  {name}: value mismatch at row {bad[0]}\n  spark : {bad[1]}\n  oracle: {bad[2]}")
            failures += 1
        else:
            print(f"ok    {name}: {len(sn)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{'FAILURES: ' + str(failures) if failures else 'ALL GREEN'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
