"""Query catalog: every operator the engine claims, as a (Spark builder,
DuckDB oracle SQL) pair.

This is the engine's coverage contract (SURVEY.md §2 / §2.11): each entry is
one operator or operator composition, exercised end-to-end on the TESTDATA
tables. The driver runs the Spark side and the oracle side at sf0.01 and
hash-compares values, so both sides must agree on column NAMES and rounded
VALUES.

Parity rules (learned from probing Spark 4.1.2 vs DuckDB 1.0.0):
- Timestamps: DuckDB truncates parquet ns-timestamps to µs; Spark reads them
  as int64 ns. Compare epoch-microsecond longs (`ts_ns div 1000` ≡
  ``epoch_us(ts)``) — never raw timestamp objects.
- Integer aggregates: DuckDB SUM(BIGINT) returns HUGEINT and rank() returns
  BIGINT; cast BOTH sides to BIGINT/long explicitly.
- Float aggregates: sums of doubles are order-dependent at the last ulp;
  round to a fixed scale on both sides with the same expression.
- Top-k: deterministic tie-breaks (include a unique key in ORDER BY).
- Quantized measures: keep them as INTEGERS end-to-end. floor(1e6·x)/1e6
  then re-scaling later re-casts an unrepresentable k/1e6 double: Spark's
  double→long cast truncates, DuckDB's rounds — off by 1 on k−ε values
  (bit us at sf0.1 in q_doc_repetition).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    description: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, description: str = "") -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, builder=fn, oracle=oracle, description=description)
        return fn

    return deco


def query_catalog() -> dict[str, Builder]:
    _ensure_loaded()
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql_catalog() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query module exactly once (imports populate QUERIES)."""
    global _LOADED
    if _LOADED:
        return
    import syscol_spark.plans.core  # noqa: F401
    import syscol_spark.plans.events  # noqa: F401
    import syscol_spark.plans.extra  # noqa: F401
    import syscol_spark.plans.mining  # noqa: F401
    import syscol_spark.plans.northstar  # noqa: F401
    import syscol_spark.plans.pipeline  # noqa: F401
    import syscol_spark.plans.quality  # noqa: F401
    import syscol_spark.plans.retrieval  # noqa: F401
    import syscol_spark.plans.tpch2  # noqa: F401
    import syscol_spark.plans.tpch3  # noqa: F401

    _LOADED = True
