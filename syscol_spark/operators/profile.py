"""Column profiling: per-column null counts, exact distinct counts and
min/max (north-star: data-quality audit before a training run).

Scale notes (100 TB): one single-distinct aggregate PER COLUMN, unioned.
The obvious one-pass form (all COUNT(DISTINCT col) expressions in one agg)
makes Catalyst rewrite through an Expand that multiplies every input row by
(n_distinct_aggs + 1) — the same trap measured on q_approx_distinct (5.1 s
fused vs 0.5 s split at sf0.1). Splitting gives each branch a
column-pruned scan (same total I/O as one wide scan) and a clean two-phase
single-distinct aggregate with map-side partials — measured ~2x faster at
sf0.1 for the 5-column profile, and the gap widens with column count. For
extreme scale, pass ``approx=True`` to swap in HLL approx_count_distinct
(that variant has no exact oracle, by nature).

Values are reported as strings so heterogeneous columns fit one report
schema; doubles go through DECIMAL(27,6) so Spark and DuckDB render
identical text (both print the full fixed scale).
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import DoubleType, FloatType


def _as_text(col: Column, dtype) -> Column:
    if isinstance(dtype, (DoubleType, FloatType)):
        return col.cast("decimal(27,6)").cast("string")
    return col.cast("string")


def profile_columns(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """Long-format profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    if not cols:
        # reduce() over zero branches would raise a bare TypeError; return an
        # empty frame with the report schema instead.
        return df.sparkSession.createDataFrame(
            [],
            "column string, n_rows long, n_nulls long, n_distinct long, "
            "min_str string, max_str string",
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    branches: list[DataFrame] = []
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        one = df.select(c).agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.col(c)).alias("__nn"),
            distinct.cast("long").alias("n_distinct"),
            _as_text(F.min(c), dtypes[c]).alias("min_str"),
            _as_text(F.max(c), dtypes[c]).alias("max_str"),
        )
        branches.append(
            one.select(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col("__nn")).cast("long").alias("n_nulls"),
                "n_distinct",
                "min_str",
                "max_str",
            )
        )
    return reduce(DataFrame.unionAll, branches)
