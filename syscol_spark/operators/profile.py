"""Column profiling: per-column null counts, exact distinct counts and
min/max in ONE aggregation pass (north-star: data-quality audit before a
training run).

Scale notes (100 TB): the whole profile is a single groupBy-less aggregate —
one scan, one map-side-combined reduction to a single row, then a plan-time
unpivot of that row into the long report shape. The expensive parts are the
exact COUNT(DISTINCT col) expressions: Spark expands multiple distinct
aggregates into one Expand (rows × n_cols intermediate), which is the honest
price of exact cardinalities. For a quick audit at extreme scale, pass
``approx=True`` to swap in HLL approx_count_distinct — same single-pass
shape, no Expand (that variant has no exact oracle, by nature).

Values are reported as strings so heterogeneous columns fit one report
schema; doubles go through DECIMAL(27,6) so Spark and DuckDB render
identical text (both print the full fixed scale).
"""

from __future__ import annotations

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
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            distinct.cast("long").alias(f"__nd_{c}"),
            _as_text(F.min(c), dtypes[c]).alias(f"__mn_{c}"),
            _as_text(F.max(c), dtypes[c]).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__mn_{c}").alias("min_str"),
                F.col(f"__mx_{c}").alias("max_str"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
