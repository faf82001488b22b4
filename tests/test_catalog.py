"""Catalog contract tests: registry shape + driver entry points."""

from __future__ import annotations


def test_catalog_shape():
    from syscol_spark.plans.catalog import oracle_sql_catalog, query_catalog

    q = query_catalog()
    o = oracle_sql_catalog()
    assert len(q) >= 30
    assert set(o) <= set(q)
    # every oracle is non-empty SQL
    assert all(s.strip().upper().startswith(("SELECT", "WITH")) for s in o.values())


def test_entry_contract(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"user_id", "minute_start", "n_events", "avg_value"}


def test_catalog_output_types_are_hashable(spark, sf_dir):
    """Driver-compare hygiene guard: every oracle-checked query must output
    only scalar columns DuckDB hashes identically (no timestamp/array/map/
    struct/binary — temporal values go out as epoch longs or strings)."""
    from pyspark.sql.types import (
        ArrayType,
        BinaryType,
        MapType,
        StructType,
        TimestampNTZType,
        TimestampType,
    )

    from syscol_spark.plans.catalog import QUERIES, _ensure_loaded

    _ensure_loaded()
    banned = (ArrayType, MapType, StructType, BinaryType, TimestampType, TimestampNTZType)
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        schema = spec.builder(spark, sf_dir).schema
        for field in schema.fields:
            assert not isinstance(field.dataType, banned), (
                f"{name}.{field.name} outputs {field.dataType} — not driver-hash-safe"
            )


def test_queries_run_smoke(spark, sf_dir):
    """Every catalog query must at least build and produce a schema
    (no execution — analysis catches missing columns/typos)."""
    from syscol_spark.plans.catalog import query_catalog

    for name, builder in query_catalog().items():
        df = builder(spark, sf_dir)
        assert df.schema.fieldNames(), name
