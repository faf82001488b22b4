"""Scalar/utility function parity (SURVEY.md §2.7, complete first-party
list): every helper the reference implements, as a Catalyst expression.

| ref | source | here |
|-----|--------|------|
| U1 uuid()             | syscol/utils.go:24-28      | uuid_col |
| U2 suffix(s,n)        | syscol/utils.go:30-36      | suffix |
| U3 idString           | syscol/utils.go:38-40      | id_string |
| U4 slaveFromTaskId    | syscol/scheduler.go:256-262| slave_from_task_id |
| U7 JSON marshal       | metrics_reporter.go:125+   | to_json/from_json (envelope.py) |
| U8 ns timestamp       | metrics_reporter.go:139    | now_ns |
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def uuid_col() -> Column:
    """U1: random v4-style uuid per row."""
    return F.expr("uuid()")


def suffix(col: Column | str, n: int) -> Column:
    """U2: last n characters (shorter strings returned whole)."""
    return F.substring(col, -n, n)


def id_string(col: Column | str, n: int = 5) -> Column:
    """U3: '#' + last-5-of-id display form."""
    return F.concat(F.lit("#"), suffix(col, n))


def slave_from_task_id(task_id: Column | str) -> Column:
    """U4: task id 'syscol-<slaveid>-<uuid36>' → slave id — strip the fixed
    37-char '-<uuid>' suffix after the first '-' (scheduler.go:256-262)."""
    c = F.col(task_id) if isinstance(task_id, str) else task_id
    # drop leading 'syscol-' then drop trailing 37 chars ('-' + 36-char uuid)
    inner = F.regexp_replace(c, r"^[^-]+-", "")
    return F.substring(inner, F.lit(1), F.length(inner) - 37)


def now_ns() -> Column:
    """U8: current time as Unix nanoseconds (µs precision × 1000 — Spark has
    no ns clock; the 3 trailing zeros are the documented delta)."""
    return (F.unix_micros(F.current_timestamp()) * 1000).cast("long")
