"""Scalar/utility function parity (SURVEY.md §2.7, complete first-party
list): every helper the reference implements, as a Catalyst expression.

| ref | source | here |
|-----|--------|------|
| U1 uuid()             | syscol/utils.go:24-28      | uuid_col |
| U2 suffix(s,n)        | syscol/utils.go:30-36      | suffix |
| U3 idString           | syscol/utils.go:38-40      | id_string |
| U4 slaveFromTaskId    | syscol/scheduler.go:256-262| slave_from_task_id |
| U5 pretty-printers    | syscol/utils.go:42-108     | offer_string / offers_string / resources_string / attributes_string / status_string |
| U7 JSON marshal       | metrics_reporter.go:125+   | to_json/from_json (envelope.py) |
| U8 ns timestamp       | metrics_reporter.go:139    | now_ns |

U5 formatting delta (documented, like the U8 ns clock): Go fmt %.2f rounds
half-EVEN, Java's Formatter (format_string) rounds half-UP — outputs differ
only for scalars whose binary value is an exact decimal half (e.g. 0.125).
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


# --- U5 pretty-printers (syscol/utils.go:42-108) ----------------------------
# The reference formats Mesos offers/statuses for its scheduler log. The
# engine's analog formats the same shapes as columns: an offer is a struct
# (hostname, id, resources, attributes) where resources is
# array<struct<name, scalar, ranges:array<struct<begin, end>>>> and
# attributes is array<struct<name, text, scalar>>. All pure Catalyst
# expressions — usable for log/debug output at scan throughput.


def resources_string(resources: Column | str) -> Column:
    """U5 resourcesString (utils.go:55-74): 'name:SCALAR[b..e]...' per
    resource, space-joined. Scalar formatted %.2f when present; each range
    appended as '[begin..end]'."""
    res = F.col(resources) if isinstance(resources, str) else resources

    def one(r: Column) -> Column:
        scalar = F.when(r["scalar"].isNotNull(), F.format_string("%.2f", r["scalar"])).otherwise(F.lit(""))
        ranges = F.when(
            r["ranges"].isNotNull(),
            F.aggregate(
                r["ranges"],
                F.lit(""),
                lambda acc, rr: F.concat(acc, F.format_string("[%d..%d]", rr["begin"], rr["end"])),
            ),
        ).otherwise(F.lit(""))
        return F.concat(r["name"], F.lit(":"), scalar, ranges)

    return F.concat_ws(" ", F.transform(res, one))


def attributes_string(attributes: Column | str) -> Column:
    """U5 attributesString (utils.go:76-93): 'name:TEXT' or 'name:SCALAR'
    per attribute, ';'-joined."""
    attrs = F.col(attributes) if isinstance(attributes, str) else attributes

    def one(a: Column) -> Column:
        text = F.coalesce(a["text"], F.lit(""))
        scalar = F.when(a["scalar"].isNotNull(), F.format_string("%.2f", a["scalar"])).otherwise(F.lit(""))
        return F.concat(a["name"], F.lit(":"), text, scalar)

    return F.concat_ws(";", F.transform(attrs, one))


def offer_string(
    hostname: Column | str,
    offer_id: Column | str,
    resources: Column | str,
    attributes: Column | str,
) -> Column:
    """U5 offerString (utils.go:51-53): '\\n<host>#<id-5> <resources> <attrs>'."""
    host = F.col(hostname) if isinstance(hostname, str) else hostname
    oid = F.col(offer_id) if isinstance(offer_id, str) else offer_id
    return F.format_string(
        "\n%s%s %s %s", host, id_string(oid), resources_string(resources), attributes_string(attributes)
    )


def offers_string(offers: Column | str) -> Column:
    """U5 offersString (utils.go:42-49): concatenation of offer_string over
    an array<struct<hostname, id, resources, attributes>> column, in array
    order (the reference iterates the offer slice in order)."""
    offs = F.col(offers) if isinstance(offers, str) else offers
    return F.aggregate(
        offs,
        F.lit(""),
        lambda acc, o: F.concat(acc, offer_string(o["hostname"], o["id"], o["resources"], o["attributes"])),
    )


def status_string(
    task_id: Column | str,
    state: Column | str,
    slave_id: Column | str,
    reason: Column | str,
    message: Column | str,
) -> Column:
    """U5 statusString (utils.go:96-108): '<task> <state> slave: #<id-5>',
    '+ reason: <r>' unless TASK_RUNNING, '+ message: <m>' when non-empty."""
    tid = F.col(task_id) if isinstance(task_id, str) else task_id
    st = F.col(state) if isinstance(state, str) else state
    sid = F.col(slave_id) if isinstance(slave_id, str) else slave_id
    rsn = F.col(reason) if isinstance(reason, str) else reason
    msg = F.col(message) if isinstance(message, str) else message
    base = F.format_string("%s %s slave: %s", tid, st, id_string(sid))
    r = F.when(st != "TASK_RUNNING", F.concat(F.lit(" reason: "), F.coalesce(rsn, F.lit("")))).otherwise(F.lit(""))
    m = F.when(msg.isNotNull() & (msg != ""), F.concat(F.lit(" message: "), msg)).otherwise(F.lit(""))
    return F.concat(base, r, m)
