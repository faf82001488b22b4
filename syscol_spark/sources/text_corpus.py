"""JSONL / CSV text-corpus readers with corrupt-record quarantine.

Real training corpora arrive as compressed JSONL shards (one document per
line), not as clean parquet — and at 100 TB some fraction of lines is
always malformed (truncated shards, encoding damage, schema drift). The
reference's scrape loop has the same stance at its scale: a bad response
becomes an error row, never a failed batch (syscol/executor.go — scrape
errors are swallowed into the envelope, the pipeline keeps running).

Design: lines are read as TEXT and parsed with the ``from_json`` /
``from_csv`` EXPRESSIONS (with an in-struct corrupt-record column), not
with the raw-file JSON/CSV readers. Same parse, three wins:

- the raw line is retained next to the parse, so the quarantine frame can
  show exactly what arrived (the raw readers forbid querying only the
  corrupt column — UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN);
- one pass, no schema inference (inference reads the data twice and pins
  the corpus to whatever the first shard contained);
- the identical expressions run on a ``readStream.text`` for streaming
  ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

#: the documents-table shape (TESTDATA.md) as it would arrive in JSONL
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: StructType) -> StructType:
    return StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
) -> DataFrame:
    """JSONL corpus → (raw_line, doc struct with in-struct quarantine)."""
    raw = spark.read.text(path)
    doc = F.from_json(
        F.col("value"),
        _with_corrupt(schema),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
    )
    return raw.select(F.col("value").alias("raw_line"), doc.alias("doc"))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCUMENT_SCHEMA,
    *,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    """CSV corpus, same quarantine contract as :func:`read_jsonl`.

    With ``header=True`` the exact header line (schema field names joined
    by ``sep``) is dropped wherever it appears — per-shard headers
    included.
    """
    raw = spark.read.text(path)
    if header:
        raw = raw.filter(F.col("value") != sep.join(f.name for f in schema.fields))
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in _with_corrupt(schema).fields)
    doc = F.from_csv(
        F.col("value"),
        F.lit(ddl),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT, "sep": sep},
    )
    return raw.select(F.col("value").alias("raw_line"), doc.alias("doc"))


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean parsed rows, quarantined raw lines) from a reader frame."""
    ok = F.col(f"doc.{_CORRUPT}").isNull()
    clean = df.filter(ok).select("doc.*").drop(_CORRUPT)
    bad = df.filter(~ok).select("raw_line")
    return clean, bad
