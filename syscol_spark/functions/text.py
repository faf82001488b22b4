"""Text-analysis column expressions (north-star: training-data pipeline).

Everything here is a pure Catalyst column expression — JVM-side, inside
whole-stage codegen, zero Python in the hot path — so these run at full scan
throughput on a 100 TB documents table. (pandas UDF variants exist only where
semantics genuinely need Python; see operators/dedup.py simhash.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Deterministic default stopword list for the language-ID heuristic.
DEFAULT_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]

# Explicit punctuation class so Spark and any ANSI-SQL oracle agree exactly
# (regex character-class semantics differ between engines for [[:punct:]]).
PUNCT_CLASS = r"[.,!?;:]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (deterministic, engine-portable)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters in PUNCT_CLASS."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return n_punct / F.length(c)


def stopword_hits(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Number of tokens (with multiplicity) that are stopwords."""
    stops = F.array(*[F.lit(s) for s in (stopwords or DEFAULT_STOPWORDS)])
    return F.size(F.filter(tokens(col), lambda t: F.array_contains(stops, t))).cast("long")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles of a document, as an array<string>.

    Built from transform(sequence(...)) — no explode, no Python — so shingling
    stays inside codegen even for long documents.
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    # guard: doc shorter than n tokens yields the whole doc as one shingle
    return F.array_distinct(F.when(F.size(toks) >= n, sh).otherwise(F.array(F.concat_ws(" ", toks))))


def quality_score(col: Column | str, stopwords: list[str] | None = None) -> Column:
    """Deterministic heuristic quality score in [0, 1]:
    rewards reasonable length, stopword presence and low punctuation noise.
    Mirrors the shape of public LLM-data quality filters (C4/Gopher rules)
    without any model dependency.
    """
    n_tok = token_count(col)
    stop_ratio = stopword_hits(col, stopwords) / F.greatest(n_tok, F.lit(1))
    p_ratio = punct_ratio(col)
    len_term = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    return F.round(F.lit(0.5) * len_term + F.lit(0.4) * F.least(stop_ratio * 4, F.lit(1.0)) + F.lit(0.1) * (1 - F.least(p_ratio * 10, F.lit(1.0))), 6)
