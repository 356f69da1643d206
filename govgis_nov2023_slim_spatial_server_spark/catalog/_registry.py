"""Registry the driver contract (__spark_entry__.py) is built from.

Every operator claimed in SURVEY.md §2 registers here as a named query:
a (spark, sf_dir) -> DataFrame callable, plus — when ANSI-SQL-expressible —
a DuckDB oracle string with IDENTICAL output column names and value
rounding (the driver hash-compares sorted values; see task contract).

Conventions that make the hash comparison robust:
- every computed double is ROUND()ed the same way on both sides (sums →2,
  ratios/distances →4); group keys stay exact (ints/strings/dates);
- timestamps are emitted as epoch-second BIGINTs (Spark µs-truncation
  matches DuckDB's ns→µs coercion, but hashing raw timestamp objects is
  representation-fragile — integers are not);
- every ORDER BY that feeds a LIMIT carries a unique-key tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle=None`` ⇒ rows-only check (reserved for
    genuinely non-SQL-expressible ops — Spark-hash LSH, streaming)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def fmt_float_sql(x: float) -> str:
    """One double → a DuckDB literal that parses to EXACTLY that double.

    repr() is NOT safe here: DuckDB 1.0's decimal→DOUBLE parser is not
    correctly rounded — ~13% of 17-digit round-trippable reprs parse one
    ulp off (measured r13; 11 of the 64 PROBE_VEC components misparsed).
    The one-ulp probe skew propagated through every fold, hidden by the
    4-decimal output rounding until a property run landed an ORDER
    BY+LIMIT boundary between two ulp-adjacent distances
    (matryoshka_rerank_16's coarse cut). The EXACT finite decimal
    expansion of the double (every binary64 has one) parses with zero
    rounding — verified 0/4000 mismatches on both the bare-literal and
    CAST('…') paths."""
    from decimal import Decimal

    return format(Decimal(float(x)), "f")


def fmt_vec_sql(vec: list[float]) -> str:
    """Python float list → DuckDB DOUBLE[] literal (bit-exact parse —
    see fmt_float_sql)."""
    return "[" + ", ".join(fmt_float_sql(x) for x in vec) + "]"


def rnd_nz(col, n: int):
    """Round a double and normalize ``-0.0`` → ``+0.0``.

    The driver hashes exact values: a distance/similarity whose true value
    sits just below zero rounds to ``-0.0`` in one engine and ``+0.0`` in
    the other (r1's one hash failure, VERDICT.md). IEEE ``-0.0 + 0.0 =
    +0.0``, so adding zero after the round — on BOTH sides, the oracle does
    ``ROUND(x, n) + 0.0`` — collapses the two representations. Apply to any
    rounded column whose value can fall near or below zero.
    """
    from pyspark.sql import functions as F

    return F.round(col, n) + F.lit(0.0)


# DuckDB expression computing functions.text.quality_score over `text` —
# THE shared copy: quality-derived membership (weighted_sample_by_quality)
# and tier boundaries (quality_curriculum_buckets) require bit-identical
# doubles between engines, so every oracle must splice THIS string (the
# pre-r4 doc_quality oracle inlines the same formula ROUND-wrapped; any
# change to functions.text.quality_score must update both).
QUALITY_EXPR_SQL = """LEAST(GREATEST(
      0.5 * (LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / LENGTH(text))
      + 0.3 * (CASE WHEN LENGTH(text)::DOUBLE / len(regexp_split_to_array(trim(text), '\\s+'))
                         BETWEEN 3 AND 12 THEN 1.0 ELSE 0.0 END)
      + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / LENGTH(text)),
      0.0), 1.0)"""
