"""Text-analysis operators for training-data pipelines (BASELINE.json north
star; SURVEY.md §2.C LLM extensions): tokenization, token statistics,
quality scoring, language-ID heuristic, document fingerprinting.

Everything is built-in `pyspark.sql.functions` (JVM-side, codegen'd) — no
Python UDFs in any hot path, so these run at full scan speed on 100 TB of
documents. Token arrays are computed once and reused across derived columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import dround

#: Small deterministic stopword list used for quality/language features.
STOPWORDS = ("a", "the", "of", "and", "to", "in", "is", "it")

#: Deterministic language marker tokens (toy n-gram-profile stand-in: real
#: profiles would be char-trigram frequency tables; the fixture text is
#: synthetic word soup, so markers keep the heuristic honest + testable).
LANG_MARKERS = {
    "es": ("el", "la", "de", "que"),
    "fr": ("le", "la", "et", "les"),
    "de": ("der", "die", "und", "das"),
    "zh": ("de", "shi", "le", "bu"),
}


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokenization (split on runs of whitespace, drop empties)."""
    return F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")


def bpe_ish_tokens_col(text_col: str = "text") -> Column:
    """BPE-ish subword proxy: alpha runs, digit runs and single punctuation
    marks each count as one token — the standard cheap token-count
    estimator when no real tokenizer is shipped. RE2-safe pattern (no
    lookarounds), so any RE2-based engine (DuckDB included) reproduces it
    exactly; used by queries/llm.llm_bpe_token_count."""
    return F.regexp_extract_all(
        # \s, not the literal space: tabs/newlines are separators, not
        # phantom punctuation tokens (round-4 review finding; the DuckDB
        # oracle in queries/llm.py shares the identical pattern).
        F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0
    )


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, unique ratio, mean token
    length, stopword ratio, punctuation ratio."""
    toks = tokens_col(text_col)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return (
        df.withColumn("tokens", toks)
        .withColumn("n_tokens", F.size("tokens"))
        .withColumn("n_uniq_tokens", F.size(F.array_distinct("tokens")))
        .withColumn(
            "uniq_ratio",
            dround(F.col("n_uniq_tokens") / F.col("n_tokens"), 4),
        )
        .withColumn(
            "avg_token_len",
            dround(
                F.aggregate(
                    "tokens", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
                )
                / F.col("n_tokens"),
                4,
            ),
        )
        .withColumn(
            "stopword_ratio",
            dround(
                F.size(F.filter("tokens", lambda t: F.array_contains(stop_arr, t)))
                / F.col("n_tokens"),
                4,
            ),
        )
        .withColumn(
            "punct_ratio",
            dround(
                (
                    F.length(text_col)
                    - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
                )
                / F.length(text_col),
                4,
            ),
        )
    )


def quality_score_col() -> Column:
    """Deterministic quality score over the token-stats columns: rewards
    lexical diversity and sane token lengths, penalizes stopword spam.
    Range ~[0,1]; thresholds tuned for filtering, not ranking."""
    length_ok = F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 1.0).otherwise(0.5)
    # dround, not F.round: this value is oracle-compared (and averaged
    # into oracle-compared aggregates), where Spark's decimal-repr
    # rounding diverges from DuckDB on ties — see functions.dround.
    return dround(
        0.4 * F.col("uniq_ratio")
        + 0.3 * length_ok
        + 0.3 * (1 - F.least(F.col("stopword_ratio") * 2, F.lit(1.0))),
        4,
    )


def language_id_col() -> Column:
    """Marker-token language vote over `tokens`; 'en' fallback. First match
    in a fixed language order keeps it deterministic."""
    expr = F.lit("en")
    for lang in reversed(sorted(LANG_MARKERS)):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter("tokens", lambda t: F.array_contains(markers, t)))
        expr = F.when(hits >= 2, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_col(mod: int = 1_000_000_007) -> Column:
    """Order-sensitive rolling-hash fingerprint over `tokens`: a polynomial
    hash of (first-char codepoint, token length) pairs. Pure integer
    arithmetic so any engine reproduces it (the DuckDB oracle uses
    list_reduce with the same recurrence)."""
    return F.aggregate(
        "tokens",
        F.lit(0).cast("long"),
        lambda acc, t: (acc * 31 + F.ascii(t) * 131 + F.length(t)) % mod,
    )
