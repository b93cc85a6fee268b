"""Text-analysis operators for training-data pipelines over the `documents`
table (doc_id, text, lang, source, n_chars).

All hot-path logic is native pyspark.sql.functions (JVM codegen); nothing
here drops to Python. Each operator has an ANSI-SQL oracle twin in
plans/driver_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic (public-knowledge function words)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "les", "de", "et"],
    "de": ["der", "die", "und", "das", "ist"],
}

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "that", "for"]


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words, numbers, and punctuation runs counted
    separately (a cheap BPE proxy — regexp on the JVM, no Python)."""
    return F.coalesce(
        F.regexp_count(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")), F.lit(0)
    ).cast("bigint")


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    p = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    toks = token_count(text)
    lowered = F.lower(text)
    hits: Column = F.lit(0)
    for w in STOPWORDS:
        hits = hits + F.coalesce(
            F.regexp_count(lowered, F.lit(rf"\b{w}\b")), F.lit(0)
        )
    return F.when(toks > 0, hits.cast("double") / toks.cast("double")).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + punctuation sanity
    + stopword presence. Deterministic, SQL-expressible."""
    n = F.length(text).cast("double")
    len_ok = F.when((n >= 50) & (n <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(text) < 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(text) > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Marker-word language ID: argmax of per-language marker hit counts,
    'und' when nothing matches. Ties break by language order (en first)."""
    lowered = F.lower(text)
    scores: list[tuple[str, Column]] = []
    for lang, words in LANG_MARKERS.items():
        s: Column = F.lit(0)
        for w in words:
            s = s + F.coalesce(F.regexp_count(lowered, F.lit(rf"\b{w}\b")), F.lit(0))
        scores.append((lang, s))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, s in reversed(scores):  # earlier langs win ties -> apply last
        # >= with reversed order lets earlier-priority languages STEAL ties
        # (first-maximal wins, like the oracle's en-first CASE chain); s > 0
        # keeps 'und' when nothing matched at all
        cond = (s >= best_score) & (s > 0)
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def fingerprint(text: Column, modulus: int = 2**31 - 1) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash over the
    normalized text, identical formula in Spark and ANSI SQL (the driver
    oracle) — NOT xxhash/md5 so both engines agree on arithmetic.

    fp = sum_i( (ascii(char_i) * 31^(i mod 8)) ) mod modulus over the first
    64 chars of the lowercased, whitespace-collapsed text.
    """
    norm = F.substring(F.regexp_replace(F.lower(text), r"\s+", " "), 1, 64)
    # aggregate over the char array, JVM-side
    chars = F.split(norm, "")
    return F.aggregate(
        F.zip_with(
            chars,
            F.sequence(F.lit(0), F.size(chars) - 1),
            lambda ch, i: F.ascii(ch) * F.pow(F.lit(31.0), (i % 8)).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc + x) % modulus,
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.length(t).cast("bigint").alias("n_chars_computed"),
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )
