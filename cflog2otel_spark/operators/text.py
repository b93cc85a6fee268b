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


GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(text: Column) -> dict[str, Column]:
    """The document-level Gopher quality-filter rules (Rae et al. 2021,
    "Scaling Language Models", appendix A1.1 — the published heuristic set
    most training pipelines start from), as named boolean columns:

      word_count_ok   50 <= #words <= 100,000
      mean_word_ok    3 <= mean word length <= 10
      symbol_ok       (# + ellipsis) / words <= 0.1
      alpha_ok        >= 80% of words contain an alphabetic char
      stopword_ok     >= 2 distinct common stop words present

    All JVM-side; every regex is shared verbatim with the DuckDB oracle
    (no lookarounds — RE2 compatibility).
    """
    toks = token_count(text)
    nonws_chars = F.length(F.regexp_replace(text, r"\s", ""))
    mean_wl = F.when(toks > 0, nonws_chars.cast("double") / toks).otherwise(F.lit(0.0))
    symbols = F.coalesce(F.regexp_count(text, F.lit(r"#|\.\.\.")), F.lit(0))
    sym_ratio = F.when(toks > 0, symbols.cast("double") / toks).otherwise(F.lit(0.0))
    words = F.split(F.trim(text), r"\s+")
    alpha_words = F.when(
        F.trim(text) == "", F.lit(0)
    ).otherwise(F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))))
    alpha_frac = F.when(toks > 0, alpha_words.cast("double") / toks).otherwise(F.lit(0.0))
    lowered = F.lower(text)
    distinct_stops: Column = F.lit(0)
    for w in GOPHER_STOPS:
        distinct_stops = distinct_stops + F.when(
            F.coalesce(F.regexp_count(lowered, F.lit(rf"\b{w}\b")), F.lit(0)) > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
    return {
        "word_count_ok": (toks >= 50) & (toks <= 100_000),
        "mean_word_ok": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "symbol_ok": sym_ratio <= 0.1,
        "alpha_ok": alpha_frac >= 0.8,
        "stopword_ok": distinct_stops >= 2,
    }


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule verdicts + the conjunction (`keep`). A
    training pipeline filters on `keep`; the per-rule booleans are the
    audit trail for why a document dropped."""
    rules = gopher_rules(F.col(text_col))
    cols = [v.alias(k) for k, v in rules.items()]
    keep = None
    for v in rules.values():
        keep = v if keep is None else (keep & v)
    return docs.select("doc_id", *cols, keep.alias("keep"))


def repetition_ratio(text: Column, n: int = 2) -> Column:
    """Within-document repetition: 1 - distinct/total word n-grams (the
    duplicate-n-gram-fraction family of Gopher A1.1 / MassiveText repetition
    filters). 0.0 for docs with no n-grams. JVM-side, shares the shingle
    construction with dedup.shingles but WITHOUT the distinct."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    parts = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(F.size(toks) - j, F.lit(1)))
        parts = F.zip_with(parts, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.slice(parts, 1, count)
    return F.when(
        count > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / count,
    ).otherwise(F.lit(0.0))


# regexes shared verbatim with the DuckDB oracle — RE2-compatible (no
# lookarounds), anchored on word boundaries
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Training-corpus PII scrub: emails -> <EMAIL>, IPv4s -> <IP>.
    Order matters — emails first, so an address containing digits/dots
    never half-matches the IP pattern afterwards."""
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, IPV4_RE, "<IP>")


def pii_counts(text: Column) -> tuple[Column, Column]:
    return (
        F.coalesce(F.regexp_count(text, F.lit(EMAIL_RE)), F.lit(0)).cast("bigint"),
        F.coalesce(F.regexp_count(text, F.lit(IPV4_RE)), F.lit(0)).cast("bigint"),
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
