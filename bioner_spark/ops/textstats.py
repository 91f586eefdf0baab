"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All native Spark SQL (whole-stage codegen) with
exact DuckDB oracles.

These are the corpus-quality stages a web-scale training-data pipeline runs
before NER/KG extraction: cheap, per-row, shuffle-free projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists (heuristic language ID).
#: THE ASCII whitespace class, spelled out instead of `\s`: Java regex
#: (Spark) counts U+000B vertical tab as `\s` but RE2 (DuckDB) does not
#: (measured — the divergence ops.dedup.normalized documents), so the
#: engine and the DuckDB oracles both state the class explicitly. For the
#: Spark side this is a semantic no-op (Java `\s` == exactly this class);
#: it exists so the oracles can match it character-for-character.
WS_CHARS = r" \t\n\x0B\f\r"
WS_RE = f"[{WS_CHARS}]"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
}


def _words(text_col):
    """Lower-cased word list with NO empty tokens: Java `split` keeps the
    empty strings that leading/trailing whitespace produces (and "" splits
    to [""]), so an unfiltered size() over-counts edge-whitespace docs and
    reports 1 word for the empty document. The filter makes n_words the
    true word count for any whitespace layout (tabs/newlines included —
    `trim` alone only strips spaces)."""
    return F.filter(F.split(F.lower(text_col), WS_RE + "+"), lambda w: F.length(w) > 0)


def stopword_hits(text_col, lang: str):
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(_words(text_col), lambda w: F.array_contains(sw, w)))


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """argmax of per-language stopword hit counts; 'und' (undetermined) when
    no stopword matches OR text is NULL. Deterministic tie-break:
    en > de > fr (hit order). The explicit isNull guard matters: without it
    every NULL-text row falls through the NULL-valued whens into the
    `otherwise` branch and is silently classified 'fr'."""
    c = F.col(text_col)
    hits = {lang: stopword_hits(c, lang) for lang in STOPWORDS}
    best = F.greatest(*hits.values())
    guess = (
        F.when(c.isNull() | (best <= 0), F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["de"] == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return df.withColumn("lang_guess", guess)


def with_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / digit ratios + a composite score
    in [0,1]. The classic pre-training quality filter features."""
    c = F.col(text_col)
    words = _words(c)
    n_words = F.size(words)
    n_chars = F.length(c)
    # exact mean: sum(len(word)) == len(text with ALL whitespace removed) —
    # correct for any separator layout (the old single-space-join closed
    # form (n_chars - n_words + 1)/n_words over-counted doubled spaces and
    # edge whitespace as word characters)
    mean_word_len = F.round(
        F.length(F.regexp_replace(c, WS_RE + "+", "")) / F.greatest(n_words, F.lit(1)), 6
    )
    punct_ratio = F.round(
        F.length(F.regexp_replace(c, r"[^\p{P}]", "")) / F.greatest(n_chars, F.lit(1)), 6
    )
    digit_ratio = F.round(
        F.length(F.regexp_replace(c, r"[^0-9]", "")) / F.greatest(n_chars, F.lit(1)), 6
    )
    stop_ratio = F.round(
        stopword_hits(c, "en") / F.greatest(n_words, F.lit(1)), 6
    )
    # Composite score in EXACT integer micros — no float rounding anywhere.
    # The old float formula (0.4*len_score + 0.3*min(5*stop,1) + ...) over
    # 6-decimal-rounded ratios lands exactly on 7th-digit .5 boundaries
    # (1.5 × a 6-decimal ratio), where Spark's BigDecimal HALF_UP round and
    # an independent engine's float-based ROUND can disagree on the last
    # digit (observed once at sf0.1: 0.758505 vs 0.758506). Fix: quantize
    # each ratio to integer micros with floor `div` (pure int64 ops, no
    # boundary semantics at all), combine with integer weights 4/3/2/1, and
    # expose score = micros / 1e7 — one IEEE division of exact integers,
    # bit-identical on any engine. Same [0,1] semantics, quantized at 1e-6
    # like before.
    def _idiv(a, b):
        # exact non-negative int64 floor division: (a - a%b) is divisible by
        # b and ≤ ~1e11 here, so the IEEE double division is exact
        return ((a - a % b) / b).cast("long")

    micro = F.lit(1000000).cast("long")
    w1 = F.greatest(n_words, F.lit(1)).cast("long")
    c1 = F.greatest(n_chars, F.lit(1)).cast("long")
    n_stop = stopword_hits(c, "en").cast("long")
    n_punct = F.length(F.regexp_replace(c, r"[^\p{P}]", "")).cast("long")
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("long")
    len_t = F.least(n_words.cast("long"), F.lit(100)) * F.lit(10000)
    stop_t = F.least(F.lit(5) * _idiv(micro * n_stop, w1), micro)
    punct_t = micro - F.least(F.lit(4) * _idiv(micro * n_punct, c1), micro)
    digit_t = micro - F.least(F.lit(4) * _idiv(micro * n_digit, c1), micro)
    score_micro = F.lit(4) * len_t + F.lit(3) * stop_t + F.lit(2) * punct_t + digit_t
    score = score_micro / F.lit(10000000.0)
    return df.withColumns(
        {
            "n_words": n_words,
            "n_chars": n_chars,
            "mean_word_len": mean_word_len,
            "punct_ratio": punct_ratio,
            "digit_ratio": digit_ratio,
            "stopword_ratio": stop_ratio,
            "quality_score": score,
        }
    )


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate: number of
    matches of (up to 4 letters | digit | punctuation) — the cheap
    pre-tokenizer budget estimate used for context-length planning."""
    c = F.col(text_col)
    return df.withColumns(
        {
            # REUSE _words, don't restate its law: lower() can't change a
            # count, and an inline copy of the split+filter rule can drift
            # from the quality/lang-ID features next time the law moves
            "ws_tokens": F.size(_words(c)),
            "subword_est": F.regexp_count(
                c, F.lit(r"[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9" + WS_CHARS + "]")
            ),
        }
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized md5 content fingerprint (exact-dedup key) + a 16-hex-char
    prefix as a compact join key. Normalization is `ops.dedup.normalized` —
    the ONE definition batch dedup, streaming dedup and fingerprints all
    share (and the DuckDB oracles hardcode), so the three paths cannot
    drift apart."""
    from bioner_spark.ops.dedup import normalized

    return df.withColumn(
        "fingerprint", F.md5(normalized(F.col(text_col)))
    ).withColumn("fingerprint16", F.substring(F.col("fingerprint"), 1, 16))
