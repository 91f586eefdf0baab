"""Extractor goldens (modeled on reference tests/test_pubmed_parser.py:8-21
byte-exact style) + the Spark-vs-single-node byte-identity invariant."""

from __future__ import annotations

from bioner_spark import corpus as corpus_mod
from bioner_spark.extract import (
    extract_text,
    strip_truncation_marker,
    truncation_marker_stats,
    with_extracted_text,
)


def test_strip_truncation_markers():
    # semantics of reference pubmed_parser.py:41-53 (one marker, elif order)
    assert strip_truncation_marker("abc (ABSTRACT TRUNCATED AT 250 WORDS)") == "abc "
    assert strip_truncation_marker("abc (ABSTRACT TRUNCATED AT 400 WORDS)") == "abc "
    assert strip_truncation_marker("abc (ABSTRACT TRUNCATED)") == "abc "
    assert strip_truncation_marker("no marker here") == "no marker here"
    # mid-text markers untouched
    assert strip_truncation_marker("(ABSTRACT TRUNCATED) then more") == "(ABSTRACT TRUNCATED) then more"


def test_extract_text_strips_boilerplate():
    html = (
        b"<html><head><title>T</title><script>x=1</script></head><body>"
        b"<nav>menu</nav><p>hello   world</p><p>second block</p>"
        b"<footer>foot</footer></body></html>"
    )
    assert extract_text(html) == "hello world\nsecond block"


def test_extract_text_edge_cases():
    assert extract_text(b"") == ""
    assert extract_text(None) == ""
    assert extract_text(b"plain text no tags") == "plain text no tags"
    assert extract_text("<p>25 \xb0C ( 77 \xb0F )</p>".encode("utf-8")) == "25 \xb0C ( 77 \xb0F )"
    # entity unescaping via convert_charrefs
    assert extract_text(b"<p>a &amp; b</p>") == "a & b"


def test_spark_extraction_byte_identical(spark, corpus):
    """THE per-url invariant (BASELINE.json input_hint)."""
    pages = corpus_mod.pages_spark_df(spark, corpus)
    extracted = with_extracted_text(
        pages.select("url", "html"), html_col="html", out_col="extracted"
    )
    rows = extracted.join(
        corpus_mod.pages_spark_df(spark, corpus).select("url", "text"), "url"
    ).collect()
    assert len(rows) == len(corpus.pages)
    for r in rows:
        assert r["extracted"] == r["text"], r["url"]


def test_truncation_stats(spark, corpus):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "abc (ABSTRACT TRUNCATED AT 250 WORDS)",
                    "def (ABSTRACT TRUNCATED)",
                    "plain",
                ]
            }
        )
    )
    row = truncation_marker_stats(df, text_col="text").collect()[0]
    assert row["total_docs"] == 3
    assert row["truncated_250"] == 1
    assert row["truncated_plain"] == 1
    assert row["truncated_400"] == 0
