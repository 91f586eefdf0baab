"""Boilerplate-stripped HTML → text extraction.

The reference's extraction stage is PubMed gzip-XML → abstract text
(reference bioner/preprocessing/pubmed_parser.py:20-53): pull the payload
element, strip three literal trailing truncation markers, emit one text
block. This module is the Common-Crawl-HTML analogue with the *same*
truncation-marker semantics (markers + endswith + strip order reproduced
from pubmed_parser.py:10-12, 41-53).

Contract (BASELINE.json input_hint): for every url, the Spark output must be
byte-identical to ``extract_text(html)`` called single-node. The pure
function is therefore the authority; the Spark side is a thin Arrow-batched
pandas UDF over it. Extraction is inherently per-row string work — there is
no meaningful JVM-native expression of an HTML parser — so this is one of
the engine's three sanctioned Python kernels, and it is vectorized per Arrow
batch (never per-row Python at the Spark API level).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.column import Column

# Markers reproduced verbatim from reference pubmed_parser.py:10-12.
ABSTRACT_TRUNCATED_AT_250 = "(ABSTRACT TRUNCATED AT 250 WORDS)"
ABSTRACT_TRUNCATED_AT_400 = "(ABSTRACT TRUNCATED AT 400 WORDS)"
ABSTRACT_TRUNCATED = "(ABSTRACT TRUNCATED)"
_TRUNCATION_MARKERS = (
    ABSTRACT_TRUNCATED_AT_250,
    ABSTRACT_TRUNCATED_AT_400,
    ABSTRACT_TRUNCATED,
)

# Elements whose entire subtree is boilerplate (scripts/styles plus nav
# chrome — the Common-Crawl analogue of PubMed's non-abstract elements).
_SKIP_SUBTREE = frozenset(
    {"script", "style", "noscript", "template", "nav", "header", "footer",
     "aside", "head", "title"}
)
# Elements that end a text block (block-level separators).
_BLOCK = frozenset(
    {
        "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
        "tr", "td", "th", "table", "section", "article", "main", "blockquote",
        "pre", "body", "html", "figure", "figcaption",
    }
)

_WS_RE = re.compile(r"\s+")


class _TextExtractor(HTMLParser):
    """Deterministic stdlib-only text extractor (no bs4/lxml in env)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._blocks: list[str] = []
        self._buf: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREE:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREE:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth == 0:
            self._buf.append(data)

    def _flush(self) -> None:
        if self._buf:
            block = _WS_RE.sub(" ", "".join(self._buf)).strip()
            if block:
                self._blocks.append(block)
            self._buf = []

    def result(self) -> str:
        self._flush()
        return "\n".join(self._blocks)


def strip_truncation_marker(text: str) -> str:
    """Strip ONE trailing truncation marker (reference pubmed_parser.py:41-53).

    The reference checks the three markers in a fixed order with elif, so at
    most one is removed per call; we keep that exact semantic (including the
    order) minus the trailing-newline append, which was a corpus-file-format
    concern, not a text semantic.
    """
    for marker in _TRUNCATION_MARKERS:
        if text.endswith(marker):
            return text[: -len(marker)]
    return text


def _rstrip(col: Column) -> Column:
    """Python-str.rstrip()-equivalent trim. F.rtrim strips ONLY the space
    char — XML element text routinely ends with '\\n', which rtrim keeps,
    so the marker endswith() test would silently miss. (?U) makes Java's
    \\s the Unicode White_Space set; \\x1c-\\x1f (FS/GS/RS/US) are Python
    whitespace but NOT Unicode White_Space, so they're added explicitly."""
    return F.regexp_replace(col, r"(?U)[\s\x1c-\x1f]+$", "")


def strip_truncation_markers(col: Column) -> Column:
    """Native-SQL analogue of `strip_truncation_marker`: rstrip, strip AT
    MOST ONE trailing marker (same fixed elif order as the reference),
    rstrip again. Whole-stage-codegen-friendly — no UDF."""
    c = _rstrip(col)
    chain = None
    for m in _TRUNCATION_MARKERS:
        cond = c.endswith(F.lit(m))
        val = c.substr(F.lit(1), F.length(c) - F.lit(len(m)))
        chain = F.when(cond, val) if chain is None else chain.when(cond, val)
    return _rstrip(chain.otherwise(c))


def extract_text(html: bytes | str | None) -> str:
    """Single-node reference extractor. THE byte-identity authority.

    bytes → utf-8 decode (errors=replace) → strip skip-subtrees → block
    text with collapsed intra-block whitespace, blocks joined by '\\n' →
    strip one trailing truncation marker → rstrip.
    """
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # Malformed HTML must never kill a 100 TB job; salvage what parsed.
        pass
    text = parser.result()
    text = strip_truncation_marker(text.rstrip())
    return text.rstrip()


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched wrapper; one Python call per ~2048-row batch."""
    return html.map(extract_text)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text") -> "DataFrame":  # noqa: F821
    """pages → pages with `out_col` = extracted text.

    Column-pruning note: selecting only (url, html) before this keeps the
    parquet scan from reading `text` when we are re-deriving it.
    """
    return df.withColumn(out_col, extract_text_udf(F.col(html_col)))


def truncation_marker_stats(df, text_col: str):
    """Corpus-level truncation counters (reference pubmed_parser.py:55-69
    writes these to a logfile; we return a 1-row DataFrame).

    `text_col` is deliberately REQUIRED: the obvious default ("text") is
    the extractor's OUTPUT column, whose trailing marker extract_text has
    already stripped — stats over it are silently all-zero for any corpus.
    The meaningful input is the raw pre-strip column (e.g. the PubMed
    reader's "raw_abstract", io/pubmed.py:102).

    Pure native aggregation — no UDF. The endswith tests run on the
    _rstripped text: the column is verbatim XML element text that
    routinely ends with '\\n', and strip_truncation_markers rstrips before
    stripping — counting raw would undercount exactly the markers the
    strip path DOES remove. The three suffixes are mutually exclusive by
    construction (different literal tails), so no cross-guards are needed.
    """
    c = _rstrip(F.col(text_col))
    return df.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.when(c.endswith(ABSTRACT_TRUNCATED_AT_250), 1).otherwise(0)).alias(
            "truncated_250"
        ),
        F.sum(F.when(c.endswith(ABSTRACT_TRUNCATED_AT_400), 1).otherwise(0)).alias(
            "truncated_400"
        ),
        F.sum(F.when(c.endswith(ABSTRACT_TRUNCATED), 1).otherwise(0)).alias(
            "truncated_plain"
        ),
    )
