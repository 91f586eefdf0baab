"""PubTator render/parse/IOB-projection (SURVEY §2.1 S10).

The reference converts PubTator → CoNLL via bconv
(medmentions_conll_converter.py:27-29); the engine implements the format
natively. These tests pin the format roundtrip and the projection rules on
hand-checkable docs; the contract query `pubtator_iob` hash-verifies the
same chain against a DuckDB oracle on the full synthetic corpus.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bioner_spark.io.pubtator import (
    kept_sentence_offsets,
    project_iob,
    read_pubtator,
    render_pubtator,
)
from bioner_spark.tokenizer import tokenize


@pytest.fixture(scope="module")
def pages(spark):
    # doc 1: title + 2 abstract sentences; global text (1-char seps):
    #   "aspirin treats pain?severe pain is bad?aspirin helps"
    #    0123456789...
    # doc 2: empty sentence in the middle (dropped, consumes no chars)
    # doc 3: title only (no abstract)
    return spark.createDataFrame(
        [
            (1, "aspirin treats pain\nsevere pain is bad\naspirin helps"),
            (2, "alpha beta\n\ngamma delta"),
            (3, "lonely title"),
        ],
        "doc_id long, text string",
    )


def _mentions(spark):
    # (doc_id, g_start, g_end, etype, concept_id)
    # doc 1: "aspirin"(0,7) CHEM; "severe pain"(20,31) DIS (multi-token,
    #        crosses nothing); "aspirin"(39,46) CHEM in 3rd sentence
    # doc 2: "gamma delta"(11,22) DIS — offsets must SKIP the dropped empty
    #        sentence ("alpha beta" is 10 chars + 1 sep)
    return spark.createDataFrame(
        [
            (1, 0, 7, "CHEM", "C1"),
            (1, 20, 31, "DIS", "D1"),
            (1, 39, 46, "CHEM", "C1"),
            (2, 11, 22, "DIS", "D2"),
        ],
        "doc_id long, g_start int, g_end int, etype string, concept_id string",
    )


def test_kept_sentence_offsets_skip_empty(spark, pages):
    rows = {
        (r.doc_id, r.sentence_id): r.g_off
        for r in kept_sentence_offsets(pages).collect()
    }
    assert rows[(1, 0)] == 0
    assert rows[(1, 1)] == 20  # len("aspirin treats pain") + 1
    assert rows[(1, 2)] == 39
    assert rows[(2, 0)] == 0
    # empty sentence_id 1 is absent and consumed no chars
    assert (2, 1) not in rows
    assert rows[(2, 2)] == 11
    assert rows[(3, 0)] == 0


def test_render_parse_roundtrip(spark, pages, tmp_path):
    out = str(tmp_path / "pubtator")
    render_pubtator(pages, _mentions(spark)).coalesce(1).write.text(out)
    docs, anns = read_pubtator(spark, out)

    d = {r.doc_id: r for r in docs.collect()}
    assert d[1].title == "aspirin treats pain"
    assert d[1].abstract == "severe pain is bad aspirin helps"
    assert d[2].abstract == "gamma delta"  # empty sentence dropped
    assert d[3].abstract == ""

    a = sorted(
        (r.doc_id, r.start, r.end, r.mention, r.etype, r.concept_id)
        for r in anns.collect()
    )
    # mention column is the exact surface substring of the rendering
    assert a == [
        (1, 0, 7, "aspirin", "CHEM", "C1"),
        (1, 20, 31, "severe pain", "DIS", "D1"),
        (1, 39, 46, "aspirin", "CHEM", "C1"),
        (2, 11, 22, "gamma delta", "DIS", "D2"),
    ]


def test_project_iob_tags(spark, pages, tmp_path):
    out = str(tmp_path / "pubtator2")
    render_pubtator(pages, _mentions(spark)).coalesce(1).write.text(out)
    docs, anns = read_pubtator(spark, out)
    toks = tokenize(docs, doc_col="doc_id")
    soff = kept_sentence_offsets(docs)
    g = toks.join(soff, ["doc_id", "sentence_id"]).select(
        "doc_id",
        (F.col("start") + F.col("g_off")).cast("int").alias("g_start"),
        (F.col("end") + F.col("g_off")).cast("int").alias("g_end"),
        "text",
    )
    tags = {
        (r.doc_id, r.g_start): (r.token, r.tag)
        for r in project_iob(g, anns).collect()
    }
    assert tags[(1, 0)] == ("aspirin", "B-CHEM")
    assert tags[(1, 8)] == ("treats", "O")
    assert tags[(1, 20)] == ("severe", "B-DIS")
    assert tags[(1, 27)] == ("pain", "I-DIS")
    assert tags[(1, 32)] == ("is", "O")
    assert tags[(1, 39)] == ("aspirin", "B-CHEM")
    assert tags[(2, 11)] == ("gamma", "B-DIS")
    assert tags[(2, 17)] == ("delta", "I-DIS")
    assert tags[(3, 0)] == ("lonely", "O")
    # every token is tagged exactly once
    assert len(tags) == toks.count()


def test_project_iob_overlap_precedence(spark):
    # two annotations claim token at 6: earliest-start-then-longest wins →
    # the [0,11) DIS span; token "beta" (6) is I-DIS, not B-CHEM
    toks = spark.createDataFrame(
        [(9, 0, 5, "alpha"), (9, 6, 10, "beta"), (9, 11, 16, "gamma")],
        "doc_id long, g_start int, g_end int, text string",
    )
    anns = spark.createDataFrame(
        [(9, 0, 11, "full", "DIS", "D"), (9, 6, 16, "tail", "CHEM", "C")],
        "doc_id long, start int, end int, mention string, etype string,"
        " concept_id string",
    )
    tags = {r.g_start: r.tag for r in project_iob(toks, anns).collect()}
    assert tags[0] == "B-DIS"
    assert tags[6] == "I-DIS"
    # gamma is the FIRST token the CHEM span actually claims ("beta" lost
    # to the earlier-starting DIS span) → B-CHEM: the projection never
    # emits an orphan I- without its B-
    assert tags[11] == "B-CHEM"


def test_project_iob_midtoken_and_gap_starts(spark):
    """Annotations that start mid-token or between tokens still project to
    a valid B/I run (the overlap join + first-claimed-token rule)."""
    toks = spark.createDataFrame(
        [
            (1, 0, 5, "alpha"), (1, 5, 10, "beta5"), (1, 11, 20, "(aspirin)"),
            (2, 0, 4, "left"), (2, 6, 10, "core"), (2, 10, 14, "tail"),
        ],
        "doc_id long, g_start int, g_end int, text string",
    )
    anns = spark.createDataFrame(
        [
            # starts mid-token "alpha", ends mid-token "beta5"
            (1, 3, 9, "phab", "DIS", "D"),
            # entirely inside the punctuation-glued token "(aspirin)"
            (1, 12, 19, "aspirin", "CHEM", "C"),
            # starts at char 5 — BETWEEN doc-2 tokens (inter-token gap)
            (2, 5, 12, "coreta", "DIS", "D"),
        ],
        "doc_id long, start int, end int, mention string, etype string,"
        " concept_id string",
    )
    tags = {(r.doc_id, r.g_start): r.tag for r in project_iob(toks, anns).collect()}
    assert tags[(1, 0)] == "B-DIS"     # overlaps [3,9) and is its first token
    assert tags[(1, 5)] == "I-DIS"
    assert tags[(1, 11)] == "B-CHEM"   # span starts inside the token
    assert tags[(2, 0)] == "O"         # ends at 4, span starts at 5: no overlap
    assert tags[(2, 6)] == "B-DIS"     # first token after the gap start
    assert tags[(2, 10)] == "I-DIS"
    # never an I- whose immediately preceding same-type tag is missing
    assert all(t in {"O", "B-DIS", "I-DIS", "B-CHEM"} for t in tags.values())


def test_read_pubtator_ansi_safe_and_malformed_resilient(spark, tmp_path):
    """Under Spark 4's default ANSI mode a bare cast on tab-split fields
    aborted the whole scan for (a) an annotation row with non-integer
    offsets and (b) a title/abstract body containing 5+ literal tabs
    (shape-matches an annotation line). Both must be DROPPED from anns, as
    the docstring promises. Also: an abstract-only document (missing title
    line) surfaces with title='' instead of silently orphaning its
    annotations, and duplicate title lines collapse deterministically to
    the minimum instead of cross-producting."""
    content = "\n".join([
        "1|t|title one",
        "1|a|body\twith\tfive\ttabs\tin\tit",
        "1\t0\t5\ttitle\tDisease\tD1",
        "1\tx\ty\tbad\tDisease\tD2",
        "",
        "2|a|orphan abstract",
        "2\t0\t6\torphan\tChemical\tC1",
        "",
        "3|t|dup title B",
        "3|t|dup title A",
        "3|a|abs",
    ])
    p = tmp_path / "corpus.pubtator"
    p.write_text(content)
    docs, anns = read_pubtator(spark, str(p))
    d = {r.doc_id: r for r in docs.collect()}
    assert set(d) == {1, 2, 3}
    assert d[1].title == "title one"
    assert d[1].abstract == "body\twith\tfive\ttabs\tin\tit"
    assert d[2].title == "" and d[2].abstract == "orphan abstract"
    assert d[2].text == "\norphan abstract"
    assert d[3].title == "dup title A" and d[3].abstract == "abs"
    a = sorted((r.doc_id, r.start, r.end, r.mention) for r in anns.collect())
    assert a == [(1, 0, 5, "title"), (2, 0, 6, "orphan")]


def test_render_pubtator_skips_blank_document(spark):
    """A document with no non-empty sentence has no title line to render:
    it must be skipped, not abort the export (ANSI element_at on [])."""
    pages = spark.createDataFrame(
        [(1, "\n\n"), (2, "ok title\nabs")], "doc_id long, text string"
    )
    mentions = spark.createDataFrame(
        [], "doc_id long, g_start int, g_end int, etype string, concept_id string"
    )
    lines = sorted(r.line for r in render_pubtator(pages, mentions).collect())
    assert lines == ["2|a|abs", "2|t|ok title"]
