"""Tests: PubMed gz-XML source (SURVEY §2.1 S7-S9) and prediction
import/alignment (S12, M8) — golden-value style after the reference's
tests/test_pubmed_parser.py and postprocess_predictions semantics."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from bioner_spark.io.predictions import align_predictions, read_prediction_tsv
from bioner_spark.io.pubmed import (
    parse_pubmed_file,
    pubmed_truncation_stats,
    read_pubmed,
)

_XML = """<?xml version="1.0"?>
<PubmedArticleSet>
  <PubmedArticle>
    <MedlineCitation><PMID>100</PMID>
      <Article><Abstract>
        <AbstractText>Aspirin treats headache. (ABSTRACT TRUNCATED AT 250 WORDS)</AbstractText>
      </Abstract></Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation><PMID>101</PMID>
      <Article><ArticleTitle>no abstract here</ArticleTitle></Article>
    </MedlineCitation>
  </PubmedArticle>
  <PubmedArticle>
    <MedlineCitation><PMID>102</PMID>
      <Article/>
      <OtherAbstract><AbstractText>Fever rises.</AbstractText></OtherAbstract>
    </MedlineCitation>
  </PubmedArticle>
</PubmedArticleSet>
"""


@pytest.fixture(scope="module")
def pubmed_gz(tmp_path_factory):
    d = tmp_path_factory.mktemp("pubmed")
    p = d / "sample0001.xml.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(_XML.encode("utf-8"))
    return str(p)


def test_parse_pubmed_file_golden(pubmed_gz):
    got = parse_pubmed_file(pubmed_gz)
    # article without abstract is skipped and does not consume an index
    assert got == [
        (0, "100", "Aspirin treats headache. (ABSTRACT TRUNCATED AT 250 WORDS)"),
        (1, "102", "Fever rises."),
    ]


def test_read_pubmed_matches_single_node_and_strips_markers(spark, pubmed_gz):
    df = read_pubmed(spark, pubmed_gz).orderBy("abstract_idx")
    rows = df.collect()
    expected = parse_pubmed_file(pubmed_gz)
    assert [(r.abstract_idx, r.pmid, r.raw_abstract) for r in rows] == expected
    assert rows[0].abstract == "Aspirin treats headache."  # marker stripped
    assert rows[1].abstract == "Fever rises."

    stats = pubmed_truncation_stats(df).collect()[0]
    assert stats.total_docs == 2
    assert stats.truncated_250 == 1


def test_prediction_alignment(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("preds")
    toks = spark.createDataFrame(
        [("d1", 0, 0, "Aspirin"), ("d1", 0, 1, "treats"), ("d1", 1, 0, "fever")],
        "doc_id string, sentence_id int, token_id int, text string",
    )
    pred_file = d / "preds.txt"
    pred_file.write_text("Aspirin B\ntreats O\n\nfever B\n")
    preds = read_prediction_tsv(spark, str(pred_file))
    assert preds.count() == 3  # blank separator dropped

    out = align_predictions(toks, preds).orderBy("sentence_id", "token_id")
    assert [r.tag for r in out.collect()] == ["B", "O", "B"]

    # strict mode raises on token-text mismatch (reference assert,
    # postprocess_predictions.py:32-34)
    bad = d / "bad.txt"
    bad.write_text("Aspirin B\nWRONG O\nfever B\n")
    with pytest.raises(Exception, match="mismatch"):
        align_predictions(toks, read_prediction_tsv(spark, str(bad))).collect()

    # strict mode also fails on LENGTH mismatch — a truncated prediction
    # file must not silently drop the token-table tail via the join
    short = d / "short.txt"
    short.write_text("Aspirin B\ntreats O\n")
    with pytest.raises(Exception, match="mismatch"):
        align_predictions(toks, read_prediction_tsv(spark, str(short))).collect()
    long_f = d / "long.txt"
    long_f.write_text("Aspirin B\ntreats O\nfever B\nextra O\n")
    with pytest.raises(Exception, match="mismatch"):
        align_predictions(toks, read_prediction_tsv(spark, str(long_f))).collect()
    # non-strict keeps the old inner-join truncation semantics
    assert align_predictions(
        toks, read_prediction_tsv(spark, str(short)), strict=False
    ).count() == 2

    # CRLF terminators parse identically to LF
    crlf = d / "crlf.txt"
    crlf.write_bytes(b"Aspirin B\r\ntreats O\r\n\r\nfever B\r\n")
    out2 = align_predictions(toks, read_prediction_tsv(spark, str(crlf))).orderBy(
        "sentence_id", "token_id"
    )
    assert [r.tag for r in out2.collect()] == ["B", "O", "B"]


def test_prediction_order_is_line_order_across_files(spark, tmp_path_factory):
    """The (_file, _line) order key must reproduce exact line order even
    when the input is a multi-file glob (scan-partition order follows file
    SIZE, which a mono-id ranking would have inherited)."""
    d = tmp_path_factory.mktemp("preds_multi")
    # deliberately size-skewed: file 'a' is much larger than 'b'
    n_a = 200
    (d / "a.txt").write_text("".join(f"tok{i} T{i}\n" for i in range(n_a)))
    (d / "b.txt").write_text("tokX TX\ntokY TY\n")
    preds = read_prediction_tsv(spark, str(d))
    rows = preds.orderBy("_file", "_line").collect()
    texts = [r.pred_text for r in rows]
    assert texts == [f"tok{i}" for i in range(n_a)] + ["tokX", "tokY"]
    toks = spark.createDataFrame(
        [("d1", 0, i, t) for i, t in enumerate(texts)],
        "doc_id string, sentence_id int, token_id int, text string",
    )
    out = align_predictions(toks, preds).orderBy("token_id").collect()
    assert [r.tag for r in out] == [f"T{i}" for i in range(n_a)] + ["TX", "TY"]


def test_align_predictions_requires_order_columns(spark):
    """A predictions frame without (_file, _line) must be rejected loudly —
    mono-id positional alignment silently zips tags onto wrong tokens on
    any multi-split scan."""
    toks = spark.createDataFrame(
        [("d1", 0, 0, "x")],
        "doc_id string, sentence_id int, token_id int, text string",
    )
    preds = spark.createDataFrame(
        [("x", "B")], "pred_text string, pred_tag string"
    )
    with pytest.raises(ValueError, match="order column"):
        align_predictions(toks, preds)
    # BOTH columns are required: _file alone leaves within-file ties broken
    # by arbitrary shuffle order — silent misalignment, so also loud
    preds_partial = spark.createDataFrame(
        [("f", "x", "B")], "_file string, pred_text string, pred_tag string"
    )
    with pytest.raises(ValueError, match="_line"):
        align_predictions(toks, preds_partial)


def test_strict_alignment_rejects_null_pred_tag(spark, tmp_path):
    """A prediction line missing its tag column must raise in strict mode
    (the reference IndexErrors on line.split(' ')[1]), not write tag=NULL."""
    from pyspark.errors import PySparkException

    toks = spark.createDataFrame(
        [("d1", 0, 0, "Aspirin")],
        "doc_id string, sentence_id int, token_id int, text string",
    )
    f = tmp_path / "no_tag.txt"
    f.write_text("Aspirin\n")
    with pytest.raises(PySparkException):
        align_predictions(toks, read_prediction_tsv(spark, str(f))).collect()
