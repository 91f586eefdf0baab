"""Tests: error sampling (SURVEY §2.4 B5), CSV error export (§2.1 S15),
human_format (§2.2 P10)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from bioner_spark.metrics import (
    error_analysis_csv_rows,
    human_format,
    sample_error_sentences,
)

SPAN_COLS = ["doc_id", "sentence_id", "start_tok", "end_tok"]


def _spans(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=SPAN_COLS))


def test_sample_error_sentences_seeded(spark):
    gold = _spans(spark, [("d", s, 0, 1) for s in range(50)])
    pred = _spans(spark, [("d", s, 0, 1) for s in range(25)])  # 25 FN sentences
    got = sample_error_sentences(pred, gold, n=10, seed=42)
    rows = {(r.doc_id, r.sentence_id) for r in got.collect()}
    assert len(rows) == 10
    # only erroneous sentences (25..49) can appear
    assert all(25 <= s <= 49 for _, s in rows)
    # seeded → reproducible
    again = {(r.doc_id, r.sentence_id) for r in sample_error_sentences(pred, gold, n=10, seed=42).collect()}
    assert again == rows


def test_error_analysis_csv_rows(spark):
    toks = spark.createDataFrame(
        pd.DataFrame(
            [("d", 0, 0, "Aspirin", "B"), ("d", 0, 1, "helps", "O")],
            columns=["doc_id", "sentence_id", "token_id", "text", "tag"],
        )
    )
    model_a = toks.withColumn("tag", F.lit("O"))
    out = error_analysis_csv_rows(toks, {"modelA": model_a}).collect()
    assert [(r.row_kind, r.line) for r in out] == [
        ("text", "Aspirin,helps"),
        ("gold", "B,O"),
        ("modelA", "O,O"),
    ]


def test_human_format(spark):
    df = spark.createDataFrame(
        [(1234,), (999,), (1_230_000,), (10**15,)], "n long"
    )
    got = [r.h for r in df.select(human_format(F.col("n")).alias("h")).collect()]
    # >=1e15 clamps at 'T' (unclamped: NULL suffix / ANSI INVALID_ARRAY_INDEX)
    assert got == ["1.23K", "999.00", "1.23M", "1,000.00T"]
